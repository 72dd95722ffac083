"""Fused banked-attention scoring: softmax column-sum over a precomputed
ray bank without materializing the [P, R] logits matrix in HBM.

The XLA banked path (`pose/id_module.py::score_rays` with ``bank=``)
computes ``logits = q @ K.T`` as a [P, R] f32 array (540k rays x 256
patches = 553 MB), then runs max / exp / sum / weighted-sum passes over
it — ~1.7 GB of HBM round-trips for a 106-GFLOP matmul, which is the
dominant share of the 4.1 ms banked estimate (extra/decompose_pose.py
stages g vs h). This kernel trades that traffic for one extra matmul
pass over the bank (flash-attention's recompute strategy, adapted to the
"score = validity-weighted softmax column sum" epilogue of
identification_module.py:162-168):

  pass 1 (stats):  per ray-tile, logits_t = K_t @ q_s      [T, P] in VMEM
                   online running max m[p] and rescaled denominator d[p]
  pass 2 (scores): recompute logits_t, emit
                   scores[r] = sum_p exp(logits_t[r,p] - m[p]) * w[p],
                   w[p] = valid[p] / d[p]

HBM traffic: 2 bank reads (2 x 414 MB bf16) + [R] out; the [T, P] logits
tile lives and dies in VMEM. FLOPs: 2 x R*D*P (the recompute). Both
passes are MXU matmuls with a fused elementwise/reduce epilogue.

Numerics: the same bf16-in / f32-accumulate MXU configuration as the XLA
path; scores agree to f32 reduction-order tolerance (a softmax is
shift-invariant, so the tile-local running max changes rounding only).
Parity: tests/test_banked_pose.py::test_fused_bank_kernel_parity.

Reference counterpart: identification_module.py:162-168 (torch QK softmax
score); the bank itself is iffnerf_tpu's own amortization (ray_bank).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _dot(a, b):
    # bf16 x bf16 -> f32 accumulate on the MXU
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _stats_kernel(k_ref, qs_ref, scale_ref, m_ref, d_ref, m_run, d_run):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        m_run[:] = jnp.full_like(m_run, _NEG_INF)
        d_run[:] = jnp.zeros_like(d_run)

    # scale the f32 logits (NOT the bf16 queries): the XLA banked path
    # divides after the matmul, and folding 1/sqrt(D) into bf16 q would
    # re-round it (~1e-4 relative score drift, caught by the parity test)
    logits = _dot(k_ref[:], qs_ref[:]) * scale_ref[0, 0]  # [T, P] f32
    t_max = jnp.max(logits, axis=0)                      # [P]
    m_new = jnp.maximum(m_run[:], t_max)
    scale = jnp.exp(m_run[:] - m_new)
    t_sum = jnp.sum(jnp.exp(logits - m_new[None, :]), axis=0)
    d_run[:] = d_run[:] * scale + t_sum
    m_run[:] = m_new

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        m_ref[:] = m_run[:].reshape(m_ref.shape)
        d_ref[:] = d_run[:].reshape(d_ref.shape)


def _score_kernel(k_ref, qs_ref, scale_ref, m_ref, w_ref, out_ref):
    logits = _dot(k_ref[:], qs_ref[:]) * scale_ref[0, 0]  # [T, P] f32
    e = jnp.exp(logits - m_ref[:])                       # [T, P]
    # scores [T] emitted as an (8, T/8) block: Mosaic requires the
    # second-minor block dim to be a multiple of 8 (a (1, T) row is not)
    out_ref[:] = (e @ w_ref[:].T).reshape(out_ref.shape)


def bank_tile_for(r: int, target: int = 5400) -> int | None:
    """Largest divisor of ``r`` that is <= target and a multiple of 8
    (f32 sublane); None when nothing reasonable divides ``r``."""
    best = None
    for t in range(8, min(r, target) + 1, 8):
        if r % t == 0:
            best = t
    return best


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def banked_scores_fused(bank, q, patch_valid, *, tile: int = 5400,
                        interpret: bool = False):
    """Scores [R] f32 for a precomputed bank [R, D] against image queries
    q [P, D] (compute dtype) with patch validity [P] bool.

    R must be divisible by ``tile`` (use bank_tile_for). The 1/sqrt(D)
    logit scale is applied to the f32 logits in-kernel, matching
    score_rays' divide-after-matmul ordering.
    """
    r, d = bank.shape
    p = q.shape[0]
    assert r % tile == 0, (r, tile)
    import math

    qs = q.T.astype(bank.dtype)                          # [D, P]
    scale = jnp.full((1, 1), 1.0 / math.sqrt(d), jnp.float32)

    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    row_block = pl.BlockSpec((tile, d), lambda i: (i, 0))

    m, dsum = pl.pallas_call(
        _stats_kernel,
        grid=(r // tile,),
        in_specs=[row_block, full(qs.shape), full((1, 1))],
        out_specs=[full((1, p)), full((1, p))],
        out_shape=[
            jax.ShapeDtypeStruct((1, p), jnp.float32),
            jax.ShapeDtypeStruct((1, p), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((p,), jnp.float32),
            pltpu.VMEM((p,), jnp.float32),
        ],
        interpret=interpret,
    )(bank, qs, scale)

    coeff = jnp.where(patch_valid, 1.0, 0.0) / dsum      # [1, P] f32
    scores = pl.pallas_call(
        _score_kernel,
        grid=(r // tile,),
        in_specs=[row_block, full(qs.shape), full((1, 1)), full((1, p)),
                  full((1, p))],
        out_specs=pl.BlockSpec((8, tile // 8), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((8 * (r // tile), tile // 8),
                                       jnp.float32),
        interpret=interpret,
    )(bank, qs, scale, m, coeff)
    return scores.reshape(r)
