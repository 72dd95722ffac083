"""Fused ray-MLP + QK-attention Pallas kernel for the pose scoring path.

The XLA path (`pose/id_module.py::score_rays`) materializes every MLP
intermediate ([540k, 256] bf16 = 276 MB each for 5 layers) plus the
[540k, 256] f32 logits and its exp/softmax passes in HBM — measured
6.7 GB of traffic for a 600-GFLOP program, 18.5% MFU (BASELINE.md round-3
MFU table). This kernel runs the whole ray-side chain per row-tile in
VMEM — ray MLP (141->256->256, skip concat, 397->256->384), k-projection
(384->384), logits against the pre-scaled image queries, and an online
(flash-attention-style) running max / rescaled denominator over the ray
axis — writing only the [R, P] f32 logits once. A second cheap XLA pass
turns (logits, m, d) into per-ray scores:

    scores[r] = sum_p valid_p * exp(logits[r, p] - m[p]) / d[p]

which is one fused 553 MB read. Numerics match the XLA path to f32
reduction-order tolerance (the matmuls run in the same bf16-in /
f32-accumulate MXU configuration).

Reference counterpart: pose_estimation/ray_preprocessor.py:29-39 +
identification_module.py:162-168 (torch Linear chain + QK softmax).

MEASURED VERDICT (v5e-1, 2026-08-17, BASELINE.md round-3 table): 14.42 ms
vs the XLA chain's 12.67 ms per estimate — XLA's own fusion + bf16 HBM
traffic beat this hand-tiled pass, so the kernel stays OPT-IN OFF
(IDConfig.fused_scoring / IFFNERF_FUSED_POSE=1) and is kept, with its
parity tests, as the recorded negative result. The production answer to
the same bottleneck is the per-object ray bank (id_module.ray_bank,
4.14 ms/image), which removes the fused chain from the per-image path
entirely.
"""

from __future__ import annotations

import functools
import math

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


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
            w4_ref, b4_ref, wk_ref, bk_ref, qs_ref,
            logits_ref, m_ref, d_ref, m_run, d_run):
    i = pl.program_id(0)
    dt = x_ref.dtype

    @pl.when(i == 0)
    def _():
        m_run[:] = jnp.full_like(m_run, _NEG_INF)
        d_run[:] = jnp.zeros_like(d_run)

    x = x_ref[:]                                         # [T, 141] bf16
    h = jnp.maximum(_dot(x, w1_ref[:]) + b1_ref[:], 0.0).astype(dt)
    h = jnp.maximum(_dot(h, w2_ref[:]) + b2_ref[:], 0.0).astype(dt)
    h = jnp.concatenate([h, x], axis=-1)                 # [T, 397]
    h = jnp.maximum(_dot(h, w3_ref[:]) + b3_ref[:], 0.0).astype(dt)
    h = (_dot(h, w4_ref[:]) + b4_ref[:]).astype(dt)      # ray features
    k = (_dot(h, wk_ref[:]) + bk_ref[:]).astype(dt)      # [T, D]
    logits = _dot(k, qs_ref[:])                          # [T, P] f32
    logits_ref[:] = logits

    # online softmax statistics over the ray axis (rows), per patch col
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


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_ray_scores(params, q, patch_valid, x, *, tile: int = 2160,
                     interpret: bool = False):
    """Scores for all candidate rays in one fused pass.

    params: the id-module param dict (ray_mlp / ray_mlp2 / k_proj).
    q: [P, D] image queries (already in the compute dtype).
    patch_valid: [P] bool.
    x: [R, 141] concatenated+PE ray inputs in the compute dtype.
    Returns scores [R] f32. R must be divisible by ``tile``.
    """
    r, in_dim = x.shape
    p, d = q.shape
    assert r % tile == 0, (r, tile)
    dt = x.dtype

    def cast(t):
        return t.astype(dt)

    w1, b1 = cast(params["ray_mlp"][0]["w"]), cast(params["ray_mlp"][0]["b"])
    w2, b2 = cast(params["ray_mlp"][1]["w"]), cast(params["ray_mlp"][1]["b"])
    w3, b3 = cast(params["ray_mlp2"][0]["w"]), cast(params["ray_mlp2"][0]["b"])
    w4, b4 = cast(params["ray_mlp2"][1]["w"]), cast(params["ray_mlp2"][1]["b"])
    wk, bk = cast(params["k_proj"]["w"]), cast(params["k_proj"]["b"])
    # fold the 1/sqrt(D) logit scale into the (tiny) query matrix, and
    # pre-transpose it so the kernel's last matmul is [T,D] @ [D,P]
    qs = (q / math.sqrt(d)).T.astype(dt)                 # [D, P]

    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    row_block = pl.BlockSpec((tile, in_dim), lambda i: (i, 0))

    logits, m, dsum = pl.pallas_call(
        _kernel,
        grid=(r // tile,),
        in_specs=[
            row_block,
            full(w1.shape), full((1, b1.shape[0])),
            full(w2.shape), full((1, b2.shape[0])),
            full(w3.shape), full((1, b3.shape[0])),
            full(w4.shape), full((1, b4.shape[0])),
            full(wk.shape), full((1, bk.shape[0])),
            full(qs.shape),
        ],
        out_specs=[
            pl.BlockSpec((tile, p), lambda i: (i, 0)),
            full((1, p)),
            full((1, p)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, p), jnp.float32),
            jax.ShapeDtypeStruct((1, p), jnp.float32),
            jax.ShapeDtypeStruct((1, p), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((p,), jnp.float32),
            pltpu.VMEM((p,), jnp.float32),
        ],
        interpret=interpret,
    )(x, w1, b1[None], w2, b2[None], w3, b3[None], w4, b4[None],
      wk, bk[None], qs)

    # second pass (XLA, one fused read of logits): per-ray validity-
    # weighted softmax column sum
    coeff = jnp.where(patch_valid, 1.0, 0.0) / dsum[0]   # [P] f32
    return jnp.exp(logits - m[0][None, :]) @ coeff       # [R] f32