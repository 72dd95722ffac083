"""Microbench: consecutive-duplicate segment FOLDING of the plane-table
scatter-add (README roadmap #1; the largest single cost in the 300^3
masked train-step backward — ~12 ms/plane at ray-distributed indices,
44 GB/s vs the 205 GB/s gather rate, BASELINE.md round 4/5).

Ray marching projects consecutive samples onto the same bilerp cell
roughly half the time at step_ratio 0.5, so adjacent update rows often
share a scatter index. Folding a run into one row cuts scatter rows —
IF a dropped row (out-of-bounds index; XLA scatter drops it) is cheaper
than a landed one. This bench answers that in stages:

  xla        - zeros.at[idx].add(v), exactly as autodiff emits it
  all_drop   - same scatter, every index out of bounds (cost floor of a
               fully-dropped row: is drop even cheaper than land?)
  half_drop  - random half dropped (the shape folding would produce)
  fold4      - EXACT block-4 segmented fold: within each static block of
               4 consecutive rows, an inclusive segmented sum moves each
               run's total onto its last row; earlier run rows get index
               M (dropped). Never folds across blocks, so it needs no
               dynamic compaction; output matches xla up to f32
               summation order.

Index distributions: ``ray`` at two in-plane step sizes (0.35/0.7
texels: ~production step_ratio 0.5 and the coarse case) and ``uniform``
(no duplicates — fold4's pure-overhead case).

Usage: python extra/microbench_plane_fold.py [--k 464128] [--reps 8]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, reps: int = 8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf.ravel()[:1])  # force-complete (axon relay)
    return (t1 - t0) / reps * 1e3


def _ray_indices(rng, k: int, h: int, w: int, step: float) -> np.ndarray:
    """Consecutive texel indices along random 2-D lines — the plane
    projection of ray-march samples at a given in-plane step (texels)."""
    seg = 256
    n_rays = -(-k // seg)
    p0 = rng.uniform(0, [h - 1, w - 1], (n_rays, 2))
    ang = rng.uniform(0, 2 * np.pi, n_rays)
    d = np.stack([np.sin(ang), np.cos(ang)], -1)
    t = np.arange(seg) * step
    pts = p0[:, None, :] + d[:, None, :] * t[None, :, None]
    y = np.clip(pts[..., 0], 0, h - 1).astype(np.int32)
    x = np.clip(pts[..., 1], 0, w - 1).astype(np.int32)
    return (y * w + x).reshape(-1)[:k]


def fold4(idx: jnp.ndarray, v: jnp.ndarray, m: int) -> jnp.ndarray:
    """Exact block-4 segmented fold + scatter-add into an [m, C] table.

    Within each static block of 4 consecutive update rows, an inclusive
    segmented sum accumulates runs of equal indices; each run's LAST row
    in the block carries the run total and scatters, earlier rows are
    retargeted to index m (out of bounds -> dropped). Bit-different from
    the plain scatter only by f32 summation order within a run."""
    k, c = v.shape
    ib = idx.reshape(k // 4, 4)
    vb = v.reshape(k // 4, 4, c)
    same = ib[:, 1:] == ib[:, :-1]                     # [k/4, 3]
    # inclusive segmented sum along the block axis (3 static steps)
    s1 = vb[:, 1] + jnp.where(same[:, 0, None], vb[:, 0], 0)
    s2 = vb[:, 2] + jnp.where(same[:, 1, None], s1, 0)
    s3 = vb[:, 3] + jnp.where(same[:, 2, None], s2, 0)
    s = jnp.stack([vb[:, 0], s1, s2, s3], axis=1)       # [k/4, 4, c]
    last = jnp.concatenate(
        [~same, jnp.ones((k // 4, 1), bool)], axis=1
    )                                                   # [k/4, 4]
    idx_mod = jnp.where(last, ib, m).reshape(k)
    return jnp.zeros((m, c), jnp.float32).at[idx_mod].add(s.reshape(k, c))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=464128)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--grid", type=int, default=300)
    ap.add_argument("--channels", type=int, default=64)  # cd + ca
    args = ap.parse_args()

    h = w = args.grid
    m = h * w
    c4 = 4 * args.channels
    k = args.k - args.k % 4
    rng = np.random.default_rng(0)
    v = jax.random.normal(jax.random.PRNGKey(0), (k, c4), jnp.float32)

    print(f"k={k} plane rows M={m} width {c4} "
          f"(update data {k * c4 * 4 / 1e6:.0f} MB)")

    @jax.jit
    def xla_scatter(idx, v):
        return jnp.zeros((m, c4), jnp.float32).at[idx].add(v)

    fold = jax.jit(lambda idx, v: fold4(idx, v, m))

    # calibration: is a dropped row cheaper than a landed one at all?
    idx_u = jnp.asarray(rng.integers(0, m, k, dtype=np.int32))
    idx_drop = jnp.full((k,), m, jnp.int32)
    sel = rng.random(k) < 0.5
    idx_half = jnp.asarray(np.where(sel, m, np.asarray(idx_u)).astype(np.int32))
    ms = _time(xla_scatter, idx_u, v, reps=args.reps)
    ms_d = _time(xla_scatter, idx_drop, v, reps=args.reps)
    ms_h = _time(xla_scatter, idx_half, v, reps=args.reps)
    print(f"calibration: land-all {ms:7.2f}  drop-all {ms_d:7.2f}  "
          f"drop-half {ms_h:7.2f} ms")

    for name, idx in (
        ("ray s=0.35", jnp.asarray(_ray_indices(rng, k, h, w, 0.35))),
        ("ray s=0.70", jnp.asarray(_ray_indices(rng, k, h, w, 0.70))),
        ("uniform   ", idx_u),
    ):
        ia = np.asarray(idx)
        dup = float(np.mean(ia[1:] == ia[:-1]))
        ms_x = _time(xla_scatter, idx, v, reps=args.reps)
        ms_f = _time(fold, idx, v, reps=args.reps)
        # parity (f32 run-order tolerance)
        ref = np.asarray(xla_scatter(idx, v))
        got = np.asarray(fold(idx, v))
        err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
        assert err < 1e-5, (name, err)
        print(f"  [{name}] dup-rate {dup:.2f}  xla {ms_x:7.2f}  "
              f"fold4 {ms_f:7.2f} ms  (rel err {err:.1e})")


if __name__ == "__main__":
    main()
