"""Microbench the feature-eval BACKWARD's scatter-adds (the D-C stage of
the train-step decomposition, BASELINE.md round 4: 57 ms at k=530k,
263 ms at k=2.12M — ~10x above the HBM-traffic floor).

The backward of ``packed_bilerp``/``packed_lerp`` is XLA's derived
scatter-add of k update rows into the packed tables
(plane: [300*300, 4*(16+48)] rows; line: [300, 2*(16+48)]). This bench
compares that derived scatter against reformulations on realistic index
distributions:

  plane tables (M=90k rows):
    xla      - zeros.at[idx].add(v) exactly as autodiff emits it
    sorted   - argsort(idx), gather v in sorted order, hinted
               .add(indices_are_sorted=True)
    e2e      - jax.grad through packed_bilerp itself (what training runs)
  line tables (M=300 rows, EVERY row hit ~1.8k times):
    xla / sorted as above
    matmul   - one-hot [k, M] contraction on the MXU (classic TPU
               scatter-as-matmul; M is small enough to materialize)

Index distributions: ``uniform`` (worst case) and ``ray`` (segments of
consecutive texels along 2-D lines — what ray marching actually
produces; sortedness hints should shine here).

Usage: python extra/microbench_scatter_vjp.py [--k 530432] [--reps 8]
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
    # force-complete with a data pull (axon relay: block_until_ready can
    # return early for some programs; same method as every BASELINE bench)
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf.ravel()[:1])
    return (t1 - t0) / reps * 1e3


def _ray_indices(rng, k: int, h: int, w: int) -> np.ndarray:
    """Segments of consecutive texels along random 2-D lines (the plane
    projection of ray-march samples)."""
    seg = 256
    n_rays = -(-k // seg)
    p0 = rng.uniform(0, [h - 1, w - 1], (n_rays, 2))
    ang = rng.uniform(0, 2 * np.pi, n_rays)
    d = np.stack([np.sin(ang), np.cos(ang)], -1)
    t = np.arange(seg) * 0.7
    pts = p0[:, None, :] + d[:, None, :] * t[None, :, None]
    y = np.clip(pts[..., 0], 0, h - 1).astype(np.int32)
    x = np.clip(pts[..., 1], 0, w - 1).astype(np.int32)
    return (y * w + x).reshape(-1)[:k]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=530432)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--grid", type=int, default=300)
    ap.add_argument("--channels", type=int, default=64)  # cd + ca
    args = ap.parse_args()

    h = w = args.grid
    c4 = 4 * args.channels
    k = args.k
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (k, c4), jnp.float32)

    print(f"k={k} plane rows M={h * w} width {c4} "
          f"(update data {k * c4 * 4 / 1e6:.0f} MB)")

    @jax.jit
    def xla_scatter(idx, v):
        return jnp.zeros((h * w, c4), jnp.float32).at[idx].add(v)

    @jax.jit
    def sorted_scatter(idx, v):
        order = jnp.argsort(idx)
        return jnp.zeros((h * w, c4), jnp.float32).at[idx[order]].add(
            v[order], indices_are_sorted=True
        )

    # what training actually runs: autodiff through packed_bilerp
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from iffnerf_tpu.ops.packed_sample import packed_bilerp

    @jax.jit
    def e2e_bwd(packed, coords, g):
        def f(p):
            return jnp.vdot(packed_bilerp(p, h, w, args.channels, coords), g)
        return jax.grad(f)(packed)

    for dist in ("uniform", "ray"):
        if dist == "uniform":
            idx = jnp.asarray(rng.integers(0, h * w, k, dtype=np.int32))
        else:
            idx = jnp.asarray(_ray_indices(rng, k, h, w))
        ms_x = _time(xla_scatter, idx, v, reps=args.reps)
        ms_s = _time(sorted_scatter, idx, v, reps=args.reps)
        print(f"  [{dist:7s}] xla .at[].add: {ms_x:8.2f} ms   "
              f"sorted+hint: {ms_s:8.2f} ms")

    coords = jax.random.uniform(key, (k, 2), minval=-1, maxval=1)
    packed = jax.random.normal(key, (h * w, c4), jnp.float32)
    g = jax.random.normal(key, (k, args.channels), jnp.float32)
    ms_e = _time(e2e_bwd, packed, coords, g, reps=args.reps)
    print(f"  e2e grad(packed_bilerp) [uniform coords]: {ms_e:8.2f} ms")

    # ---- line tables: tiny M, massive duplication ----
    l = args.grid
    c2 = 2 * args.channels
    vl = jax.random.normal(key, (k, c2), jnp.float32)
    idx_l = jnp.asarray(rng.integers(0, l, k, dtype=np.int32))
    idx_l_sortedish = jnp.sort(idx_l)  # marching produces near-sorted z

    @jax.jit
    def xla_line(idx, v):
        return jnp.zeros((l, c2), jnp.float32).at[idx].add(v)

    @jax.jit
    def sorted_line(idx, v):
        order = jnp.argsort(idx)
        return jnp.zeros((l, c2), jnp.float32).at[idx[order]].add(
            v[order], indices_are_sorted=True
        )

    @jax.jit
    def matmul_line(idx, v):
        onehot = (idx[:, None] == jnp.arange(l)[None, :]).astype(jnp.float32)
        return jnp.einsum("km,kc->mc", onehot, v)

    print(f"line rows M={l} width {c2}")
    for name, idxv in (("uniform", idx_l), ("pre-sorted", idx_l_sortedish)):
        ms_x = _time(xla_line, idxv, vl, reps=args.reps)
        ms_s = _time(sorted_line, idxv, vl, reps=args.reps)
        ms_m = _time(matmul_line, idxv, vl, reps=args.reps)
        print(f"  [{name:10s}] xla: {ms_x:8.2f}  sorted+hint: {ms_s:8.2f}  "
              f"one-hot matmul: {ms_m:8.2f} ms")

    # parity: all variants produce the same table (f32 order tolerance)
    # tolerance: each line row accumulates ~k/l random terms in a different
    # order per variant; f32 error grows with the partial-sum magnitude
    ref = np.asarray(xla_line(idx_l, vl))
    tol = 1e-6 * (k / l) ** 0.5 * 64
    for f in (sorted_line, matmul_line):
        got = np.asarray(f(idx_l, vl))
        err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
        assert err < tol, (f.__name__, err, tol)
    print(f"parity OK (line variants, rel err < {tol:.1e})")


if __name__ == "__main__":
    main()
