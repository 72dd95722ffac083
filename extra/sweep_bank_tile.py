"""Tile-size sweep for the fused banked-scoring kernel
(ops/banked_attention.py). The round-4 default tile (<=5400 rows) was
picked by VMEM feel, not measurement; the kernel sits at 1.88 ms vs a
~1.1 ms two-pass floor (2 bank reads + 2 MXU passes), so the residual is
grid/pipeline overhead — exactly what the tile size controls.

Times banked_scores_fused at every multiple-of-8 divisor tile of R in a
plausible VMEM range, against the XLA banked path, with the
reps-in-graph method (decompose_pose.py). Verifies scores against XLA to
f32 reduction-order tolerance at each tile.

Usage: python extra/sweep_bank_tile.py [--reps 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iffnerf_tpu.runtime import setup as _runtime_setup

_runtime_setup()

import jax
import jax.numpy as jnp

from iffnerf_tpu.ops.banked_attention import banked_scores_fused


def _pull(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def bench(label, make_body, reps, base, consts, timed=3):
    @jax.jit
    def looped(*consts):
        def body(i, carry):
            return carry + make_body(i, *consts)

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    _pull(looped(*consts))
    ts = []
    for _ in range(timed):
        t0 = time.perf_counter()
        _pull(looped(*consts))
        ts.append(time.perf_counter() - t0)
    dt = (float(np.median(ts)) - base) / reps * 1e3
    print(f"{label:46s} {dt:8.3f} ms  (reps={reps})", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=64)
    ap.add_argument("--rays", type=int, default=540000)
    ap.add_argument("--patches", type=int, default=256)
    ap.add_argument("--dim", type=int, default=384)
    args = ap.parse_args()

    r, p, d = args.rays, args.patches, args.dim
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    bank = (jax.random.normal(k1, (r, d)) * 0.3).astype(jnp.bfloat16)
    q = (jax.random.normal(k2, (p, d)) * 0.3).astype(jnp.bfloat16)
    pv = jnp.ones((p,), bool)

    # rtt baseline
    x = jnp.ones((8,))
    _pull(x)
    t0 = time.perf_counter()
    for _ in range(10):
        _pull(x + 1.0)
    base = (time.perf_counter() - t0) / 10
    print(f"scalar pull rtt {base * 1e3:.1f} ms")

    import math

    def xla_scores(bank_, q_):
        logits = (q_ @ bank_.T).astype(jnp.float32) / math.sqrt(d)  # [P, R]
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        sm = e / jnp.sum(e, axis=1, keepdims=True)
        return jnp.sum(jnp.where(pv[:, None], sm, 0.0), axis=0)

    def nudge(x, i):
        return x + (jnp.float32(i) * 1e-12).astype(x.dtype)

    ms_x = bench("XLA banked scoring", lambda i, b, qq: jnp.sum(
        xla_scores(b, nudge(qq, i))), args.reps, base, (bank, q))

    ref = np.asarray(xla_scores(bank, q))

    # multiple-of-8 divisor tiles of R in a sane VMEM range
    tiles = [t for t in range(8, min(r, 60000) + 1, 8)
             if r % t == 0 and t >= 1000]
    # thin the list: keep ~log-spaced
    kept, last = [], 0
    for t in tiles:
        if t >= last * 1.6 or t == tiles[-1]:
            kept.append(t)
            last = t
    print(f"tiles: {kept}")
    best = (None, 1e9)
    for t in kept:
        vmem_mb = t * d * 2 / 1e6
        try:
            got = np.asarray(banked_scores_fused(bank, q, pv, tile=t))
        except Exception as e:  # Mosaic VMEM limits etc.
            print(f"tile {t:6d} ({vmem_mb:5.1f} MB/block): FAILED {type(e).__name__}")
            continue
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-12)
        ms = bench(
            f"fused tile={t} ({vmem_mb:.1f} MB/block)",
            lambda i, b, qq, t=t: jnp.sum(
                banked_scores_fused(b, nudge(qq, i), pv, tile=t)),
            args.reps, base, (bank, q))
        print(f"    rel err vs XLA: {err:.2e}")
        if ms < best[1]:
            best = (t, ms)
    print(f"BEST tile {best[0]}: {best[1]:.3f} ms  (XLA {ms_x:.3f} ms)")


if __name__ == "__main__":
    main()
