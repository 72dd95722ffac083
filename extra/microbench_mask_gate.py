"""Microbench: per-sample trilerp rows vs grouped occupancy-gate bit rows.

The alpha-mask stage of the masked march gathers one row per SAMPLE
(8-lane uint8 footprint, packed_trilerp) and sits at the hardware gather
floor (~87-113 ms per 16384x1039 eval chunk at 300^3, BASELINE.md). The
grouped gate (ops/packed_sample.py::occupancy_grouped) gathers one
neighborhood-BIT row per GROUP of consecutive samples — rows / group.

Timing is the relay-safe in-graph pattern (extra/pallas_gather_bench.py):
REPS evaluations inside one jitted fori_loop, the coordinate array nudged
by carry * 0.0 each iteration (defeats CSE/hoisting without changing
values; XLA cannot fold x*0 under NaN/inf semantics), one scalar pulled at
the end. Run ALONE on the TPU.

Usage: python extra/microbench_mask_gate.py [--grid 300] [--rays 16384]
"""

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

from iffnerf_tpu.models.field import (
    FieldConfig,
    gate_group_for,
    make_alpha_mask,
    sample_alpha,
    sample_alpha_gate,
)


def _pull(x):
    return float(jnp.sum(x))


def rtt():
    x = jnp.ones((8,))
    _pull(x)
    t0 = time.perf_counter()
    for _ in range(10):
        _pull(x + 1.0)
    return (time.perf_counter() - t0) / 10


def bench(fn, xyz, reps: int, base: float, label: str, n_samples: int):
    @jax.jit
    def looped(xyz):
        def body(i, carry):
            nudged = xyz + carry * 0.0
            occ = fn(nudged)
            return carry + jnp.sum(occ.astype(jnp.float32))

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    _pull(looped(xyz))  # compile + warm
    t0 = time.perf_counter()
    s = _pull(looped(xyz))
    dt = (time.perf_counter() - t0 - base) / reps
    per = dt / n_samples * 1e9
    print(f"{label:42s} {dt * 1e3:8.2f} ms/eval  {per:6.2f} ns/sample  "
          f"(occ sum {s / reps:.0f})")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=300)
    ap.add_argument("--rays", type=int, default=16384)
    ap.add_argument("--occupancy", type=float, default=0.1)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--window", type=int, default=4)
    args = ap.parse_args()

    g = args.grid
    rng = np.random.default_rng(0)
    vol = (rng.random((g, g, g)) < args.occupancy).astype(np.float32)
    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
    mask = make_alpha_mask(jnp.asarray(vol), aabb, bits_window=args.window)

    cfg = FieldConfig(grid_size=(g, g, g), step_ratio=0.5)
    n_samples = cfg.n_samples
    step = cfg.step_size
    print(f"grid {g}^3  rays {args.rays}  samples/ray {n_samples}  "
          f"step {step:.5f}")

    # blender-like rays: origins outside, |dir component| <= 1
    origins = rng.uniform(-4.0, -3.0, (args.rays, 3)).astype(np.float32)
    dirs = rng.uniform(0.3, 1.0, (args.rays, 3)).astype(np.float32)
    t = (np.arange(n_samples, dtype=np.float32) * step)[None, :, None]
    xyz = jnp.asarray(origins[:, None, :] + dirs[:, None, :] * t)
    total = args.rays * n_samples

    gmax = gate_group_for(mask.volume.shape, aabb, step, args.window,
                          dir_bound=1.0)
    print(f"gate_group_for -> {gmax}")

    # parity first
    want = sample_alpha(mask, xyz) > 0
    for grp in (1, gmax):
        got = sample_alpha_gate(mask, xyz, grp)
        eq = bool(jnp.all(got == want))
        print(f"gate(group={grp}) == trilerp>0: {eq}")
        assert eq

    base = rtt()
    print(f"scalar pull rtt {base * 1e3:.1f} ms")
    t_ref = bench(lambda c: sample_alpha(mask, c) > 0, xyz, args.reps, base,
                  "trilerp rows (8-lane uint8, 1/sample)", total)
    groups = sorted({1, 2, max(gmax // 2, 1), gmax})
    for grp in groups:
        t_g = bench(lambda c, _g=grp: sample_alpha_gate(mask, c, _g), xyz,
                    args.reps, base, f"bit rows, group={grp}", total)
        print(f"    -> {t_ref / t_g:.2f}x vs trilerp rows")


if __name__ == "__main__":
    main()
