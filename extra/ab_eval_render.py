"""Interleaved A/B of the round-1 (flat march) vs round-2 (active-ray
compacted) eval renderer — one process, alternating measurements, so relay
throughput drift (which varies by >4x across minutes on the axon tunnel)
cancels out of the comparison.

Usage: python extra/ab_eval_render.py [--extent 1.5] [--reps 3]
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

from iffnerf_tpu.render import render_chunked

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_eval_render import build_scene, camera_rays  # noqa: E402


def render(cfg, params, mask, rays, flat: bool, chunk: int):
    kw = dict(chunk=chunk, white_bg=True)
    if flat:
        kw["active_rays"] = False
    t0 = time.perf_counter()
    rgb, depth = render_chunked(cfg, params, mask, rays, **kw)
    rgb = np.asarray(rgb)
    return time.perf_counter() - t0, rgb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=300)
    ap.add_argument("--extent", type=float, default=1.5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=16384)
    args = ap.parse_args()

    cfg, params, mask = build_scene(args.grid, args.extent)
    rays = camera_rays()
    print(f"grid {args.grid}^3 extent {args.extent} "
          f"n_samples {cfg.n_samples}")

    # compile both paths
    t0 = time.perf_counter()
    _, rgb_flat = render(cfg, params, mask, rays, True, args.chunk)
    print(f"flat compile+first: {time.perf_counter() - t0:.1f} s")
    t0 = time.perf_counter()
    _, rgb_new = render(cfg, params, mask, rays, False, args.chunk)
    print(f"new  compile+first: {time.perf_counter() - t0:.1f} s")
    diff = float(np.abs(rgb_flat - rgb_new).max())
    print(f"max |flat - new| rgb diff: {diff:.2e}")

    ts = {"flat": [], "new": []}
    for rep in range(args.reps):
        for name, flat in (("flat", True), ("new", False)):
            dt, _ = render(cfg, params, mask, rays, flat, args.chunk)
            ts[name].append(dt)
            print(f"rep {rep} {name}: {dt:.2f} s")
    f = float(np.median(ts["flat"]))
    n = float(np.median(ts["new"]))
    print(f"median flat {f:.2f} s/image | new {n:.2f} s/image | "
          f"speedup {f / n:.2f}x")


if __name__ == "__main__":
    main()
