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


def render(cfg, params, mask, rays, flat: bool, chunk: int,
           gate: bool = True):
    kw = dict(chunk=chunk, white_bg=True)
    if flat:
        kw["active_rays"] = False
    if not gate:
        # kill switch: render_chunked skips the grouped-occupancy-gate
        # auto-derivation and render_rays keeps the per-sample trilerp row
        cfg = cfg.replace(mask_gate_group=-1)
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
    ap.add_argument(
        "--mode", choices=["march", "gate"], default="march",
        help="march: round-1 flat vs active-ray renderer; gate: active-ray "
             "renderer with the per-sample trilerp row vs the grouped "
             "occupancy-gate bit rows",
    )
    args = ap.parse_args()

    cfg, params, mask = build_scene(args.grid, args.extent)
    rays = camera_rays()
    print(f"grid {args.grid}^3 extent {args.extent} "
          f"n_samples {cfg.n_samples}")

    if args.mode == "march":
        variants = (("flat", dict(flat=True)), ("new", dict(flat=False)))
    else:
        variants = (("nogate", dict(flat=False, gate=False)),
                    ("gate", dict(flat=False, gate=True)))
    (name_a, kw_a), (name_b, kw_b) = variants

    # compile both paths
    t0 = time.perf_counter()
    _, rgb_a = render(cfg, params, mask, rays, chunk=args.chunk, **kw_a)
    print(f"{name_a} compile+first: {time.perf_counter() - t0:.1f} s")
    t0 = time.perf_counter()
    _, rgb_b = render(cfg, params, mask, rays, chunk=args.chunk, **kw_b)
    print(f"{name_b}  compile+first: {time.perf_counter() - t0:.1f} s")
    diff = float(np.abs(rgb_a - rgb_b).max())
    print(f"max |{name_a} - {name_b}| rgb diff: {diff:.2e}")

    ts = {name_a: [], name_b: []}
    for rep in range(args.reps):
        for name, kw in variants:
            dt, _ = render(cfg, params, mask, rays, chunk=args.chunk, **kw)
            ts[name].append(dt)
            print(f"rep {rep} {name}: {dt:.2f} s")
    f = float(np.median(ts[name_a]))
    n = float(np.median(ts[name_b]))
    print(f"median {name_a} {f:.2f} s/image | {name_b} {n:.2f} s/image | "
          f"speedup {f / n:.2f}x")


if __name__ == "__main__":
    main()
