"""Decompose the alpha-masked training step at lego scale (run ALONE on
the TPU; VERDICT round-1 #5).

All stages are timed in ONE process (relay throughput drifts >4x between
processes, see BASELINE.md measurement notes):

  * full jitted step (fwd + bwd + adam) at the configured compact_ratio
  * the same step at an alternative ratio (--ratio_b) — measures what a
    count-dependent buffer would save in training
  * render forward alone (is_train=True march)
  * value_and_grad alone (no optimizer update)
  * the [N, S] alpha-mask trilerp
  * compacted feature forward on k slots
  * the feature VJP on k slots — its transposed gathers are row
    scatter-adds into the factor tables (~10x a gather on TPU)

Usage: python extra/decompose_train_step.py [--grid 300] [--batch 4096]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from microbench_feature_eval import timeit, rtt, _pull  # noqa: E402 (runs runtime setup)
from bench_eval_render import build_scene, camera_rays  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=300)
    ap.add_argument("--extent", type=float, default=1.5)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ratio_b", type=float, default=0.125,
                    help="alternative compact_ratio to A/B against")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    from iffnerf_tpu.models.field import (
        compute_features_fused,
        normalize_coord,
        sample_alpha,
    )
    from iffnerf_tpu.models.render import render_rays, sample_ray
    from iffnerf_tpu.train.trainer import make_optimizer, make_train_step

    cfg, params, mask = build_scene(args.grid, args.extent)
    n_samples = cfg.n_samples
    print(f"grid {args.grid}^3, {n_samples} samples/ray, batch {args.batch}, "
          f"compact_ratio {cfg.compact_ratio}")

    # training-like ray batch: AABB hits from the benchmark camera
    rays_all = camera_rays()
    from iffnerf_tpu.models.render import filtering_rays_bbox

    hits = np.asarray(filtering_rays_bbox(cfg, jnp.asarray(rays_all)))
    idx = np.random.default_rng(0).choice(np.nonzero(hits)[0], args.batch,
                                          replace=False)
    rays = jnp.asarray(rays_all[idx])
    rgbs = jax.random.uniform(jax.random.PRNGKey(5), (args.batch, 4))
    key = jax.random.PRNGKey(7)
    weights = {"l1": jnp.float32(8e-5), "tv_d": jnp.float32(0),
               "tv_a": jnp.float32(0)}
    bg = jnp.ones(3)
    arange = jnp.arange(args.batch, dtype=jnp.int32)

    def time_step(config, label):
        state = make_optimizer(params, 0.02, 0.001, 0.9999)
        step = make_train_step(
            config, state.tx, has_mask=True, n_samples=n_samples,
            ndc_ray=False, ortho_weight=0.0, use_l1=True,
            use_tv_density=False, use_tv_app=False, rgb_channels=4,
        )
        # donated args -> chain the state through the loop instead of timeit
        p = jax.tree.map(jnp.array, params)
        o = state.opt_state
        p, o, mse = step(p, o, mask, rays, rgbs, arange, key, bg, weights)
        _pull(mse)
        base = rtt()
        t0 = time.perf_counter()
        for _ in range(args.reps):
            p, o, mse = step(p, o, mask, rays, rgbs, arange, key, bg, weights)
        _pull(mse)
        dt = ((time.perf_counter() - t0) - base) / args.reps * 1e3
        print(f"{label:46s} {dt:8.1f} ms")
        return dt

    time_step(cfg, f"train step (ratio {cfg.compact_ratio})")
    if args.ratio_b and args.ratio_b != cfg.compact_ratio:
        cfg_b = dataclasses.replace(cfg, compact_ratio=args.ratio_b)
        time_step(cfg_b, f"train step (ratio {args.ratio_b})")

    # ---- forward alone (same march, no grad) ----
    fwd = jax.jit(lambda p: render_rays(
        cfg, p, mask, rays, key=key, is_train=True, bg_color=1.0,
        n_samples=n_samples)[0])
    timeit(fwd, params, n=args.reps, label="render forward (is_train)")

    # ---- value_and_grad alone ----
    def loss(p):
        rgb = render_rays(cfg, p, mask, rays, key=key, is_train=True,
                          bg_color=1.0, n_samples=n_samples)[0]
        return jnp.mean((rgb - rgbs[:, :3]) ** 2)

    vg = jax.jit(jax.grad(loss))
    timeit(vg, params, n=args.reps, label="grad(loss) (no adam)")

    # ---- stage micro: mask trilerp on the full [N, S] march ----
    xyz, _, _ = sample_ray(cfg, rays[:, :3], rays[:, 3:6], key=key,
                           is_train=True, n_samples=n_samples)
    trilerp = jax.jit(lambda x: sample_alpha(mask, x))
    timeit(trilerp, xyz, n=args.reps,
           label=f"alpha-mask trilerp [{args.batch}x{n_samples}]")

    # ---- stage micro: feature fwd + VJP on k compacted slots ----
    n_total = args.batch * n_samples
    for ratio in (cfg.compact_ratio, args.ratio_b):
        if not ratio:
            continue
        k = max(((int(n_total * ratio) + 127) // 128) * 128, 128)
        coords = jax.random.uniform(jax.random.PRNGKey(2), (k, 3),
                                    minval=-1, maxval=1)
        feat = jax.jit(lambda p, c: compute_features_fused(cfg, p, c))
        timeit(feat, params, coords, n=args.reps,
               label=f"features fwd k={k/1e6:.2f}M")

        def feat_sum(p, c):
            s, a = compute_features_fused(cfg, p, c)
            return jnp.sum(s) + jnp.sum(a)

        fvjp = jax.jit(jax.grad(feat_sum))
        timeit(fvjp, params, coords, n=args.reps,
               label=f"features VJP k={k/1e6:.2f}M (row scatter-adds)")


if __name__ == "__main__":
    main()
