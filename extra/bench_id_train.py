"""ID-module training at REFERENCE scale: s/iter + regeneration cost.

The reference's second hot loop (pose_estimation/train.py:8-234) is 1500
optimizer iterations, each accumulating gradients over 32 images against
the full 540k-candidate-ray set, with the ray set regenerated from the
frozen field every 10 iterations (train.py:65-66). This script measures
both costs at that scale on a synthetic lego-scale field (the timing does
not depend on trained weights):

  1. one optimizer step of ``make_id_train_step`` — ViT-S/14 depth 12
     fwd+bwd x 32 images + the shared-VJP 540k-ray embedding;
  2. one ``explore_field`` regeneration — 20k surface points x 27 isocell
     dirs -> 540k (ori, dir, rgb);
  3. the projected 1500-iteration wall time:
     1500 * step + 150 * regen.

Usage: python extra/bench_id_train.py [--gen_points 20000] [--accum 32]
           [--depth 12] [--iters 3]
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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_eval_render import build_scene  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=300)
    ap.add_argument("--extent", type=float, default=1.5)
    ap.add_argument("--gen_points", type=int, default=20000)
    ap.add_argument("--accum", type=int, default=32)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--iters", type=int, default=3,
                    help="timed optimizer steps (after the compile step)")
    ap.add_argument("--scan_steps", type=int, default=10,
                    help="also time make_id_train_scan chunks of this many "
                         "steps per dispatch (0 to skip)")
    args = ap.parse_args()

    from iffnerf_tpu.pose import IDConfig, init_id_module
    from iffnerf_tpu.pose.sampling import explore_field
    from iffnerf_tpu.pose.trainer import make_id_optimizer, make_id_train_step
    from iffnerf_tpu.pose.vit import ViTConfig

    fcfg, fparams, mask = build_scene(args.grid, args.extent)
    key = jax.random.PRNGKey(0)

    # ---- regeneration cost (explore_field, every-10-iters) ----
    t0 = time.perf_counter()
    rays_ori, rays_dirs, rays_rgb = explore_field(
        key, fcfg, fparams, mask, gen_points=args.gen_points
    )
    jax.block_until_ready(rays_rgb)
    regen_cold = time.perf_counter() - t0
    regen = []
    for i in range(3):
        t0 = time.perf_counter()
        out = explore_field(jax.random.PRNGKey(i + 1), fcfg, fparams, mask,
                            gen_points=args.gen_points)
        jax.block_until_ready(out[2])
        regen.append(time.perf_counter() - t0)
    regen_s = float(np.median(regen))
    n_rays = rays_ori.shape[0]
    print(f"explore_field ({args.gen_points} pts -> {n_rays} rays): "
          f"cold {regen_cold:.1f} s, warm {regen_s:.2f} s", flush=True)

    # ---- optimizer step at reference scale ----
    icfg = IDConfig(backbone=ViTConfig(depth=args.depth))
    iparams = init_id_module(jax.random.PRNGKey(7), icfg)
    tx = make_id_optimizer(iparams)
    opt_state = tx.init(iparams)
    step_fn = make_id_train_step(icfg, tx, args.accum)

    ks = jax.random.split(key, 3)
    imgs = jax.random.uniform(ks[0], (args.accum, 800, 800, 3))
    masks = jnp.ones((args.accum, 800, 800), bool)
    poses = jnp.tile(jnp.eye(4)[None], (args.accum, 1, 1)).at[:, 2, 3].set(4.0)

    t0 = time.perf_counter()
    iparams, opt_state, loss = step_fn(
        iparams, opt_state, imgs, masks, poses, rays_ori, -rays_dirs,
        rays_rgb,
    )
    print(f"step compile+first: {time.perf_counter() - t0:.1f} s "
          f"(loss {float(loss):.4f})", flush=True)

    ts = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        iparams, opt_state, loss = step_fn(
            iparams, opt_state, imgs, masks, poses, rays_ori, -rays_dirs,
            rays_rgb,
        )
        float(loss)
        ts.append(time.perf_counter() - t0)
    step_s = float(np.median(ts))
    print(f"optimizer step ({args.accum}-image accum, {n_rays} rays, "
          f"ViT-S/14 depth {args.depth}): {step_s:.2f} s/it", flush=True)

    total = 1500 * step_s + 150 * regen_s
    print(f"projected 1500-iteration wall time: {total / 3600:.2f} h "
          f"({1500 * step_s / 3600:.2f} h steps + "
          f"{150 * regen_s / 3600:.2f} h regeneration)", flush=True)

    # ---- the production dispatch pattern: scan-of-steps ----
    # One lax.scan dispatch per ray-renewal period (train_id_module's
    # scan_steps). Through a relay-attached TPU the per-step dispatch above
    # is inflated by pytree rebinding (BASELINE round 4: 20.3 s host vs
    # 0.43 s device); this is the honest per-step wall number.
    if args.scan_steps > 0:
        from iffnerf_tpu.pose.trainer import make_id_train_scan

        scan_fn = make_id_train_scan(icfg, tx, args.accum, rgba=False)
        pool = imgs  # [accum, H, W, 3] doubles as the image pool
        pposes = poses
        idx = jnp.asarray(
            np.random.default_rng(0).integers(
                0, pool.shape[0], (args.scan_steps, args.accum)
            ),
            jnp.int32,
        )
        sp = jax.tree.map(jnp.array, iparams)
        so = tx.init(sp)
        t0 = time.perf_counter()
        sp, so, losses = scan_fn(sp, so, pool, pposes, idx, rays_ori,
                                 -rays_dirs, rays_rgb)
        jax.block_until_ready(losses)
        # force completion with a data pull: through the axon relay
        # block_until_ready can return early (see microbench_scatter_vjp
        # and every BASELINE measurement)
        _ = np.asarray(losses[-1:])
        print(f"scan compile+first ({args.scan_steps} steps/dispatch): "
              f"{time.perf_counter() - t0:.1f} s", flush=True)
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            sp, so, losses = scan_fn(sp, so, pool, pposes, idx, rays_ori,
                                     -rays_dirs, rays_rgb)
            jax.block_until_ready(losses)
            _ = np.asarray(losses[-1:])
            ts.append(time.perf_counter() - t0)
        per_step = float(np.median(ts)) / args.scan_steps
        print(f"scan-of-steps wall: {per_step:.3f} s/it "
              f"({args.scan_steps} steps/dispatch) -> projected 1500 it: "
              f"{(1500 * per_step + 150 * regen_s) / 60:.1f} min",
              flush=True)

    try:
        cost = step_fn.lower(
            jax.tree.map(jnp.array, iparams),
            jax.tree.map(jnp.array, opt_state), imgs, masks, poses,
            rays_ori, -rays_dirs, rays_rgb,
        ).compile().cost_analysis()
    except Exception:
        cost = {}
    if cost:
        from profile_performance import flops_to_string, mfu_string

        print(f"   {flops_to_string(cost.get('flops', float('nan')))}  "
              f"{mfu_string(cost.get('flops', float('nan')), step_s * 1e3, cost.get('bytes accessed'))}")


if __name__ == "__main__":
    main()
