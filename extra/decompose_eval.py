"""Decompose the eval-render chunk cost on the TPU (round-2 perf work).

Times each stage of the masked eval march in isolation for a given
sample-count bucket: sampling, mask trilerp, block-flag popcount + nonzero,
compacted feature eval, full render_rays. Run alone (no concurrent TPU
process!).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iffnerf_tpu.runtime import setup as _runtime_setup

_runtime_setup()

import functools
import jax
import jax.numpy as jnp

from bench_eval_render import build_scene, camera_rays  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def timeit(fn, *args, n=5, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:42s} {dt:8.1f} ms")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=300)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--n_samples", type=int, default=0,
                    help="bucket size (0 = full march)")
    args = ap.parse_args()

    cfg, params, mask = build_scene(args.grid)
    rays_all = camera_rays()
    # middle-of-image chunk (rays through the object)
    mid = rays_all.shape[0] // 2
    rays = jnp.asarray(rays_all[mid - args.chunk // 2: mid + args.chunk // 2])
    s = args.n_samples or cfg.n_samples
    print(f"chunk {args.chunk} x {s} samples = {args.chunk * s / 1e6:.1f}M")

    from iffnerf_tpu.models.render import (
        _BLOCK, _compact_march, raw2alpha, sample_ray,
    )
    from iffnerf_tpu.models.field import (
        compute_features_fused, feature2density, normalize_coord,
        sample_alpha,
    )

    @jax.jit
    def stage_sample(r):
        xyz, z, valid = sample_ray(cfg, r[:, :3], r[:, 3:6], is_train=False,
                                   n_samples=s)
        return xyz, z, valid

    xyz, z_vals, box_valid = timeit(stage_sample, rays, label="sample_ray")

    @jax.jit
    def stage_mask(xyz, valid):
        return valid & (sample_alpha(mask, xyz) > 0)

    ray_valid = timeit(stage_mask, xyz, box_valid,
                       label="alpha-mask trilerp")
    vf = float(jnp.mean(ray_valid))
    print(f"{'valid fraction':42s} {vf:8.4f}")

    @jax.jit
    def stage_flags(valid):
        vf = valid.reshape(-1)
        blk = jnp.any(vf.reshape(vf.shape[0] // _BLOCK, _BLOCK), -1)
        return jnp.sum(blk)

    timeit(stage_flags, ray_valid, label="block flags + popcount")

    n = args.chunk * s
    for ratio in (0.125, 0.25, 0.5):
        k = max(((int(n * ratio) + 127) // 128) * 128, 128)
        if k >= n:
            continue

        @jax.jit
        def stage_feat(xyz, valid, k=k):
            coords = normalize_coord(cfg, xyz).reshape(-1, 3)
            vf = valid.reshape(-1)
            blk = jnp.any(vf.reshape(vf.shape[0] // _BLOCK, _BLOCK), -1)
            nb = k // _BLOCK
            (bidx,) = jnp.nonzero(blk, size=nb, fill_value=blk.shape[0])
            idx = (jnp.minimum(bidx, blk.shape[0] - 1)[:, None] * _BLOCK
                   + jnp.arange(_BLOCK)[None, :]).reshape(-1)
            cc = jnp.take(coords, idx, axis=0)
            return compute_features_fused(cfg, params, cc)

        timeit(stage_feat, xyz, ray_valid,
               label=f"nonzero+gather+features k={k/1e6:.2f}M")

    @jax.jit
    def stage_full(r):
        from iffnerf_tpu.models.render import render_rays

        rgb, depth, *_ = render_rays(cfg, params, mask, r, is_train=False,
                                     white_bg=True, n_samples=s)
        return rgb, depth

    timeit(stage_full, rays, label="full render_rays")

    t0 = time.perf_counter()
    out = stage_full(rays)
    _ = np.asarray(out[0]), np.asarray(out[1])
    print(f"{'full + host pull':42s} "
          f"{(time.perf_counter() - t0) * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
