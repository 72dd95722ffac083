"""Repeatable lego-scale eval-render benchmark (the round-1 weak axis).

Builds a 300^3 TensorVMSplit field (lego ranks, step_ratio 0.5 ->
~1037 samples/ray), a synthetic spherical-shell alpha mask (~8% of
in-window samples valid, like a trained lego), and an 800x800 blender-like
camera, then times warm full-image renders through render_chunked.

Usage: python extra/bench_eval_render.py [--grid 300] [--images 3]
       [--flat] (disable active-ray compaction, i.e. the round-1 path)
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

from iffnerf_tpu.models import FieldConfig, init_field
from iffnerf_tpu.models.field import make_alpha_mask
from iffnerf_tpu.render import render_chunked
from iffnerf_tpu.data.rays_np import ray_directions_Ks_np, rays_with_radii_np


def build_scene(grid: int, extent: float = 1.5):
    """300^3 lego-ranks field over an AABB of +-extent with a
    spherical-shell occupancy mask (~9% of the sample window valid, like a
    trained lego). extent=1.5 reproduces the round-1 measurements (every
    800x800 ray hits the box); extent~0.6 gives a lego-like post-shrink
    box (hit fraction ~0.45 at the blender camera)."""
    cfg = FieldConfig(
        grid_size=(grid, grid, grid),
        aabb=((-extent,) * 3, (extent,) * 3),
        density_n_comp=(16, 16, 16), app_n_comp=(48, 48, 48), app_dim=27,
        shading_mode="Ref", near_far=(2.0, 6.0), step_ratio=0.5,
        feature_c=128, view_pe=2, fea_pe=2,
    )
    params = init_field(jax.random.PRNGKey(0), cfg)

    # spherical-shell occupancy: |r - 0.55e| < 0.12e
    g = 200
    lin = np.linspace(-extent, extent, g, dtype=np.float32)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    r = np.sqrt(xx**2 + yy**2 + zz**2)
    vol = (np.abs(r - 0.55 * extent) < 0.12 * extent).astype(np.float32)
    mask = make_alpha_mask(jnp.asarray(vol),
                           np.array([[-extent] * 3, [extent] * 3],
                                    np.float32))
    return cfg, params, mask


def camera_rays(h=800, w=800, dist=4.0311):
    focal = 0.5 * w / np.tan(0.5 * 0.6911112070083618)  # blender lego fov
    K = np.array([[[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]]],
                 np.float32)
    dirs, dx, dy = ray_directions_Ks_np(h, w, K)
    dirs, dx, dy = dirs[0], dx[0], dy[0]
    # look-at from a 30-deg elevated orbit position
    eye = dist * np.array([0.0, -np.cos(np.pi / 6), np.sin(np.pi / 6)],
                          np.float32)
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(np.array([0, 0, 1.0], np.float32), fwd)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    # ray_directions_Ks_np gives opencv-convention dirs (+z forward):
    # camera-space +z must map to the look direction
    c2w = np.stack([right, -up, fwd, eye], axis=1).astype(np.float32)
    viewdirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_o, rays_d, radii = rays_with_radii_np(
        viewdirs, c2w, directions=dirs, dx=dx, dy=dy,
    )
    return np.concatenate(
        [rays_o.reshape(-1, 3), rays_d.reshape(-1, 3), radii.reshape(-1, 1)],
        -1,
    ).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=300)
    ap.add_argument("--extent", type=float, default=1.5,
                    help="AABB half-extent (0.6 = lego-like hit fraction)")
    ap.add_argument("--images", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--flat", action="store_true",
                    help="force the flat full-length march (round-1 path)")
    args = ap.parse_args()

    cfg, params, mask = build_scene(args.grid, args.extent)
    rays = camera_rays()
    print(f"grid {args.grid}^3, n_samples {cfg.n_samples}, "
          f"rays {rays.shape[0]}, chunk {args.chunk}")

    kw = dict(chunk=args.chunk, white_bg=True)
    if args.flat:
        kw["active_rays"] = False

    # warm (compile) pass
    t0 = time.perf_counter()
    rgb, depth = render_chunked(cfg, params, mask, rays, **kw)
    jax.block_until_ready(rgb)
    print(f"cold render (incl. compile): {time.perf_counter() - t0:.1f} s")

    times = []
    for _ in range(args.images):
        t0 = time.perf_counter()
        rgb, depth = render_chunked(cfg, params, mask, rays, **kw)
        rgb = np.asarray(rgb)  # force the data, not just completion
        times.append(time.perf_counter() - t0)
    per = float(np.mean(times))
    print(f"warm 800x800 render: {per:.2f} s/image "
          f"({rays.shape[0] / per / 1e3:.0f}k rays/s) over {args.images} runs")
    print("acc>0.01 pixel fraction:",
          float(np.mean(np.asarray(rgb).sum(-1) < 2.97)))


if __name__ == "__main__":
    main()
