"""Chunked rendering + image evaluation (reference renderer.py:12-197).

The reference's ``OctreeRender_trilinear_fast`` splits rays into 4096-ray
chunks with a host loop and per-chunk ``.to(device)`` staging. Here each
chunk is one jit-compiled static-shape program (compiled once; the last
chunk is edge-padded), rays live on device, and an optional
``jax.sharding.Mesh`` splits each chunk's ray axis over all local devices.
"""

from __future__ import annotations

import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from iffnerf_tpu.models.field import AlphaMask, FieldConfig
from iffnerf_tpu.models.render import ray_span_steps, render_rays
from iffnerf_tpu.utils.metrics import mse2psnr, rgb_ssim, rgb_lpips


@functools.partial(
    jax.jit,
    static_argnames=("config", "has_mask", "white_bg", "ndc_ray", "n_samples"),
)
def _render_chunk(config: FieldConfig, params, mask, has_mask: bool,
                  rays, white_bg: bool, ndc_ray: bool, n_samples: int):
    rgb, depth, acc, alpha, z_vals, dists = render_rays(
        config, params, mask if has_mask else None, rays,
        is_train=False, white_bg=white_bg, ndc_ray=ndc_ray,
        n_samples=n_samples,
    )
    return rgb, depth


@functools.partial(jax.jit, static_argnames=("config", "n_samples"))
def _ray_span_steps_jit(config: FieldConfig, rays, n_samples: int):
    return ray_span_steps(config, rays, n_samples)


def _span_buckets(s_full: int):
    """Descending sample-count buckets [1, 0.72, 0.52, 0.37] x full march.
    Each bucket is one compiled program (lazily, only for buckets a scene
    touches); chunks dispatch to the smallest bucket covering their longest
    ray. Halving buckets were too coarse (blender-like scenes cluster spans
    at ~0.55-0.6 of full, landing every chunk in the full bucket), while an
    open-ended fine ladder multiplies compile time; short-span chunks below
    the last bucket are cheap either way."""
    return [s_full, int(0.72 * s_full) + 1, int(0.52 * s_full) + 1,
            int(0.37 * s_full) + 1] if s_full > 96 else [s_full]


def _render_sorted_chunks(config, params, mask, rays, ray_steps, chunk,
                          white_bg, mesh, s_full):
    """Render the given rays (already restricted to AABB hits) in
    descending-span order, each chunk at the smallest sample-count bucket
    covering its rays. Returns (rgb [N,3], depth [N]) as numpy, in the
    INPUT order."""
    steps_np = np.asarray(ray_steps)
    order = np.argsort(-steps_np, kind="stable")
    sorted_rays = jnp.take(rays, jnp.asarray(order), axis=0)
    buckets = _span_buckets(s_full)

    n = sorted_rays.shape[0]
    rgb_out = np.empty((n, 3), np.float32)
    depth_out = np.empty((n,), np.float32)
    pending = []  # keep results on device until all chunks are dispatched
    for i in range(0, n, chunk):
        part = sorted_rays[i:i + chunk]
        if part.shape[0] < chunk:
            part = jnp.pad(part, ((0, chunk - part.shape[0]), (0, 0)),
                           mode="edge")
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            part = jax.device_put(part, NamedSharding(mesh, P("data")))
        need = int(steps_np[order[i]])  # descending -> chunk max
        s_bucket = next(b for b in reversed(buckets) if b >= need)
        rgb, depth = _render_chunk(
            config, params, mask, mask is not None, part, white_bg, False,
            s_bucket,
        )
        pending.append((i, min(chunk, n - i), rgb, depth))
    for i, take, rgb, depth in pending:
        idx = order[i:i + take]
        rgb_out[idx] = np.asarray(rgb[:take])
        depth_out[idx] = np.asarray(depth[:take])
    return rgb_out, depth_out


def render_chunked(config: FieldConfig, params, mask: AlphaMask | None,
                   rays, chunk: int = 4096, n_samples: int = -1,
                   white_bg: bool = False, ndc_ray: bool = False,
                   mesh=None, active_rays: bool = True):
    """rays [N, 6|7] -> (rgb [N, 3], depth [N]) — the counterpart of
    ``OctreeRender_trilinear_fast`` (reference renderer.py:12-25).

    For AABB-contracted non-NDC renders (``active_rays``, default), rays
    are compacted to the AABB hits and span-sorted so each chunk marches
    only as many samples as its longest ray needs (a handful of
    pre-compiled sample-count buckets) — misses get the exact miss output
    (bg color, depth = rays[:, -1]) without touching the field. Exact
    w.r.t. the flat ``n_samples``-length march: dropped samples are invalid
    in both, see models/render.ray_span_steps."""
    # Derive the grouped-occupancy-gate size from THIS ray set's measured
    # max |dir component| (models/field.gate_group_for) — enables the gate
    # for checkpoint-loaded evals and re-validates any trainer-set value
    # against the rays actually rendered. Host-side only: a device array
    # would cost a blocking pull, so it keeps whatever config carries.
    # mask_gate_group < 0 is the benchmark kill switch: keep the per-sample
    # trilerp row (render_rays only gates when >= 1).
    if (mask is not None and getattr(mask, "packed_bits", None) is not None
            and not ndc_ray and config.contraction_type == "aabb"
            and config.mask_gate_group >= 0
            and isinstance(rays, np.ndarray) and rays.shape[0] > 0):
        from iffnerf_tpu.models.field import gate_group_for

        g = gate_group_for(
            mask.volume.shape, np.asarray(mask.aabb), config.step_size,
            mask.bits_window,
            dir_bound=float(np.abs(rays[:, 3:6]).max()),
        )
        config = config.replace(mask_gate_group=g)

    rays = jnp.asarray(rays)
    n = rays.shape[0]
    if mesh is not None:
        chunk = max(chunk, mesh.size)
        chunk = (chunk // mesh.size) * mesh.size

    compactable = (
        active_rays
        and not ndc_ray
        and config.contraction_type == "aabb"
        and n > 0
    )
    if compactable:
        s_full = n_samples if n_samples > 0 else config.n_samples
        steps = np.asarray(_ray_span_steps_jit(config, rays, s_full))
        hit = np.nonzero(steps > 0)[0]
        bg = 1.0 if white_bg else 0.0
        rgb_out = np.full((n, 3), bg, np.float32)
        depth_out = np.array(rays[:, -1], np.float32)
        if hit.size:
            hit_j = jnp.asarray(hit)
            rgb_hit, depth_hit = _render_sorted_chunks(
                config, params, mask, jnp.take(rays, hit_j, axis=0),
                steps[hit], chunk, white_bg, mesh, s_full,
            )
            rgb_out[hit] = rgb_hit
            depth_out[hit] = depth_hit
        # numpy out: results were already pulled host-side per chunk;
        # pushing them back to device would double the relay traffic
        return rgb_out, depth_out

    rgbs, depths = [], []
    for i in range(0, n, chunk):
        part = rays[i:i + chunk]
        if part.shape[0] < chunk:
            part = jnp.pad(part, ((0, chunk - part.shape[0]), (0, 0)),
                           mode="edge")
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            part = jax.device_put(part, NamedSharding(mesh, P("data")))
        rgb, depth = _render_chunk(
            config, params, mask, mask is not None, part, white_bg, ndc_ray,
            n_samples,
        )
        take = min(chunk, n - i)
        rgbs.append(rgb[:take])
        depths.append(depth[:take])
    return jnp.concatenate(rgbs), jnp.concatenate(depths)


def _write_video(path: str, frames) -> None:
    """mp4 via imageio/ffmpeg when available; GIF fallback (this image has
    no ffmpeg backend)."""
    import imageio

    try:
        imageio.mimwrite(path, np.stack(frames), fps=30, quality=10)
    except (ValueError, ImportError):
        imageio.mimwrite(path[:-4] + ".gif", np.stack(frames), fps=15)


def visualize_depth_numpy(depth: np.ndarray, minmax=None):
    """Depth colormap for artifact dumps (cv2 JET like the reference's
    utils.visualize_depth_numpy)."""
    import cv2

    x = np.nan_to_num(depth)
    mi = np.min(x[x > 0]) if (x > 0).any() else 0.0
    ma = np.max(x)
    if minmax is not None:
        mi, ma = minmax
    x = (x - mi) / (ma - mi + 1e-8)
    x = (255 * np.clip(x, 0, 1)).astype(np.uint8)
    return cv2.applyColorMap(x, cv2.COLORMAP_JET), [mi, ma]


def evaluation(dataset, config: FieldConfig, params, mask: AlphaMask | None,
               save_path: str | None = None, N_vis: int = 5, prtx: str = "",
               n_samples: int = -1, white_bg: bool = False,
               ndc_ray: bool = False, compute_extra_metrics: bool = True,
               chunk: int = 16384, mesh=None):
    """Held-out-view evaluation: renders every selected test image, computes
    PSNR (always) and SSIM/LPIPS (optional), saves PNG/mp4 artifacts
    (reference renderer.py:28-140). Returns the list of per-image PSNRs."""
    psnrs, ssims, l_alex, l_vgg = [], [], [], []
    if save_path is not None:
        os.makedirs(save_path, exist_ok=True)
        os.makedirs(save_path + "/rgbd", exist_ok=True)

    near_far = dataset.near_far
    img_eval_interval = (
        1 if N_vis < 0 else max(len(dataset.all_rays) // max(N_vis, 1), 1)
    )
    idxs = list(range(0, len(dataset.all_rays), img_eval_interval))

    w, h = dataset.img_wh
    frames = []
    times = []  # per-image render seconds: [0] carries the bucket compiles
    t0 = time.perf_counter()
    for idx in idxs:
        t_img = time.perf_counter()
        rays = np.asarray(dataset.all_rays[idx]).reshape(-1,
                                                         dataset.all_rays.shape[-1])
        rgb, depth = render_chunked(
            config, params, mask, rays, chunk=chunk, n_samples=n_samples,
            white_bg=white_bg, ndc_ray=ndc_ray, mesh=mesh,
        )
        rgb = np.asarray(rgb).reshape(h, w, 3)
        depth = np.asarray(depth).reshape(h, w)
        times.append(time.perf_counter() - t_img)

        if len(dataset.all_rgbs):
            gt = np.asarray(dataset.all_rgbs[idx]).reshape(h, w, -1)
            if gt.shape[-1] == 4:
                bg = 1.0 if white_bg else 0.0
                gt = gt[..., :3] * gt[..., -1:] + bg * (1.0 - gt[..., -1:])
            mse = float(np.mean((rgb - gt) ** 2))
            psnrs.append(mse2psnr(mse))
            if compute_extra_metrics:
                ssims.append(rgb_ssim(rgb, gt, 1.0))
                try:
                    l_alex.append(rgb_lpips(gt, rgb, "alex"))
                    l_vgg.append(rgb_lpips(gt, rgb, "vgg"))
                except RuntimeError:
                    pass

        if save_path is not None:
            import imageio

            rgb8 = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
            depth8, _ = visualize_depth_numpy(depth, near_far)
            imageio.imwrite(f"{save_path}/{prtx}{idx:03d}.png", rgb8)
            imageio.imwrite(
                f"{save_path}/rgbd/{prtx}{idx:03d}.png",
                np.concatenate([rgb8, depth8], axis=1),
            )
            frames.append(rgb8)

    elapsed = time.perf_counter() - t0
    if save_path is not None and frames:
        _write_video(f"{save_path}/{prtx}video.mp4", frames)
    if psnrs and save_path is not None:
        with open(f"{save_path}/{prtx}mean.txt", "w") as f:
            f.write(f"PSNR: {np.mean(psnrs)}\n")
            if ssims:
                f.write(f"SSIM: {np.mean(ssims)}\n")
            f.write(f"n_images: {len(idxs)} time_s: {elapsed}\n")
            # image 0 pays the per-span-bucket compiles; the warm rate is
            # the median of the rest (reference renderer.py:104-112 prints
            # the equivalent CUDA-event per-image times)
            f.write(f"first_image_s: {times[0]:.3f} "
                    f"warm_median_s: {np.median(times[1:] or times):.3f}\n")
    return psnrs


def evaluation_path(config: FieldConfig, params, mask, c2ws, dataset,
                    save_path: str | None = None, prtx: str = "",
                    n_samples: int = -1, white_bg: bool = False,
                    ndc_ray: bool = False, chunk: int = 8192, mesh=None):
    """Render a camera path to a video (reference renderer.py:143-197)."""
    from iffnerf_tpu.data.rays_np import (
        ray_directions_Ks_np,
        rays_with_radii_np,
    )

    w, h = dataset.img_wh
    K = np.asarray(dataset.K)
    ori_dirs, dx, dy = ray_directions_Ks_np(h, w, K)
    ori_dirs, dx, dy = ori_dirs[0], dx[0], dy[0]
    dirs = ori_dirs / np.linalg.norm(ori_dirs, axis=-1, keepdims=True)

    frames = []
    if save_path is not None:
        os.makedirs(save_path, exist_ok=True)
    for c2w in np.asarray(c2ws):
        rays_o, rays_d, radii = rays_with_radii_np(
            dirs, c2w.astype(np.float32), directions=ori_dirs, dx=dx, dy=dy
        )
        rays = np.concatenate(
            [rays_o.reshape(-1, 3), rays_d.reshape(-1, 3),
             radii.reshape(-1, 1)], -1,
        ).astype(np.float32)
        rgb, _ = render_chunked(
            config, params, mask, rays, chunk=chunk, n_samples=n_samples,
            white_bg=white_bg, ndc_ray=ndc_ray, mesh=mesh,
        )
        frames.append(
            (np.clip(np.asarray(rgb).reshape(h, w, 3), 0, 1) * 255).astype(
                np.uint8
            )
        )
    if save_path is not None and frames:
        _write_video(f"{save_path}/{prtx}video.mp4", frames)
    return frames
