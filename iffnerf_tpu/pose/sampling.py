"""Surface sampling + candidate-ray generation for IFFNeRF
(reference pose_estimation/sampling.py, model_utils.py:22-33).

TPU-first recast (SURVEY.md §7 step 6): the reference's data-dependent
accept/reject ``while`` (sampling.py:144-213) becomes a fixed-shape
``lax.while_loop``: every iteration proposes a constant 5 sphere-jitters for
*all* N samples and accepted proposals overwrite only still-invalid slots.
The per-iteration proposal budget matches the reference's
``n_total_multiple = 5 N`` exactly — the reference merely redistributes the
same budget over the shrinking invalid set, which needs dynamic shapes; the
dense form does the same work with static ones.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from iffnerf_tpu.models.field import AlphaMask, FieldConfig
from iffnerf_tpu.models.render import compute_alpha, render_rays
from iffnerf_tpu.models.field import compute_appfeature, normalize_coord
from iffnerf_tpu.models.shading import compute_normals
from iffnerf_tpu.pose.isocell import isocell_distribution, rotate_isocell


def _sphere_jitter(key, shape, rho, dtype=jnp.float32):
    """Uniform directions x |N(0, rho)| radii (reference sampling.py:36-67)."""
    k1, k2, k3 = jax.random.split(key, 3)
    theta = 2 * math.pi * jax.random.uniform(k1, shape, dtype)
    phi = jnp.arccos(1 - 2 * jax.random.uniform(k2, shape, dtype))
    dirs = jnp.stack(
        [jnp.sin(phi) * jnp.cos(theta), jnp.sin(phi) * jnp.sin(theta),
         jnp.cos(phi)],
        axis=-1,
    )
    dist = jnp.abs(jax.random.normal(k3, shape, dtype) * rho)
    return dirs * dist[..., None]


def generate_uniform_samples(key, config: FieldConfig, n: int):
    """(reference sampling.py:119-128)"""
    aabb = jnp.asarray(config.aabb_np)
    u = jax.random.uniform(key, (n, 3))
    return u * (aabb[1] - aabb[0]) + aabb[0]


def generate_samples_from_occupancy_grid(key, mask: AlphaMask, n: int):
    """Uniform choice over occupied voxels + in-voxel jitter
    (reference sampling.py:79-116).

    Sampled by inverse CDF over the occupancy prefix count rather than
    ``jax.random.categorical``: categorical materializes an [n, n_voxels]
    Gumbel-noise matrix, which at a production 300-cubed mask and n=20000
    is ~600 GB — the cumsum+searchsorted form is the same uniform
    distribution over occupied voxels at O(n_voxels + n log n_voxels)."""
    vol = mask.volume  # [D, H, W] (z, y, x)
    d, h, w = vol.shape
    occ = vol.reshape(-1) > 0
    cdf = jnp.cumsum(occ.astype(jnp.int32))
    total = jnp.maximum(cdf[-1], 1)
    k1, k2 = jax.random.split(key)
    u = jax.random.randint(k1, (n,), 0, total)
    # flat index of the (u+1)-th occupied voxel; the clamp covers an
    # all-empty mask (cdf all zero -> searchsorted returns d*h*w for every
    # draw) so degenerate volumes yield in-grid samples instead of
    # out-of-aabb points
    flat_idx = jnp.searchsorted(cdf, u, side="right")
    flat_idx = jnp.minimum(flat_idx, d * h * w - 1)
    zi = flat_idx // (h * w)
    yi = (flat_idx // w) % h
    xi = flat_idx % w
    samples = jnp.stack([xi, yi, zi], axis=-1).astype(jnp.float32)
    samples = samples + jax.random.uniform(k2, samples.shape)
    grid_shape = jnp.asarray([w, h, d], jnp.float32)
    aabb_size = mask.aabb[1] - mask.aabb[0]
    return aabb_size * samples / (grid_shape - 1.0) + mask.aabb[0]


def generate_initial_samples(key, config: FieldConfig, params,
                             mask: AlphaMask | None, n: int):
    """(reference sampling.py:131-140)"""
    if mask is not None:
        samples = generate_samples_from_occupancy_grid(key, mask, n)
    else:
        samples = generate_uniform_samples(key, config, n)
    alpha = compute_alpha(config, params, mask, samples, 1.0)
    return samples, alpha


@functools.partial(
    jax.jit,
    static_argnames=("config", "has_mask", "max_iterations", "n_multiple"),
)
def _sampling_epoch(config: FieldConfig, params, mask, has_mask: bool,
                    samples, alpha, rho, key, max_iterations: int = 200,
                    n_multiple: int = 5):
    """One Metropolis-like resampling epoch (reference sampling.py:144-213)."""
    mask_arg = mask if has_mask else None
    thresh = jnp.quantile(alpha, 0.6)
    invalid = jnp.ones(samples.shape[0], dtype=bool)

    def cond(state):
        samples, alpha, invalid, it, key = state
        return jnp.logical_and(jnp.any(invalid), it < max_iterations)

    def body(state):
        samples, alpha, invalid, it, key = state
        key, jit_key, sel_key = jax.random.split(key, 3)
        proposals = samples[:, None, :] + _sphere_jitter(
            jit_key, (samples.shape[0], n_multiple), rho
        )
        alpha_new = compute_alpha(
            config, params, mask_arg, proposals.reshape(-1, 3), 1.0
        ).reshape(samples.shape[0], n_multiple)
        ok = alpha_new > thresh
        any_ok = jnp.any(ok, axis=-1)
        # uniform random choice among accepted proposals per sample
        r = jax.random.uniform(sel_key, ok.shape)
        pick = jnp.argmax(jnp.where(ok, r, -1.0), axis=-1)
        picked_samples = jnp.take_along_axis(
            proposals, pick[:, None, None], axis=1
        )[:, 0]
        picked_alpha = jnp.take_along_axis(alpha_new, pick[:, None], axis=1)[
            :, 0
        ]
        accept = invalid & any_ok
        samples = jnp.where(accept[:, None], picked_samples, samples)
        alpha = jnp.where(accept, picked_alpha, alpha)
        invalid = invalid & ~any_ok
        return samples, alpha, invalid, it + 1, key

    samples, alpha, invalid, it, _ = jax.lax.while_loop(
        cond, body, (samples, alpha, invalid, jnp.int32(0), key)
    )
    return samples, alpha, it, jnp.sum(invalid)


def iterative_surface_sampling_process(key, config: FieldConfig, params,
                                       mask: AlphaMask | None,
                                       gen_points: int = 8000,
                                       n_iteration: int = 4,
                                       max_resampling_iterations: int = 200):
    """(reference sampling.py:509-532)"""
    key, init_key = jax.random.split(key)
    samples, alpha = generate_initial_samples(
        init_key, config, params, mask, gen_points
    )
    grid_size = jnp.asarray(config.grid_size, jnp.float32)
    aabb_size = jnp.asarray(config.aabb_size)
    if mask is not None:
        rho = (jnp.max(grid_size) * 0.1) * jnp.max(aabb_size / grid_size)
    else:
        rho = jnp.linalg.norm(aabb_size)
    for _ in range(n_iteration):
        key, ep_key = jax.random.split(key)
        samples, alpha, _, _ = _sampling_epoch(
            config, params, mask, mask is not None, samples, alpha, rho,
            ep_key, max_iterations=max_resampling_iterations,
        )
    return samples


def samples_points_normals(config: FieldConfig, params, samples):
    """Surface normals from the frozen field's Ref head
    (reference sampling.py:535-541)."""
    coords = normalize_coord(config, samples)
    app_features = compute_appfeature(config, params, coords)
    return compute_normals(params["shading"], config.shading_mode,
                           app_features)


@functools.partial(jax.jit, static_argnames=("config", "white_bg"))
def evaluate_viewdirs_color(config: FieldConfig, params, mask,
                            points, viewdirs, white_bg: bool = False):
    """Ray color by rendering 20 samples centered on the surface point
    (reference sampling.py:237-251; model.sample_point_color,
    tensorBase.py:623-638). Module-level jit: the compiled program is reused
    across every ray-set regeneration."""
    rays = jnp.concatenate(
        [jnp.broadcast_to(points, viewdirs.shape), viewdirs], axis=-1
    ).reshape(-1, 6)
    rgb, *_ = render_rays(
        config, params, mask, rays, is_train=False, white_bg=white_bg,
        sample_mode="point_color", n_samples=20,
    )
    return rgb.reshape(viewdirs.shape)


def generate_all_possible_rays(config: FieldConfig, params,
                               mask: AlphaMask | None, points, normals,
                               num_viewdirs_per_chunk: int = 10240,
                               sample_isocell_targets: int = 27):
    """points x isocell dirs -> (ori, dirs, rgb), each [N*M, 3]
    (reference sampling.py:442-488)."""
    sample_dirs = jnp.asarray(
        isocell_distribution(sample_isocell_targets, N0=3, isrand=-1)
    )
    rotated = rotate_isocell(sample_dirs, normals)  # [N, M, 3]
    rotated = rotated / jnp.linalg.norm(rotated, axis=-1, keepdims=True)
    points_b = jnp.broadcast_to(points[:, None], rotated.shape)

    m = sample_dirs.shape[0]
    pts_per_chunk = max(num_viewdirs_per_chunk // m, 1)
    n = points.shape[0]

    rgb_parts = []
    for i in range(0, n, pts_per_chunk):
        pts = points_b[i:i + pts_per_chunk]
        dirs = rotated[i:i + pts_per_chunk]
        pad = pts_per_chunk - pts.shape[0]
        if pad:
            pts = jnp.pad(pts, ((0, pad), (0, 0), (0, 0)), mode="edge")
            dirs = jnp.pad(dirs, ((0, pad), (0, 0), (0, 0)), mode="edge")
        rgb = evaluate_viewdirs_color(config, params, mask, pts, dirs)
        rgb_parts.append(rgb[:pts.shape[0] - pad] if pad else rgb)
    rgbs = jnp.concatenate(rgb_parts, axis=0)
    return (
        points_b.reshape(-1, 3),
        rotated.reshape(-1, 3),
        rgbs.reshape(-1, 3),
    )


def explore_field(key, config: FieldConfig, params, mask: AlphaMask | None,
                  gen_points: int = 20000, **kwargs):
    """The candidate-ray-set generator (reference model_utils.py:22-33):
    surface points -> normals -> isocell rays -> per-ray colors."""
    samples = iterative_surface_sampling_process(
        key, config, params, mask, gen_points=gen_points, **kwargs
    )
    normals = samples_points_normals(config, params, samples)
    return generate_all_possible_rays(config, params, mask, samples, normals)
