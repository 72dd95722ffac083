"""Camera-ray generation with mip-NeRF radii, NDC warping, hierarchical PDF
sampling.

Functional jnp re-design of the reference geometry layer:
  * root ray_utils.py:8-159 (K-based directions + dx/dy neighbor grids, world
    rays + mip radii, parameterized ray gen),
  * dataLoader/ray_utils.py:29-123,155-197 (focal-based directions in opencv
    and blender conventions, simple world rays, NDC, sample_pdf).

All functions are shape-static and jittable; loaders call them once per
dataset (host or device), the iNeRF loop jits ``get_rays_from_parameters``
per optimization step.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def cast_rays(ori, dirs, z_vals):
    """(reference ray_utils.py:8-9)"""
    return ori[..., None, :] + z_vals[..., None] * dirs[..., None, :]


def _pixel_grid(H: int, W: int, pixel_center: float, dtype=jnp.float32):
    i = jnp.arange(W, dtype=dtype) + pixel_center
    j = jnp.arange(H, dtype=dtype) + pixel_center
    return jnp.meshgrid(i, j, indexing="xy")  # each [H, W]


def get_ray_directions(H: int, W: int, focal, center=None,
                       use_pixel_centers: bool = True):
    """OpenCV-convention camera dirs (+x right, +y down, +z forward)
    (reference dataLoader/ray_utils.py:29-49; grid always pixel-centered)."""
    i, j = _pixel_grid(H, W, 0.5 if use_pixel_centers else 0.0)
    cx, cy = center if center is not None else (W / 2, H / 2)
    return jnp.stack(
        [(i - cx) / focal[0], (j - cy) / focal[1], jnp.ones_like(i)], axis=-1
    )


def get_ray_directions_blender(H: int, W: int, focal, center=None,
                               use_pixel_centers: bool = True):
    """Blender-convention camera dirs (+x right, -y down, -z forward)
    (reference dataLoader/ray_utils.py:52-71)."""
    i, j = _pixel_grid(H, W, 0.5 if use_pixel_centers else 0.0)
    cx, cy = center if center is not None else (W / 2, H / 2)
    return jnp.stack(
        [(i - cx) / focal[0], -(j - cy) / focal[1], -jnp.ones_like(i)], axis=-1
    )


def get_ray_directions_Ks(H: int, W: int, K, use_pixel_centers: bool = True):
    """Directions from intrinsics K [B, 3, 3], plus +1-pixel neighbor
    directions for mip radii (reference ray_utils.py:28-58).

    Returns (directions, dx, dy), each [B, H, W, 3]."""
    K = jnp.asarray(K)
    pc = 0.5 if use_pixel_centers else 0.0
    i, j = _pixel_grid(H, W, pc, dtype=K.dtype)
    base = jnp.stack([i, j], axis=-1)  # [H, W, 2]
    base_dx = base.at[..., 0].add(1.0)
    base_dy = base.at[..., 1].add(1.0)
    stacked = jnp.stack([base, base_dx, base_dy])  # [3, H, W, 2]
    coords = jnp.concatenate([stacked, jnp.ones_like(stacked[..., :1])], -1)

    inv_k = jnp.linalg.inv(K)  # [B, 3, 3]
    # [B, 3grids, H, W, 3] = coords [3, H, W, 3] @ inv_k^T [B, 3, 3]
    dirs = jnp.einsum("bij,ghwj->bghwi", inv_k, coords)
    return dirs[:, 0], dirs[:, 1], dirs[:, 2]


def get_rays(viewdirs, c2w, keepdim: bool = False, directions=None,
             dx=None, dy=None):
    """Camera dirs -> world rays (+ mip-NeRF radii when dx/dy given)
    (reference ray_utils.py:61-100). c2w is [..., 3|4, 4]."""
    assert viewdirs.shape[-1] == 3
    assert (dx is None) == (dy is None)
    rot = c2w[..., :3, :3]

    rays_d = jnp.sum(viewdirs[..., None, :] * rot, axis=-1)
    if dx is not None:
        dx = jnp.sum(dx[..., None, :] * rot, axis=-1)
        dy = jnp.sum(dy[..., None, :] * rot, axis=-1)
    if directions is not None:
        directions = jnp.sum(directions[..., None, :] * rot, axis=-1)
    else:
        directions = rays_d

    rays_o = jnp.broadcast_to(c2w[..., :3, 3][..., None, :], rays_d.shape)

    if not keepdim:
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
        directions = directions.reshape(-1, 3)
        if dx is not None:
            dx = dx.reshape(-1, 3)
            dy = dy.reshape(-1, 3)

    if dx is not None:
        dx_norm = jnp.linalg.norm(dx - directions, axis=-1)
        dy_norm = jnp.linalg.norm(dy - directions, axis=-1)
        # half-pixel distance scaled to the stddev of a pixel-wide uniform
        # distribution (2/sqrt(12); mip-NeRF) — reference ray_utils.py:93-97
        radii = (0.5 * (dx_norm + dy_norm))[..., None] * (2.0 / math.sqrt(12.0))
        return rays_o, rays_d, radii
    return rays_o, rays_d


def get_rays_lie(viewdirs, rotation, translation, keepdim: bool = False,
                 directions=None, dx=None, dy=None):
    """SE(3)-parameterized ray generation (reference ray_utils.py:103-145;
    the kornia ``Se3`` argument becomes an explicit rotation [..., 3, 3] +
    translation [..., 3] pair here). Differentiable w.r.t. both — pair with
    ``inerf.camera_transfer`` (se(3) exp map) for pose-refinement paths.
    Same output convention as ``get_rays``."""
    assert viewdirs.shape[-1] == 3
    c2w = jnp.concatenate(
        [rotation, translation[..., :, None]], axis=-1
    )
    pad = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], c2w.dtype),
        c2w.shape[:-2] + (1, 4),
    )
    return get_rays(viewdirs, jnp.concatenate([c2w, pad], axis=-2),
                    keepdim=keepdim, directions=directions, dx=dx, dy=dy)


def get_rays_simple(directions, c2w):
    """Loader-style world rays without radii
    (reference dataLoader/ray_utils.py:74-95). c2w is [3|4, 4]."""
    rays_d = directions @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)


def get_rays_from_parameters(H: int, W: int, K, c2w, keepdim: bool = False,
                             use_pixel_centers: bool = True):
    """(reference ray_utils.py:148-159)"""
    directions, dx, dy = get_ray_directions_Ks(
        H, W, K, use_pixel_centers=use_pixel_centers
    )
    return get_rays(directions, c2w, keepdim=keepdim, dx=dx, dy=dy)


def ndc_rays_blender(H: int, W: int, focal: float, near: float, rays_o, rays_d):
    """Blender-convention NDC warp (reference dataLoader/ray_utils.py:98-123)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]
    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = -2.0 * near / rays_o[..., 2]
    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def sample_pdf(key, bins, weights, n_samples: int, det: bool = False):
    """Hierarchical inverse-CDF sampling
    (reference dataLoader/ray_utils.py:155-197, jax.random instead of the
    vestigial numpy ``pytest`` seeding)."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,), cdf.dtype)

    inds = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="right"))(
        cdf.reshape(-1, cdf.shape[-1]), u.reshape(-1, n_samples)
    ).reshape(u.shape)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g0 = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), -1)
    bins_g1 = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), -1)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def depth2dist(z_vals, cos_angle):
    """(reference dataLoader/ray_utils.py:10-18)"""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    return dists * cos_angle[..., None]


def ndc2dist(ndc_pts, cos_angle):
    """(reference dataLoader/ray_utils.py:21-26)"""
    dists = jnp.linalg.norm(ndc_pts[:, 1:] - ndc_pts[:, :-1], axis=-1)
    return jnp.concatenate([dists, 1e10 * cos_angle[..., None]], axis=-1)


def dda(rays_o, rays_d, bbox_3d):
    """AABB entry/exit per ray (reference dataLoader/ray_utils.py:200-207)."""
    inv_d = 1.0 / (rays_d + 1e-6)
    t_min = (bbox_3d[:1] - rays_o) * inv_d
    t_max = (bbox_3d[1:] - rays_o) * inv_d
    t = jnp.stack([t_min, t_max])
    near = jnp.max(jnp.min(t, axis=0), axis=-1, keepdims=True)
    far = jnp.min(jnp.max(t, axis=0), axis=-1, keepdims=True)
    return near, far


def ray_marcher(rays, n_samples: int = 64, lindisp: bool = False,
                perturb: float = 0.0, bbox_3d=None, key=None):
    """Near/far-carrying ray sampler (reference dataLoader/ray_utils.py:210-253).
    rays [N, 8] = (ori, dir, near, far)."""
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    if bbox_3d is not None:
        near, far = dda(rays_o, rays_d, bbox_3d)
    z_steps = jnp.linspace(0.0, 1.0, n_samples, dtype=rays.dtype)
    if not lindisp:
        z_vals = near * (1 - z_steps) + far * z_steps
    else:
        z_vals = 1.0 / (1.0 / near * (1 - z_steps) + 1.0 / far * z_steps)
    z_vals = jnp.broadcast_to(z_vals, (rays.shape[0], n_samples))
    if perturb > 0:
        assert key is not None
        mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        upper = jnp.concatenate([mid, z_vals[:, -1:]], -1)
        lower = jnp.concatenate([z_vals[:, :1], mid], -1)
        z_vals = lower + (upper - lower) * perturb * jax.random.uniform(
            key, z_vals.shape, rays.dtype
        )
    xyz = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]
    return xyz, rays_o, rays_d, z_vals


def read_pfm(filename: str):
    """PFM depth reader (reference dataLoader/ray_utils.py:256-291)."""
    import re

    import numpy as np

    with open(filename, "rb") as f:
        header = f.readline().decode("utf-8").rstrip()
        if header == "PF":
            color = True
        elif header == "Pf":
            color = False
        else:
            raise ValueError("Not a PFM file.")
        dims = re.match(r"^(\d+)\s(\d+)\s$", f.readline().decode("utf-8"))
        if not dims:
            raise ValueError("Malformed PFM header.")
        width, height = map(int, dims.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        scale = abs(scale)
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    return np.flipud(data.reshape(shape)), scale
