"""Grid interpolation primitives — the TPU replacement for the reference's
``F.grid_sample`` calls (reference: models/tensoRF.py:229-253, models/tensorBase.py:66-72).

Semantics match torch ``F.grid_sample(..., mode='bilinear', align_corners=True,
padding_mode='zeros')``:

  * normalized coords in [-1, 1]; pixel coord = (g + 1) / 2 * (size - 1)
  * out-of-range corner texels contribute zero (``zeros`` padding)

Layout is TPU-first: feature channels live on the *last* (lane) axis —
planes are ``[H, W, C]``, lines are ``[L, C]``, volumes are ``[D, H, W]`` (scalar) —
so each gathered texel is a contiguous lane vector and the surrounding
interpolation arithmetic vectorizes on the VPU. The gathers lower to XLA
dynamic-gather; the footprint-packed layout (ops/packed_sample.py) supersedes
these in the hot path.
"""

from __future__ import annotations

import jax.numpy as jnp


def _to_pixel(g, size: int):
    """Normalized [-1,1] -> continuous pixel coord, align_corners=True."""
    return (g + 1.0) * 0.5 * (size - 1)


def _corner(idx, size: int):
    """Clamped gather index + in-range validity flag for zeros padding."""
    valid = (idx >= 0) & (idx <= size - 1)
    return jnp.clip(idx, 0, size - 1), valid


def grid_sample_1d(line: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation along a 1-D feature line.

    Args:
      line:   [L, C] features.
      coords: [...] normalized coords in [-1, 1].
    Returns:
      [..., C] interpolated features.
    """
    L = line.shape[0]
    p = _to_pixel(coords, L)
    i0 = jnp.floor(p).astype(jnp.int32)
    w1 = (p - i0)[..., None]
    i0c, v0 = _corner(i0, L)
    i1c, v1 = _corner(i0 + 1, L)
    f0 = jnp.take(line, i0c, axis=0) * v0[..., None]
    f1 = jnp.take(line, i1c, axis=0) * v1[..., None]
    return f0 * (1.0 - w1) + f1 * w1


def grid_sample_2d(plane: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear interpolation on a 2-D feature plane.

    Args:
      plane:  [H, W, C] features.
      coords: [..., 2] normalized (x, y) coords in [-1, 1]; x indexes W, y
              indexes H (torch grid_sample convention).
    Returns:
      [..., C] interpolated features.
    """
    H, W, _ = plane.shape
    px = _to_pixel(coords[..., 0], W)
    py = _to_pixel(coords[..., 1], H)
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    wx = (px - x0)[..., None]
    wy = (py - y0)[..., None]

    x0c, vx0 = _corner(x0, W)
    x1c, vx1 = _corner(x0 + 1, W)
    y0c, vy0 = _corner(y0, H)
    y1c, vy1 = _corner(y0 + 1, H)

    flat = plane.reshape(H * W, plane.shape[-1])

    def tex(yi, xi, vy, vx):
        f = jnp.take(flat, yi * W + xi, axis=0)
        return f * (vy & vx)[..., None]

    f00 = tex(y0c, x0c, vy0, vx0)
    f01 = tex(y0c, x1c, vy0, vx1)
    f10 = tex(y1c, x0c, vy1, vx0)
    f11 = tex(y1c, x1c, vy1, vx1)

    top = f00 * (1.0 - wx) + f01 * wx
    bot = f10 * (1.0 - wx) + f11 * wx
    return top * (1.0 - wy) + bot * wy


def grid_sample_3d(volume: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Trilinear interpolation in a scalar 3-D volume (alpha-mask sampling,
    reference models/tensorBase.py:66-72).

    Args:
      volume: [D, H, W] scalars. Matches the reference's
              ``alpha_volume.view(1, 1, D, H, W)`` layout where a grid coord
              (x, y, z) indexes (W, H, D) respectively.
      coords: [..., 3] normalized (x, y, z) coords in [-1, 1].
    Returns:
      [...] interpolated scalars.
    """
    D, H, W = volume.shape
    px = _to_pixel(coords[..., 0], W)
    py = _to_pixel(coords[..., 1], H)
    pz = _to_pixel(coords[..., 2], D)
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    z0 = jnp.floor(pz).astype(jnp.int32)
    wx, wy, wz = px - x0, py - y0, pz - z0

    x0c, vx0 = _corner(x0, W)
    x1c, vx1 = _corner(x0 + 1, W)
    y0c, vy0 = _corner(y0, H)
    y1c, vy1 = _corner(y0 + 1, H)
    z0c, vz0 = _corner(z0, D)
    z1c, vz1 = _corner(z0 + 1, D)

    flat = volume.reshape(-1)

    def tex(zi, yi, xi, vz, vy, vx):
        f = jnp.take(flat, (zi * H + yi) * W + xi)
        return jnp.where(vz & vy & vx, f, 0.0)

    c000 = tex(z0c, y0c, x0c, vz0, vy0, vx0)
    c001 = tex(z0c, y0c, x1c, vz0, vy0, vx1)
    c010 = tex(z0c, y1c, x0c, vz0, vy1, vx0)
    c011 = tex(z0c, y1c, x1c, vz0, vy1, vx1)
    c100 = tex(z1c, y0c, x0c, vz1, vy0, vx0)
    c101 = tex(z1c, y0c, x1c, vz1, vy0, vx1)
    c110 = tex(z1c, y1c, x0c, vz1, vy1, vx0)
    c111 = tex(z1c, y1c, x1c, vz1, vy1, vx1)

    c00 = c000 * (1 - wx) + c001 * wx
    c01 = c010 * (1 - wx) + c011 * wx
    c10 = c100 * (1 - wx) + c101 * wx
    c11 = c110 * (1 - wx) + c111 * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz
