"""align_corners=True bilinear resize for grid upsampling
(reference: models/tensoRF.py:258-278 uses ``F.interpolate(..., mode='bilinear',
align_corners=True)``).

TPU-first design: rather than gathers, the separable 1-D linear interpolation
is expressed as a dense interpolation-matrix product (sizes are <= ~300, so the
[dst, src] matrix is tiny) — this rides the MXU and fuses cleanly. Runs only at
phase boundaries (upsample events), so simplicity > micro-optimality here.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _interp_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] linear interpolation matrix, align_corners=True."""
    m = np.zeros((dst, src), dtype=np.float32)
    if dst == 1 or src == 1:
        m[:, 0] = 1.0
        return m
    coords = np.arange(dst) * (src - 1) / (dst - 1)
    i0 = np.floor(coords).astype(np.int64)
    i0 = np.clip(i0, 0, src - 2)
    w = coords - i0
    m[np.arange(dst), i0] = 1.0 - w
    m[np.arange(dst), i0 + 1] = w
    return m


def resize_linear_ac(x: jnp.ndarray, new_len: int, axis: int = 0) -> jnp.ndarray:
    """Linearly resize `x` along `axis` to `new_len` (align_corners=True)."""
    src = x.shape[axis]
    if src == new_len:
        return x
    m = jnp.asarray(_interp_matrix(src, new_len))
    # HIGHEST: resize runs only at phase boundaries; parameter-carrying values
    # must not be bf16-rounded by the MXU default.
    out = jnp.tensordot(m, jnp.moveaxis(x, axis, 0), axes=1, precision="highest")
    return jnp.moveaxis(out, 0, axis)


def resize_bilinear_ac(x: jnp.ndarray, new_h: int, new_w: int) -> jnp.ndarray:
    """Bilinearly resize [H, W, C] -> [new_h, new_w, C] (align_corners=True)."""
    x = resize_linear_ac(x, new_h, axis=0)
    x = resize_linear_ac(x, new_w, axis=1)
    return x
