"""sRGB <-> linear tone mapping (reference: models/image.py:6-23)."""

from __future__ import annotations

import jax.numpy as jnp


def linear_to_srgb(linear: jnp.ndarray, eps: float | None = None) -> jnp.ndarray:
    if eps is None:
        eps = float(jnp.finfo(linear.dtype).eps)
    srgb0 = 323.0 / 25.0 * linear
    srgb1 = (211.0 * jnp.maximum(linear, eps) ** (5.0 / 12.0) - 11.0) / 200.0
    return jnp.where(linear <= 0.0031308, srgb0, srgb1)


def srgb_to_linear(srgb: jnp.ndarray, eps: float | None = None) -> jnp.ndarray:
    if eps is None:
        eps = float(jnp.finfo(srgb.dtype).eps)
    linear0 = 25.0 / 323.0 * srgb
    linear1 = jnp.maximum((200.0 * srgb + 11.0) / 211.0, eps) ** (12.0 / 5.0)
    return jnp.where(srgb <= 0.04045, linear0, linear1)
