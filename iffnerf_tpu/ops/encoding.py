"""Frequency positional encoding (reference: models/tensorBase.py:14-20).

Output ordering matches the reference exactly:
``[sin(x0*1), sin(x0*2), ..., sin(xK*2^{F-1}), cos(x0*1), ...]`` — i.e. the
per-channel frequency products are flattened channel-major, then sin block
followed by cos block.
"""

from __future__ import annotations

import jax.numpy as jnp


def positional_encoding(positions: jnp.ndarray, freqs: int) -> jnp.ndarray:
    """positions [..., K] -> [..., 2*K*freqs]."""
    freq_bands = 2.0 ** jnp.arange(freqs, dtype=positions.dtype)  # (F,)
    pts = (positions[..., None] * freq_bands).reshape(
        positions.shape[:-1] + (freqs * positions.shape[-1],)
    )
    return jnp.concatenate([jnp.sin(pts), jnp.cos(pts)], axis=-1)
