"""Volumetric compositing math (reference: models/tensorBase.py:23-35)."""

from __future__ import annotations

import jax.numpy as jnp


def exclusive_transmittance(alpha: jnp.ndarray) -> jnp.ndarray:
    """T_i = prod_{j<i} (1 - alpha_j + 1e-10), exclusive along the last axis.

    Returns [..., N+1]: the first N entries are the exclusive products, the
    final entry is the full product (background transmittance).
    """
    ones = jnp.ones(alpha.shape[:-1] + (1,), dtype=alpha.dtype)
    t = jnp.cumprod(jnp.concatenate([ones, 1.0 - alpha + 1e-10], axis=-1), axis=-1)
    return t


def raw2alpha(sigma: jnp.ndarray, dist: jnp.ndarray):
    """sigma, dist [N_rays, N_samples] -> (alpha, weights, bg_weight).

    alpha_i   = 1 - exp(-sigma_i * dist_i)
    weights_i = alpha_i * T_i          (T exclusive transmittance)
    bg_weight = T_{N}                  [N_rays, 1]
    """
    alpha = 1.0 - jnp.exp(-sigma * dist)
    t = exclusive_transmittance(alpha)
    weights = alpha * t[..., :-1]
    return alpha, weights, t[..., -1:]
