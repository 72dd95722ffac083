"""Integrated Directional Encoding (Ref-NeRF; reference: models/ref_utils.py:23-112).

The coefficient tables are computed host-side in exact float64 (they are static
per ``deg_view``). The application avoids complex arithmetic: torch's
``(x + iy) ** m`` is rewritten in polar form ``r^m (cos m\theta + i sin m\theta)``,
which keeps everything in real float32 and TPU-friendly (no complex dtype on
the MXU path).
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import jax.numpy as jnp


def _generalized_binomial_coeff(a: float, k: int) -> float:
    return float(np.prod(a - np.arange(k))) / math.factorial(k)


def _assoc_legendre_coeff(l: int, m: int, k: int) -> float:
    return (
        (-1) ** m
        * 2**l
        * math.factorial(l)
        / math.factorial(k)
        / math.factorial(l - k - m)
        * _generalized_binomial_coeff(0.5 * (l + k + m - 1.0), l)
    )


def _sph_harm_coeff(l: int, m: int, k: int) -> float:
    return (
        math.sqrt(
            (2.0 * l + 1.0)
            * math.factorial(l - m)
            / (4.0 * math.pi * math.factorial(l + m))
        )
        * _assoc_legendre_coeff(l, m, k)
    )


@lru_cache(maxsize=None)
def integrated_dir_enc_coeffs(deg_view: int):
    """Static tables: (ml_array [2, M], mat [l_max+1, M]) as numpy float32.

    ml_array rows are (m, l); columns enumerate l = 2^i for i < deg_view and
    m = 0..l. Output dim of the encoding is 2 * M.
    """
    ml_list = []
    for i in range(deg_view):
        l = 2**i
        for m in range(l + 1):
            ml_list.append((m, l))
    ml_array = np.array(ml_list, dtype=np.int32).T  # [2, M]
    l_max = 2 ** (deg_view - 1)

    mat = np.zeros((l_max + 1, ml_array.shape[1]), dtype=np.float64)
    for i, (m, l) in enumerate(ml_array.T):
        for k in range(l - m + 1):
            mat[k, i] = _sph_harm_coeff(int(l), int(m), k)
    return ml_array, mat.astype(np.float32)


def ide_output_dim(deg_view: int) -> int:
    return sum((2**i) + 1 for i in range(deg_view)) * 2


def integrated_dir_enc(
    xyz: jnp.ndarray, kappa_inv: jnp.ndarray, deg_view: int = 4
) -> jnp.ndarray:
    """IDE of directions under a vMF roughness distribution.

    Args:
      xyz:       [..., 3] unit directions.
      kappa_inv: [..., 1] reciprocal vMF concentration (roughness).
      deg_view:  number of octave levels (reference default 4).
    Returns:
      [..., 2*M] with (real, imag) interleaved per harmonic — matches torch
      ``view_as_real(...).reshape(..., -1)`` ordering.
    """
    ml_np, mat_np = integrated_dir_enc_coeffs(deg_view)
    m_arr = jnp.asarray(ml_np[0], dtype=xyz.dtype)  # [M]
    l_arr = jnp.asarray(ml_np[1], dtype=xyz.dtype)  # [M]
    mat = jnp.asarray(mat_np, dtype=xyz.dtype)  # [l_max+1, M]

    x = xyz[..., 0:1]
    y = xyz[..., 1:2]
    z = xyz[..., 2:3]

    # z-Vandermonde [.., l_max+1]
    powers = jnp.arange(mat.shape[0], dtype=xyz.dtype)
    vmz = z**powers

    # (x + iy)^m in polar form, zero-safe: r^m is well-defined for m = 0 via
    # where-guard (0^0 = 1), and theta*m with r = 0 contributes r^m = 0.
    r2 = x * x + y * y
    r = jnp.sqrt(r2)
    theta = jnp.arctan2(y, x)
    log_r = jnp.log(jnp.maximum(r, 1e-37))
    r_pow_m = jnp.where(m_arr == 0, 1.0, jnp.exp(m_arr * log_r))
    re = r_pow_m * jnp.cos(m_arr * theta)
    im = r_pow_m * jnp.sin(m_arr * theta)

    zpart = vmz @ mat  # [..., M]
    sph_re = re * zpart
    sph_im = im * zpart

    sigma = 0.5 * l_arr * (l_arr + 1.0)
    atten = jnp.exp(-sigma * kappa_inv)

    out = jnp.stack([sph_re * atten, sph_im * atten], axis=-1)
    return out.reshape(out.shape[:-2] + (-1,))
