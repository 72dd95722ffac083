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

    Numerics note: the reference evaluates each harmonic's z-dependence as a
    raw monomial expansion ``vmz @ mat`` (ref_utils.py:96-104), which
    catastrophically cancels in float32 for l = 8 (coefficients up to ~2.3e3
    summing to O(1e-2)). We evaluate the *same function* via the stable
    three-term associated-Legendre recurrence instead — required on TPU where
    float64 is unavailable.

    The semi-normalized polynomial A_l^m(z) := P_l^m(z) / (1 - z^2)^{m/2}
    (Condon-Shortley phase included) satisfies:
        A_m^m     = (-1)^m (2m-1)!!
        A_{m+1}^m = z (2m+1) A_m^m
        A_l^m     = ((2l-1) z A_{l-1}^m - (l+m-1) A_{l-2}^m) / (l - m)
    and since (x+iy)^m = r^m e^{im phi} with r^m = (1-z^2)^{m/2} on the unit
    sphere, the harmonic is  N_l^m * A_l^m(z) * (x+iy)^m, matching the
    reference's  (x+iy)^m * (vmz @ mat)  exactly (up to float32 rounding).

    Args:
      xyz:       [..., 3] unit directions.
      kappa_inv: [..., 1] reciprocal vMF concentration (roughness).
      deg_view:  number of octave levels (reference default 4).
    Returns:
      [..., 2*M] with (real, imag) interleaved per harmonic — matches torch
      ``view_as_real(...).reshape(..., -1)`` ordering.
    """
    ml_np, _ = integrated_dir_enc_coeffs(deg_view)
    l_max = int(2 ** (deg_view - 1))

    x = xyz[..., 0:1]
    y = xyz[..., 1:2]
    z = xyz[..., 2]

    # (x + iy)^m by repeated complex multiply in real arithmetic (exact, no
    # pow/atan2): cm_re[m], cm_im[m] for m = 0..l_max.
    cm_re = [jnp.ones_like(z)]
    cm_im = [jnp.zeros_like(z)]
    xs, ys = x[..., 0], y[..., 0]
    for _ in range(l_max):
        pr, pi = cm_re[-1], cm_im[-1]
        cm_re.append(pr * xs - pi * ys)
        cm_im.append(pr * ys + pi * xs)

    # Associated-Legendre recurrence table A[l][m].
    a: dict = {}
    dfact = 1.0  # (2m-1)!!
    for m in range(l_max + 1):
        sign = -1.0 if (m % 2) else 1.0
        a[(m, m)] = jnp.full_like(z, sign * dfact)
        dfact *= 2 * m + 1
        if m + 1 <= l_max:
            a[(m + 1, m)] = z * (2 * m + 1) * a[(m, m)]
        for l in range(m + 2, l_max + 1):
            a[(l, m)] = ((2 * l - 1) * z * a[(l - 1, m)] - (l + m - 1) * a[(l - 2, m)]) / (
                l - m
            )

    res, ims, sigmas = [], [], []
    for m, l in ml_np.T:
        m, l = int(m), int(l)
        n_lm = math.sqrt(
            (2.0 * l + 1.0)
            * math.factorial(l - m)
            / (4.0 * math.pi * math.factorial(l + m))
        )
        base = n_lm * a[(l, m)]
        res.append(base * cm_re[m])
        ims.append(base * cm_im[m])
        sigmas.append(0.5 * l * (l + 1.0))

    sph_re = jnp.stack(res, axis=-1)
    sph_im = jnp.stack(ims, axis=-1)
    atten = jnp.exp(-jnp.asarray(sigmas, dtype=xyz.dtype) * kappa_inv)

    out = jnp.stack([sph_re * atten, sph_im * atten], axis=-1)
    return out.reshape(out.shape[:-2] + (-1,))
