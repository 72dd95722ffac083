"""Image quality metrics (reference utils.py:10,42-114).

SSIM follows the mip-NeRF formulation the reference vendors
(utils.py:61-114): separable Gaussian blur (valid mode), clipped variances.
Implemented in jnp so it can run on-device; inputs are small eval images so
host round-trips don't matter.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax.scipy.signal as jsig


def mse2psnr(mse: float) -> float:
    """(reference utils.py:10)"""
    return float(-10.0 * np.log(mse) / np.log(10.0))


def rgb_ssim(img0, img1, max_val: float = 1.0, filter_size: int = 11,
             filter_sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03,
             return_map: bool = False):
    img0 = jnp.asarray(img0)
    img1 = jnp.asarray(img1)
    assert img0.ndim == 3 and img0.shape[-1] == 3 and img0.shape == img1.shape

    hw = filter_size // 2
    shift = (2 * hw - filter_size + 1) / 2
    f_i = ((np.arange(filter_size) - hw + shift) / filter_sigma) ** 2
    filt = np.exp(-0.5 * f_i)
    filt = jnp.asarray(filt / filt.sum(), dtype=img0.dtype)

    def blur(z):
        # separable valid-mode Gaussian blur per channel
        out = []
        for i in range(z.shape[-1]):
            c = jsig.convolve2d(z[..., i], filt[:, None], mode="valid")
            c = jsig.convolve2d(c, filt[None, :], mode="valid")
            out.append(c)
        return jnp.stack(out, axis=-1)

    mu0, mu1 = blur(img0), blur(img1)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    sigma00 = jnp.maximum(0.0, blur(img0 ** 2) - mu00)
    sigma11 = jnp.maximum(0.0, blur(img1 ** 2) - mu11)
    sigma01 = blur(img0 * img1) - mu01
    sigma01 = jnp.sign(sigma01) * jnp.minimum(
        jnp.sqrt(sigma00 * sigma11), jnp.abs(sigma01)
    )

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    ssim_map = ((2 * mu01 + c1) * (2 * sigma01 + c2)) / (
        (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    )
    if return_map:
        return np.asarray(ssim_map)
    return float(jnp.mean(ssim_map))


_LPIPS_CACHE: dict = {}


def rgb_lpips(np_gt: np.ndarray, np_im: np.ndarray, net_name: str = "alex",
              device: str = "cpu") -> float:
    """LPIPS via the optional ``lpips`` torch package (reference
    utils.py:33-48). Raises a clear error when the package or its weights
    are unavailable (this image has no network egress)."""
    try:
        import torch
        import lpips  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment dependent
        raise RuntimeError(
            "LPIPS requires the `lpips` package (and its pretrained weights); "
            "not available in this environment"
        ) from e
    if not hasattr(lpips, "LPIPS"):
        # an importable-but-empty `lpips` (e.g. a test stub in sys.modules)
        raise RuntimeError("`lpips` module present but unusable (no LPIPS)")
    if net_name not in _LPIPS_CACHE:
        _LPIPS_CACHE[net_name] = (
            lpips.LPIPS(net=net_name, version="0.1").eval().to(device)
        )
    gt = torch.from_numpy(np_gt).permute(2, 0, 1).contiguous().to(device)
    im = torch.from_numpy(np_im).permute(2, 0, 1).contiguous().to(device)
    return float(_LPIPS_CACHE[net_name](gt, im, normalize=True).item())
