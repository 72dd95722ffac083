"""Image/mask preprocessing parity vs a PIL oracle.

The reference preprocesses query images with torchvision
``Resize(256, BICUBIC, antialias=True)`` -> ``CenterCrop(224)`` ->
ImageNet normalize, and masks with the BILINEAR analogue plus a second
resize to the ViT patch grid and a 0.1 threshold
(reference pose_estimation/identification_module.py:36-61,130-140).
With pretrained DINOv2 weights, any resize mismatch silently shifts every
patch feature, so this is the last link of the accuracy chain that is
testable without network access: PIL's convolution resampling is the
de-facto oracle torchvision's ``antialias=True`` was built to match.

The oracle below re-implements the full torchvision chain with PIL
(mode-"F" per-channel resize), including the two sharp edges:
- short-side resize TRUNCATES the long side (``int(size*long/short)``);
- ``CenterCrop`` origin is ``int(round((n-crop)/2.0))`` (banker's round).
"""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from iffnerf_tpu.pose.id_module import (
    IDConfig,
    IMAGENET_MEAN,
    IMAGENET_STD,
    preprocess_image,
    preprocess_mask,
)


def _tv_resize_shape(h, w, size):
    if h <= w:
        return size, int(size * w / h)
    return int(size * h / w), size


def _pil_resize(arr, nh, nw, method):
    """Per-channel PIL mode-F resize (PIL resampling is antialiased)."""
    if arr.ndim == 2:
        return np.asarray(
            Image.fromarray(arr, mode="F").resize((nw, nh), method)
        )
    return np.stack(
        [
            np.asarray(
                Image.fromarray(arr[..., c], mode="F").resize(
                    (nw, nh), method
                )
            )
            for c in range(arr.shape[-1])
        ],
        axis=-1,
    )


def _center_crop(arr, crop):
    h, w = arr.shape[:2]
    top = int(round((h - crop) / 2.0))
    left = int(round((w - crop) / 2.0))
    return arr[top:top + crop, left:left + crop]


def _oracle_image(img, cfg):
    nh, nw = _tv_resize_shape(*img.shape[:2], cfg.resize_size)
    out = _pil_resize(img, nh, nw, Image.BICUBIC)
    out = _center_crop(out, cfg.crop_size)
    return (out - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
        IMAGENET_STD, np.float32
    )


def _oracle_mask(mask, cfg):
    m = mask.astype(np.float32)
    nh, nw = _tv_resize_shape(*m.shape[:2], cfg.resize_size)
    m = _pil_resize(m, nh, nw, Image.BILINEAR)
    m = _center_crop(m, cfg.crop_size)
    g = cfg.backbone.grid
    m = _pil_resize(m, g, g, Image.BILINEAR)
    return m  # float patch coverage BEFORE the 0.1 threshold


# non-trivial shapes: square 800 (blender), landscape, portrait, and a
# truncation-vs-round trap (417x612 -> long side 375, round would give 376)
SHAPES = [(800, 800), (333, 517), (612, 417), (417, 612)]


@pytest.mark.parametrize("hw", SHAPES)
def test_preprocess_image_matches_pil(hw):
    rng = np.random.default_rng(hash(hw) % 2**32)
    img = rng.random((*hw, 3), dtype=np.float32)
    got = np.asarray(preprocess_image(IDConfig(), jnp.asarray(img)))
    want = _oracle_image(img, IDConfig())
    assert got.shape == want.shape == (224, 224, 3)
    # normalize divides by std ~0.22 so 3e-5 resample error becomes ~2e-4
    assert np.abs(got - want).max() < 1e-3


@pytest.mark.parametrize("hw", SHAPES)
def test_preprocess_mask_matches_pil(hw):
    rng = np.random.default_rng(hash(hw) % 2**32 + 1)
    # smooth-ish blob mask so the 0.1 threshold isn't knife-edge everywhere
    yy, xx = np.mgrid[0 : hw[0], 0 : hw[1]]
    cy, cx = hw[0] / 2 + 30, hw[1] / 2 - 40
    blob = ((yy - cy) ** 2 / (hw[0] / 4) ** 2 + (xx - cx) ** 2 / (hw[1] / 4) ** 2) < 1.0
    cfg = IDConfig()
    got = np.asarray(preprocess_mask(cfg, jnp.asarray(blob)))
    cov = _oracle_mask(blob, cfg)
    want = (cov > cfg.mask_threshold).reshape(-1)
    g = cfg.backbone.grid
    assert got.shape == want.shape == (g * g,)
    # patches whose coverage sits within resample tolerance of the 0.1
    # threshold may legitimately flip; everything else must agree exactly
    decided = np.abs(cov.reshape(-1) - cfg.mask_threshold) > 1e-3
    assert np.array_equal(got[decided], want[decided])
    assert decided.mean() > 0.95  # the tolerance band must stay tiny


def test_parity_test_catches_no_antialias():
    """Sensitivity: a non-antialiased bicubic resize must FAIL the image
    tolerance — proves the oracle comparison actually constrains the
    implementation."""
    rng = np.random.default_rng(7)
    img = rng.random((333, 517, 3), dtype=np.float32)
    cfg = IDConfig()
    nh, nw = _tv_resize_shape(333, 517, cfg.resize_size)
    bad = jax.image.resize(
        jnp.asarray(img), (nh, nw, 3), "cubic", antialias=False
    )
    bad = np.asarray(bad)
    bad = _center_crop(bad, cfg.crop_size)
    bad = (bad - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
        IMAGENET_STD, np.float32
    )
    want = _oracle_image(img, cfg)
    assert np.abs(bad - want).max() > 0.1


def test_parity_test_catches_round_vs_truncate():
    """Sensitivity: the 417x612 shape resizes to a 375-wide long side under
    torchvision truncation; rounding would give 376 and a shifted crop."""
    nh, nw = _tv_resize_shape(417, 612, 256)
    assert (nh, nw) == (256, 375)
    assert int(round(256 * 612 / 417)) == 376  # the trap this guards
