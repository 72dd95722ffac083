"""Unit/parity tests for encodings, SH, IDE, sRGB, resize, ray-march math."""

import math

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from iffnerf_tpu.ops import (
    eval_sh_bases,
    exclusive_transmittance,
    integrated_dir_enc,
    linear_to_srgb,
    positional_encoding,
    raw2alpha,
    resize_bilinear_ac,
    resize_linear_ac,
    srgb_to_linear,
)
from iffnerf_tpu.ops.ide import ide_output_dim

RNG = np.random.default_rng(1)


def _torch_pe(positions, freqs):
    freq_bands = (2 ** torch.arange(freqs).float())
    pts = (positions[..., None] * freq_bands).reshape(
        positions.shape[:-1] + (freqs * positions.shape[-1],)
    )
    return torch.cat([torch.sin(pts), torch.cos(pts)], dim=-1)


def test_positional_encoding_matches_reference():
    x = RNG.standard_normal((7, 3)).astype(np.float32)
    ours = np.asarray(positional_encoding(jnp.asarray(x), 6))
    ref = _torch_pe(torch.from_numpy(x), 6).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_raw2alpha_matches_reference_semantics():
    sigma = np.abs(RNG.standard_normal((5, 11))).astype(np.float32)
    dist = np.full((5, 11), 0.02, dtype=np.float32)

    alpha, weights, bg = (np.asarray(a) for a in raw2alpha(jnp.asarray(sigma), jnp.asarray(dist)))

    t_alpha = 1.0 - np.exp(-sigma * dist)
    T = np.cumprod(
        np.concatenate([np.ones((5, 1), np.float32), 1.0 - t_alpha + 1e-10], -1), -1
    )
    np.testing.assert_allclose(alpha, t_alpha, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(weights, t_alpha * T[:, :-1], rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(bg, T[:, -1:], rtol=1e-3, atol=1e-5)
    # weights + background transmittance account for all probability mass
    np.testing.assert_allclose(weights.sum(-1) + bg[:, 0], 1.0, atol=1e-4)


def test_exclusive_transmittance_shape():
    a = jnp.zeros((3, 4))
    t = exclusive_transmittance(a)
    assert t.shape == (3, 5)
    np.testing.assert_allclose(np.asarray(t), 1.0, atol=1e-8)


def test_sh_bases_deg2_known_values():
    dirs = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]], dtype=np.float32)
    out = np.asarray(eval_sh_bases(2, jnp.asarray(dirs)))
    assert out.shape == (2, 9)
    np.testing.assert_allclose(out[0, 0], 0.28209479, rtol=1e-6)
    np.testing.assert_allclose(out[0, 2], 0.4886025119, rtol=1e-6)  # C1*z
    np.testing.assert_allclose(out[1, 3], -0.4886025119, rtol=1e-6)  # -C1*x
    # m=0, l=2 at z=1: C2[2]*(2zz-xx-yy)=2*0.31539157
    np.testing.assert_allclose(out[0, 6], 2 * 0.31539156525252005, rtol=1e-6)


def _torch_ide(deg_view, xyz, kappa_inv):
    """Direct translation of reference IntegratedDirEnc for testing."""
    ml_list = []
    for i in range(deg_view):
        l = 2**i
        for m in range(l + 1):
            ml_list.append((m, l))
    ml_array = torch.tensor(ml_list).T
    l_max = 2 ** (deg_view - 1)

    def gbc(a, k):
        return torch.prod(a - torch.arange(k)) / math.factorial(k)

    def alc(l, m, k):
        return (
            (-1) ** m
            * 2**l
            * math.factorial(l)
            / math.factorial(k)
            / math.factorial(l - k - m)
            * gbc(torch.tensor(0.5 * (l + k + m - 1.0)), l)
        )

    def shc(l, m, k):
        return (
            math.sqrt(
                (2.0 * l + 1.0)
                * math.factorial(l - m)
                / (4.0 * math.pi * math.factorial(l + m))
            )
            * alc(l, m, k)
        )

    mat = torch.zeros((l_max + 1, ml_array.shape[1]), dtype=xyz.dtype)
    for i, (m, l) in enumerate(ml_array.T):
        for k in range(l - m + 1):
            mat[k, i] = shc(int(l), int(m), k)

    x, y, z = xyz[..., 0:1], xyz[..., 1:2], xyz[..., 2:3]
    vmz = torch.pow(z, torch.arange(mat.shape[0], dtype=z.dtype)[None, :])
    vmxy = torch.pow((x + 1j * y), ml_array[0, :])
    sph = vmxy * torch.matmul(vmz, mat)
    sigma = 0.5 * ml_array[1, :] * (ml_array[1, :] + 1)
    ide = sph * torch.exp(-sigma * kappa_inv)
    return torch.view_as_real(ide).reshape(xyz.shape[0], -1)


@pytest.mark.parametrize("deg_view", [2, 4])
def test_ide_matches_reference(deg_view):
    n = 64
    d = RNG.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    kappa_inv = np.abs(RNG.standard_normal((n, 1))).astype(np.float32) * 0.3

    ours = np.asarray(integrated_dir_enc(jnp.asarray(d), jnp.asarray(kappa_inv), deg_view))
    # float64 reference: the reference's monomial formulation catastrophically
    # cancels in float32 for l=8, so the ground truth is its f64 evaluation
    # (our recurrence-based f32 evaluation is closer to it than the f32
    # reference itself is).
    ref = (
        _torch_ide(
            deg_view,
            torch.from_numpy(d).double(),
            torch.from_numpy(kappa_inv).double(),
        )
        .float()
        .numpy()
    )
    assert ours.shape[-1] == ide_output_dim(deg_view)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_srgb_roundtrip_and_reference_values():
    x = np.linspace(0.0, 1.0, 101).astype(np.float32)
    s = np.asarray(linear_to_srgb(jnp.asarray(x)))
    back = np.asarray(srgb_to_linear(jnp.asarray(s)))
    np.testing.assert_allclose(back, x, atol=2e-5)
    # known anchor points
    np.testing.assert_allclose(
        np.asarray(linear_to_srgb(jnp.asarray(np.float32(0.0031308)))), 0.04045, atol=1e-4
    )


def test_resize_matches_torch_interpolate():
    import torch.nn.functional as F

    H, W, C = 13, 9, 5
    x = RNG.standard_normal((H, W, C)).astype(np.float32)
    ours = np.asarray(resize_bilinear_ac(jnp.asarray(x), 29, 17))
    ref = (
        F.interpolate(
            torch.from_numpy(x).permute(2, 0, 1)[None],
            size=(29, 17),
            mode="bilinear",
            align_corners=True,
        )[0]
        .permute(1, 2, 0)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    # line resize (the reference's F.interpolate size=(L,1) case)
    L2 = 41
    line = RNG.standard_normal((L2, C)).astype(np.float32)
    ours1 = np.asarray(resize_linear_ac(jnp.asarray(line), 77, axis=0))
    ref1 = (
        F.interpolate(
            torch.from_numpy(line).T[None, :, :, None],
            size=(77, 1),
            mode="bilinear",
            align_corners=True,
        )[0, :, :, 0]
        .T.numpy()
    )
    np.testing.assert_allclose(ours1, ref1, rtol=1e-5, atol=1e-5)
