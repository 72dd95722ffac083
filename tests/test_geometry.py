"""Parity tests: ray/camera geometry vs reference ray_utils."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.ref_loader import import_reference, load_ref_module

REF = import_reference()
pytestmark = pytest.mark.skipif(REF is None, reason="reference repo not mounted")

from iffnerf_tpu.geometry import (  # noqa: E402
    get_ray_directions,
    get_ray_directions_blender,
    get_ray_directions_Ks,
    get_rays,
    get_rays_simple,
    get_rays_from_parameters,
    ndc_rays_blender,
    sample_pdf,
)

RNG = np.random.default_rng(3)


def random_c2w():
    # random rotation via QR + random translation
    q, _ = np.linalg.qr(RNG.standard_normal((3, 3)))
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = q.astype(np.float32)
    c2w[:3, 3] = RNG.standard_normal(3).astype(np.float32) * 4
    return c2w


def test_ray_directions_Ks_and_radii_parity():
    import ray_utils as ref_ray_utils

    H, W = 12, 17
    K = np.array(
        [[[120.0, 0.0, W / 2], [0.0, 115.0, H / 2], [0.0, 0.0, 1.0]]],
        dtype=np.float32,
    )
    dirs, dx, dy = get_ray_directions_Ks(H, W, jnp.asarray(K))
    ref_dirs, ref_dx, ref_dy = ref_ray_utils.get_ray_directions_Ks(
        H, W, torch.from_numpy(K)
    )
    np.testing.assert_allclose(np.asarray(dirs), ref_dirs.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dx), ref_dx.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dy), ref_dy.numpy(), rtol=1e-4, atol=1e-6)

    c2w = random_c2w()
    o, d, radii = get_rays(dirs[0], jnp.asarray(c2w), dx=dx[0], dy=dy[0])
    ref_o, ref_d, ref_radii = ref_ray_utils.get_rays(
        ref_dirs[0], torch.from_numpy(c2w), dx=ref_dx[0], dy=ref_dy[0]
    )
    np.testing.assert_allclose(np.asarray(o), ref_o.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), ref_d.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(radii), ref_radii.numpy(), rtol=1e-3, atol=1e-6
    )

    # one-call variant
    o2, d2, r2 = get_rays_from_parameters(H, W, jnp.asarray(K), jnp.asarray(c2w))
    np.testing.assert_allclose(np.asarray(o2), ref_o.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), ref_d.numpy(), rtol=1e-4, atol=1e-5)


def test_loader_directions_parity():
    ref_dl = load_ref_module("dataLoader/ray_utils.py", "ref_dl_ray_utils")

    H, W = 9, 13
    focal = (101.0, 99.0)
    ours = np.asarray(get_ray_directions(H, W, focal))
    ref = ref_dl.get_ray_directions(H, W, focal).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    ours_b = np.asarray(get_ray_directions_blender(H, W, focal))
    ref_b = ref_dl.get_ray_directions_blender(H, W, focal).numpy()
    np.testing.assert_allclose(ours_b, ref_b, rtol=1e-5, atol=1e-6)

    c2w = random_c2w()
    o, d = get_rays_simple(jnp.asarray(ours_b), jnp.asarray(c2w))
    ref_o, ref_d = ref_dl.get_rays(torch.from_numpy(ref_b), torch.from_numpy(c2w))
    np.testing.assert_allclose(np.asarray(o), ref_o.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), ref_d.numpy(), rtol=1e-4, atol=1e-5)


def test_ndc_parity():
    ref_dl = load_ref_module("dataLoader/ray_utils.py", "ref_dl_ray_utils")

    n = 64
    rays_o = RNG.standard_normal((n, 3)).astype(np.float32)
    rays_d = RNG.standard_normal((n, 3)).astype(np.float32)
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5  # forward-facing
    rays_o[:, 2] = -np.abs(rays_o[:, 2]) - 3.0

    o, d = ndc_rays_blender(10, 14, 100.0, 1.0, jnp.asarray(rays_o), jnp.asarray(rays_d))
    ref_o, ref_d = ref_dl.ndc_rays_blender(
        10, 14, 100.0, 1.0, torch.from_numpy(rays_o), torch.from_numpy(rays_d)
    )
    np.testing.assert_allclose(np.asarray(o), ref_o.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), ref_d.numpy(), rtol=1e-4, atol=1e-5)


def test_sample_pdf_det_parity():
    ref_dl = load_ref_module("dataLoader/ray_utils.py", "ref_dl_ray_utils")

    n_rays, n_bins = 8, 16
    bins = np.sort(RNG.uniform(0, 6, (n_rays, n_bins)).astype(np.float32), -1)
    weights = np.abs(RNG.standard_normal((n_rays, n_bins - 1))).astype(np.float32)

    ours = np.asarray(
        sample_pdf(jax.random.PRNGKey(0), jnp.asarray(bins), jnp.asarray(weights),
                   12, det=True)
    )
    ref = ref_dl.sample_pdf(
        torch.from_numpy(bins), torch.from_numpy(weights), 12, det=True
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_get_rays_lie_matches_get_rays_and_differentiates():
    """get_rays_lie (explicit R, t — the reference's kornia-Se3 variant,
    ray_utils.py:103-145) must agree with get_rays on the equivalent c2w
    and stay differentiable w.r.t. the pose for refinement paths."""
    from iffnerf_tpu.geometry import get_rays_lie

    h, w = 6, 8
    K = np.array([[[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]]],
                 np.float32)
    dirs, dx, dy = get_ray_directions_Ks(h, w, jnp.asarray(K))
    dirs, dx, dy = dirs[0], dx[0], dy[0]
    viewdirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    th = 0.4
    R = jnp.asarray(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
         [0, 0, 1.0]], jnp.float32,
    )
    t = jnp.asarray([0.3, -1.0, 4.0])
    c2w = jnp.concatenate(
        [jnp.concatenate([R, t[:, None]], -1),
         jnp.asarray([[0, 0, 0, 1.0]])], 0,
    )

    o1, d1, r1 = get_rays(viewdirs, c2w, directions=dirs, dx=dx, dy=dy)
    o2, d2, r2 = get_rays_lie(viewdirs, R, t, directions=dirs, dx=dx, dy=dy)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)

    def loss(t):
        o, d, _ = get_rays_lie(viewdirs, R, t, directions=dirs, dx=dx, dy=dy)
        return jnp.sum(o) + jnp.sum(d)

    g = jax.grad(loss)(t)
    assert np.all(np.isfinite(np.asarray(g))) and float(jnp.abs(g).sum()) > 0
