"""Parity tests: ops/grid_sample vs torch.nn.functional.grid_sample
(the reference's core primitive, models/tensoRF.py:229-253)."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from iffnerf_tpu.ops import grid_sample_1d, grid_sample_2d, grid_sample_3d


RNG = np.random.default_rng(0)


def test_grid_sample_2d_matches_torch():
    H, W, C, N = 17, 23, 6, 501
    plane = RNG.standard_normal((H, W, C)).astype(np.float32)
    # include in-range, boundary, and out-of-range coords
    coords = RNG.uniform(-1.3, 1.3, size=(N, 2)).astype(np.float32)
    coords[:5] = [[-1, -1], [1, 1], [0, 0], [-1, 1], [1, -1]]

    ours = np.asarray(grid_sample_2d(jnp.asarray(plane), jnp.asarray(coords)))

    t_plane = torch.from_numpy(plane).permute(2, 0, 1)[None]  # [1,C,H,W]
    t_grid = torch.from_numpy(coords).view(1, N, 1, 2)
    ref = (
        F.grid_sample(t_plane, t_grid, mode="bilinear", align_corners=True)
        .view(C, N)
        .T.numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_1d_matches_torch_line_convention():
    # The reference samples lines as [1,C,L,1] planes at grid (0, y) —
    # equivalent to 1-D linear interpolation along L.
    L, C, N = 31, 4, 257
    line = RNG.standard_normal((L, C)).astype(np.float32)
    coords = RNG.uniform(-1.2, 1.2, size=(N,)).astype(np.float32)

    ours = np.asarray(grid_sample_1d(jnp.asarray(line), jnp.asarray(coords)))

    t_line = torch.from_numpy(line).T.view(1, C, L, 1)
    grid = torch.stack(
        [torch.zeros(N), torch.from_numpy(coords)], dim=-1
    ).view(1, N, 1, 2)
    ref = (
        F.grid_sample(t_line, grid, mode="bilinear", align_corners=True)
        .view(C, N)
        .T.numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_3d_matches_torch():
    D, H, W, N = 9, 11, 13, 301
    vol = RNG.uniform(0, 1, size=(D, H, W)).astype(np.float32)
    coords = RNG.uniform(-1.2, 1.2, size=(N, 3)).astype(np.float32)
    coords[:2] = [[-1, -1, -1], [1, 1, 1]]

    ours = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords)))

    t_vol = torch.from_numpy(vol).view(1, 1, D, H, W)
    t_grid = torch.from_numpy(coords).view(1, N, 1, 1, 3)
    ref = (
        F.grid_sample(t_vol, t_grid, mode="bilinear", align_corners=True)
        .view(N)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_2d_gradients_flow():
    import jax

    H, W, C = 8, 8, 3
    plane = jnp.asarray(RNG.standard_normal((H, W, C)).astype(np.float32))
    coords = jnp.asarray(RNG.uniform(-1, 1, size=(10, 2)).astype(np.float32))

    g = jax.grad(lambda p: jnp.sum(grid_sample_2d(p, coords) ** 2))(plane)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
