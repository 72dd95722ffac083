"""Grouped bit-row occupancy gate vs the trilerp > 0 reference.

The gate (ops/packed_sample.py::occupancy_grouped) must reproduce
``sample_alpha(mask, xyz) > 0`` EXACTLY for every sample, for every window
and every group size that satisfies the spacing bound — including
out-of-grid samples (zeros padding), exact-integer coordinates (frac == 0
drops a texel), negative floors, and groups padded past the sample count.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iffnerf_tpu.models.field import (
    AlphaMask,
    FieldConfig,
    gate_group_for,
    make_alpha_mask,
    sample_alpha,
    sample_alpha_gate,
)
from iffnerf_tpu.ops.packed_sample import occupancy_grouped, pack_volume_bits


def _random_mask(rng, shape, aabb, p=0.4, bits_window=4):
    vol = (rng.random(shape) < p).astype(np.float32)
    return make_alpha_mask(jnp.asarray(vol), np.asarray(aabb, np.float32),
                           bits_window=bits_window), vol


def _ray_grid(rng, n_rays, n_samples, step, aabb, spread=2.5):
    """Ray-structured world points: consecutive samples exactly ``step``
    apart along unit-bounded per-axis directions (|d_a| <= 1), origins
    spread beyond the AABB so many samples fall outside the grid."""
    lo, hi = np.asarray(aabb[0]), np.asarray(aabb[1])
    center = (lo + hi) / 2
    span = hi - lo
    origins = center + (rng.random((n_rays, 3)) - 0.5) * span * spread
    dirs = rng.uniform(-1.0, 1.0, (n_rays, 3)).astype(np.float32)
    t = np.arange(n_samples, dtype=np.float32) * step
    xyz = origins[:, None, :] + dirs[:, None, :] * t[None, :, None]
    return jnp.asarray(xyz.astype(np.float32))


@pytest.mark.parametrize("window", [3, 4, 5])
def test_pack_volume_bits_bruteforce(window):
    rng = np.random.default_rng(0)
    vol = (rng.random((5, 4, 6)) < 0.5).astype(np.float32)
    packed = np.asarray(pack_volume_bits(jnp.asarray(vol), window))
    d, h, w = vol.shape
    lanes = (window**3 + 31) // 32
    assert packed.shape == (d * h * w, lanes)
    for v in range(d * h * w):
        z, y, x = v // (h * w), (v // w) % h, v % w
        for dz in range(window):
            for dy in range(window):
                for dx in range(window):
                    idx = (dz * window + dy) * window + dx
                    bit = (packed[v, idx // 32] >> (idx % 32)) & 1
                    want = vol[min(z + dz, d - 1), min(y + dy, h - 1),
                               min(x + dx, w - 1)] > 0
                    assert bool(bit) == bool(want), (v, dz, dy, dx)


@pytest.mark.parametrize("window,group", [(3, 1), (3, 2), (4, 1), (4, 3),
                                          (4, 5), (5, 7)])
def test_gate_matches_trilerp_on_rays(window, group):
    rng = np.random.default_rng(window * 10 + group)
    aabb = [[-1.2, -0.9, -1.5], [1.1, 1.4, 0.8]]
    mask, _ = _random_mask(rng, (13, 17, 11), aabb, bits_window=window)
    # spacing bound: (group-1) * step/unit_min <= window - 2
    units = (np.asarray(aabb[1]) - np.asarray(aabb[0])) / (
        np.array([11, 17, 13]) - 1.0
    )
    step = float(units.min()) * ((window - 2) / max(group - 1, 1)) * 0.95
    xyz = _ray_grid(rng, 64, 33, step, aabb)  # 33 % group != 0 exercises pad

    want = np.asarray(sample_alpha(mask, xyz) > 0)
    got = np.asarray(sample_alpha_gate(mask, xyz, group))
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_gate_exact_integer_coords():
    """Samples exactly on voxel centers/corners: frac == 0 must drop the
    +1 texel exactly as the trilerp's zero weight does."""
    rng = np.random.default_rng(3)
    aabb = [[0.0, 0.0, 0.0], [8.0, 6.0, 10.0]]
    mask, _ = _random_mask(rng, (11, 7, 9), aabb, bits_window=4)
    # voxel-lattice-aligned marches, incl. along the boundary planes
    units = np.asarray(aabb[1]) / (np.array([9, 7, 11]) - 1.0)
    pts = []
    for ox, oy, oz in [(0, 0, 0), (8, 0, 0), (0, 6, 10), (4, 3, 5)]:
        o = np.array([ox, oy, oz], np.float32)
        d = np.array([1.0, 0.0, -1.0], np.float32)
        t = np.arange(12, dtype=np.float32) * float(units.min())
        pts.append(o[None] + d[None] * t[:, None])
    xyz = jnp.asarray(np.stack(pts))
    want = np.asarray(sample_alpha(mask, xyz) > 0)
    got = np.asarray(sample_alpha_gate(mask, xyz, 3))
    np.testing.assert_array_equal(got, want)


def test_gate_all_outside():
    rng = np.random.default_rng(4)
    aabb = [[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]]
    mask, _ = _random_mask(rng, (8, 8, 8), aabb, p=1.0, bits_window=4)
    xyz = jnp.asarray(rng.uniform(5.0, 9.0, (4, 10, 3)).astype(np.float32))
    got = np.asarray(sample_alpha_gate(mask, xyz, 2))
    assert not got.any()


def test_gate_group_for_bounds():
    # delta = step/unit = 0.5: window 4 nominally allows (4-2)/0.5 = 4
    # extra samples, but the exact boundary is surrendered to the float
    # rounding margin -> g=4 (a strictly smaller delta recovers 5)
    g = gate_group_for((16, 16, 16), [[-1, -1, -1], [1, 1, 1]],
                       step_size=2.0 / 15 * 0.5, window=4)
    assert g == 4
    g = gate_group_for((16, 16, 16), [[-1, -1, -1], [1, 1, 1]],
                       step_size=2.0 / 15 * 0.45, window=4)
    assert g == 5
    # coarse step (delta > window-2): grouping impossible -> 1
    g = gate_group_for((4, 4, 4), [[-1, -1, -1], [1, 1, 1]],
                       step_size=10.0, window=4)
    assert g == 1
    # cap respected
    g = gate_group_for((512, 512, 512), [[-1, -1, -1], [1, 1, 1]],
                       step_size=1e-4, window=5, cap=8)
    assert g == 8
    assert gate_group_for((16,) * 3, [[-1] * 3, [1] * 3], 0.1, window=0) == 1


def test_render_chunked_autogate_parity():
    """render_chunked derives the gate group from the numpy ray set; its
    output must be bit-identical to the kill-switch (-1) path."""
    from iffnerf_tpu.models.field import init_field
    from iffnerf_tpu.render.renderer import render_chunked

    rng = np.random.default_rng(11)
    config = FieldConfig(
        aabb=((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5)),
        grid_size=(20, 20, 20),
        shading_mode="MLP_Fea",
        step_ratio=0.5,
        fused_eval="off",
    )
    params = init_field(jax.random.PRNGKey(2), config)
    mask, _ = _random_mask(rng, (16, 16, 16), config.aabb, bits_window=4)

    n = 96
    origins = rng.uniform(-3.0, 3.0, (n, 3)).astype(np.float32)
    dirs = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32)
    rays = np.concatenate(
        [origins, dirs, np.full((n, 1), 6.0, np.float32)], -1
    )

    rgb_off, depth_off = render_chunked(
        config.replace(mask_gate_group=-1), params, mask, rays, chunk=32
    )
    rgb_on, depth_on = render_chunked(config, params, mask, rays, chunk=32)
    np.testing.assert_array_equal(np.asarray(rgb_off), np.asarray(rgb_on))
    np.testing.assert_array_equal(np.asarray(depth_off),
                                  np.asarray(depth_on))


def test_render_rays_gate_parity():
    """Full render_rays with the gate on vs off: identical images."""
    from iffnerf_tpu.models.field import init_field
    from iffnerf_tpu.models.render import render_rays

    rng = np.random.default_rng(7)
    config = FieldConfig(
        aabb=((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5)),
        grid_size=(24, 24, 24),
        shading_mode="MLP_Fea",
        step_ratio=0.5,
        fused_eval="off",
    )
    params = init_field(jax.random.PRNGKey(0), config)
    mask, _ = _random_mask(rng, (20, 20, 20), config.aabb, bits_window=4)

    n = 128
    origins = np.tile(np.array([[0.0, 0.0, -4.0]], np.float32), (n, 1))
    dirs = rng.uniform(-0.35, 0.35, (n, 3)).astype(np.float32)
    dirs[:, 2] = 1.0
    rays = jnp.asarray(
        np.concatenate([origins, dirs, np.full((n, 1), 6.0, np.float32)], -1)
    )

    g = gate_group_for(mask.volume.shape, np.asarray(mask.aabb),
                       config.step_size, window=4, dir_bound=1.0)
    assert g > 1
    out_ref = render_rays(config, params, mask, rays, is_train=False)
    out_gate = render_rays(config.replace(mask_gate_group=g), params, mask,
                           rays, is_train=False)
    for a, b in zip(out_ref, out_gate):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
