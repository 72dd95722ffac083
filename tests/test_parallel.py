"""Sharded execution tests on the 8-device virtual CPU mesh (SURVEY.md §5):
mesh-sharded rendering matches single-device output, and the full training
step executes under ray-axis sharding."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iffnerf_tpu.models import FieldConfig, init_field
from iffnerf_tpu.parallel import make_mesh
from iffnerf_tpu.render import render_chunked

RNG = np.random.default_rng(17)


@pytest.fixture(scope="module")
def small_field():
    cfg = FieldConfig(grid_size=(16, 16, 16), density_n_comp=(4, 4, 4),
                      app_n_comp=(8, 8, 8), app_dim=9, shading_mode="Ref",
                      feature_c=16, view_pe=2, fea_pe=2, step_ratio=1.0)
    params = init_field(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _rays(n):
    rays_o = RNG.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = RNG.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return np.concatenate([rays_o, d, 0.01 * np.ones((n, 1), np.float32)], -1)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_render_matches_single(small_field):
    cfg, params = small_field
    rays = _rays(1000)  # non-multiple of 8 exercises padding
    mesh = make_mesh()

    rgb1, depth1 = render_chunked(cfg, params, None, rays, chunk=512,
                                  n_samples=16, white_bg=True)
    rgb2, depth2 = render_chunked(cfg, params, None, rays, chunk=512,
                                  n_samples=16, white_bg=True, mesh=mesh)
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(depth1), np.asarray(depth2),
                               rtol=1e-5, atol=1e-5)


def test_active_ray_compaction_matches_flat(small_field):
    """The eval renderer's AABB-hit compaction + span-bucketed sample
    counts must be exact vs the flat full-length march (miss rays included),
    with and without an alpha mask."""
    from iffnerf_tpu.models.field import make_alpha_mask

    cfg, params = small_field
    rays = _rays(700)  # mix of hits and misses; non-multiple chunk
    vol = (RNG.uniform(0, 1, (9, 9, 9)) < 0.4).astype(np.float32)
    mask = make_alpha_mask(jnp.asarray(vol),
                           np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]]))

    for m in (None, mask):
        rgb1, depth1 = render_chunked(cfg, params, m, rays, chunk=256,
                                      white_bg=True, active_rays=False)
        rgb2, depth2 = render_chunked(cfg, params, m, rays, chunk=256,
                                      white_bg=True)
        np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb2),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(depth1), np.asarray(depth2),
                                   rtol=1e-5, atol=1e-5)


def test_active_ray_compaction_all_miss(small_field):
    """An image where every ray misses the AABB returns pure background
    without touching the field."""
    cfg, params = small_field
    rays_o = np.full((100, 3), 5.0, np.float32)
    rays_d = np.tile(np.array([1.0, 0, 0], np.float32), (100, 1))
    rays = np.concatenate([rays_o, rays_d,
                           0.01 * np.ones((100, 1), np.float32)], -1)
    rgb, depth = render_chunked(cfg, params, None, rays, chunk=64,
                                white_bg=True)
    np.testing.assert_allclose(np.asarray(rgb), 1.0)
    np.testing.assert_allclose(np.asarray(depth), rays[:, -1])


def test_active_ray_compaction_sharded(small_field):
    cfg, params = small_field
    rays = _rays(1000)
    mesh = make_mesh()
    rgb1, depth1 = render_chunked(cfg, params, None, rays, chunk=512,
                                  white_bg=True)
    rgb2, depth2 = render_chunked(cfg, params, None, rays, chunk=512,
                                  white_bg=True, mesh=mesh)
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(depth1), np.asarray(depth2),
                               rtol=1e-5, atol=1e-5)


def test_ray_span_steps_upper_bound(small_field):
    """ray_span_steps must upper-bound the last AABB-valid sample of
    sample_ray's march for every ray — jittered (train) and not — since the
    active-ray renderer truncates each chunk's march at the bucket covering
    this bound and claims exactness vs the full-length march."""
    from iffnerf_tpu.models.render import ray_span_steps, sample_ray

    cfg, _ = small_field
    rays = jnp.asarray(_rays(3000))
    n_samples = 48
    steps = np.asarray(ray_span_steps(cfg, rays, n_samples))
    assert steps.min() >= 0 and steps.max() <= n_samples

    for is_train in (False, True):
        _, _, valid = sample_ray(
            cfg, rays[:, :3], rays[:, 3:6],
            key=jax.random.PRNGKey(3) if is_train else None,
            is_train=is_train, n_samples=n_samples,
        )
        valid = np.asarray(valid[:, :n_samples])
        last_valid = np.where(
            valid.any(axis=1), n_samples - np.argmax(valid[:, ::-1], axis=1),
            0,
        )  # 1-based index of the last valid sample; 0 when none
        assert (steps >= last_valid).all(), (
            f"bound violated on {int((steps < last_valid).sum())} rays"
        )
        # steps == 0 must certify a miss (no valid sample at all)
        assert not valid[steps == 0].any()


def test_sharded_pose_estimate_matches_single():
    """Candidate-ray-sharded scoring + per-shard top-k merge must match the
    single-device estimate (SURVEY.md §5 sharding design)."""
    from iffnerf_tpu.pose import (
        IDConfig, estimate_pose_single, estimate_pose_single_sharded,
        init_id_module,
    )
    from iffnerf_tpu.pose.vit import ViTConfig

    cfg = IDConfig(backbone=ViTConfig(img_size=28, patch_size=14, dim=32,
                                      depth=1, num_heads=4),
                   resize_size=32, crop_size=28)
    params = init_id_module(jax.random.PRNGKey(0), cfg)
    n = 1600  # divisible by the 8-device mesh
    rays_ori = jnp.asarray(RNG.uniform(-1, 1, (n, 3)).astype(np.float32))
    d = RNG.standard_normal((n, 3)).astype(np.float32)
    rays_dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    rays_rgb = jnp.asarray(RNG.uniform(0, 1, (n, 3)).astype(np.float32))
    img = jnp.asarray(RNG.uniform(0, 1, (48, 48, 3)).astype(np.float32))
    mask = jnp.ones((48, 48), jnp.float32)
    up = jnp.asarray([0.0, 0.0, 1.0])

    c2w1, scores1, idx1, w1 = estimate_pose_single(
        params, cfg, img, mask, rays_ori, rays_dirs, rays_rgb, up, k=32
    )
    mesh = make_mesh()
    c2w2, scores2, idx2, w2 = estimate_pose_single_sharded(
        params, cfg, img, mask, rays_ori, rays_dirs, rays_rgb, up,
        mesh=mesh, k=32,
    )
    np.testing.assert_allclose(np.asarray(scores1), np.asarray(scores2),
                               rtol=1e-5, atol=1e-6)
    assert set(np.asarray(idx1).tolist()) == set(np.asarray(idx2).tolist())
    np.testing.assert_allclose(np.asarray(c2w1), np.asarray(c2w2),
                               rtol=1e-4, atol=1e-5)


def test_sharded_id_train_step_matches_single():
    """The ID-module training step runs unmodified with the candidate-ray
    axis sharded (GSPMD propagates the sharding; the softmax-over-rays
    reductions become collectives) and matches the single-device update."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from iffnerf_tpu.pose import IDConfig, init_id_module
    from iffnerf_tpu.pose.trainer import make_id_optimizer, make_id_train_step
    from iffnerf_tpu.pose.vit import ViTConfig

    cfg = IDConfig(backbone=ViTConfig(img_size=28, patch_size=14, dim=32,
                                      depth=1, num_heads=4),
                   resize_size=32, crop_size=28)
    params = init_id_module(jax.random.PRNGKey(1), cfg)
    n = 1600
    rays_ori = jnp.asarray(RNG.uniform(-1, 1, (n, 3)).astype(np.float32))
    d = RNG.standard_normal((n, 3)).astype(np.float32)
    rays_dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    rays_rgb = jnp.asarray(RNG.uniform(0, 1, (n, 3)).astype(np.float32))
    imgs = jnp.asarray(RNG.uniform(0, 1, (2, 40, 40, 3)).astype(np.float32))
    masks = jnp.ones((2, 40, 40), jnp.float32)
    poses = jnp.asarray(
        np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        + 0.01 * RNG.standard_normal((2, 4, 4)).astype(np.float32)
    )

    def run(ro, rd, rr, p):
        tx = make_id_optimizer(p)
        step = make_id_train_step(cfg, tx, accum_steps=2)
        new_p, _, loss = step(p, tx.init(p), imgs, masks, poses,
                              ro, rd, rr)
        return new_p, loss

    p1, loss1 = run(rays_ori, rays_dirs, rays_rgb,
                    jax.tree.map(jnp.copy, params))

    mesh = make_mesh()
    sh = NamedSharding(mesh, P("data"))
    p2, loss2 = run(jax.device_put(rays_ori, sh),
                    jax.device_put(rays_dirs, sh),
                    jax.device_put(rays_rgb, sh),
                    jax.device_put(jax.tree.map(jnp.copy, params),
                                   NamedSharding(mesh, P())))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_dryrun_multichip_trains():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
