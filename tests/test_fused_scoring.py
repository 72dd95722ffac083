"""Fused Pallas ray-scoring parity vs the XLA path (interpret mode on CPU).

The fused kernel (ops/fused_ray_attention.py) must reproduce
`run_attention`'s scores — same ray MLP, k-projection, logits scale, and
softmax-over-rays column sums — to f32 reduction-order tolerance, and
`estimate_pose_single(fused_scoring=True)` must pick the same top-k rays
and pose."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iffnerf_tpu.pose.id_module import (
    IDConfig,
    image_queries,
    init_id_module,
    ray_mlp_inputs,
    run_attention,
)
from iffnerf_tpu.pose.solve import (
    _fused_tile,
    estimate_pose_single,
)
from iffnerf_tpu.pose.vit import ViTConfig
from iffnerf_tpu.ops.fused_ray_attention import fused_ray_scores


@pytest.fixture(scope="module")
def setup():
    cfg = IDConfig(backbone=ViTConfig(depth=1))
    key = jax.random.PRNGKey(11)
    params = init_id_module(key, cfg)
    ks = jax.random.split(key, 5)
    img = jax.random.uniform(ks[0], (96, 96, 3))
    mask = jax.random.uniform(ks[1], (96, 96)) > 0.3
    n = 4096
    rays_ori = jax.random.uniform(ks[2], (n, 3), minval=-1, maxval=1)
    d = jax.random.normal(ks[3], (n, 3))
    rays_dirs = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays_rgb = jax.random.uniform(ks[4], (n, 3))
    return cfg, params, img, mask, rays_ori, rays_dirs, rays_rgb


def test_fused_tile_picker():
    assert _fused_tile(540000) == 2160
    assert _fused_tile(4096) == 2048
    assert _fused_tile(1000) == 1000  # 125 * 8
    assert _fused_tile(1001) is None  # odd, no multiple-of-8 divisor


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_fused_scores_match_xla(setup, dtype):
    cfg, params, img, mask, ro, rd, rr = setup
    cfg = dataclasses.replace(cfg, compute_dtype=dtype)
    scores_ref, _, patch_valid, _ = run_attention(
        params, cfg, img, mask, ro, rd, rr
    )
    q, pv, _ = image_queries(params, cfg, img, mask)
    x = ray_mlp_inputs(cfg, ro, rd, rr)
    scores_fused = fused_ray_scores(
        params, q, pv, x, tile=512, interpret=True
    )
    assert scores_fused.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(pv), np.asarray(patch_valid))
    tol = 1e-5 if dtype == "float32" else 2e-3
    np.testing.assert_allclose(
        np.asarray(scores_fused), np.asarray(scores_ref),
        rtol=tol, atol=tol,
    )


def test_estimate_pose_fused_matches(setup):
    cfg, params, img, mask, ro, rd, rr = setup
    up = jnp.asarray([0.0, 0.0, 1.0])
    c2w_a, scores_a, idx_a, w_a = estimate_pose_single(
        params, cfg, img, mask, ro, rd, rr, up, k=50
    )
    cfg_f = dataclasses.replace(cfg, fused_scoring=True)
    c2w_b, scores_b, idx_b, w_b = estimate_pose_single(
        params, cfg_f, img, mask, ro, rd, rr, up, k=50
    )
    np.testing.assert_allclose(np.asarray(scores_b), np.asarray(scores_a),
                               rtol=1e-5, atol=1e-5)
    # identical top-k membership (ordering ties allowed), same pose
    assert set(np.asarray(idx_b).tolist()) == set(np.asarray(idx_a).tolist())
    np.testing.assert_allclose(np.asarray(c2w_b), np.asarray(c2w_a),
                               rtol=1e-4, atol=1e-4)


def test_fused_falls_back_without_tile(setup):
    """A ray count with no multiple-of-8 divisor silently uses the XLA
    path — same scores, no error."""
    cfg, params, img, mask, ro, rd, rr = setup
    n = 1001
    cfg_f = dataclasses.replace(cfg, fused_scoring=True)
    up = jnp.asarray([0.0, 0.0, 1.0])
    c2w_a, scores_a, _, _ = estimate_pose_single(
        params, cfg, img, mask, ro[:n], rd[:n], rr[:n], up, k=20
    )
    c2w_b, scores_b, _, _ = estimate_pose_single(
        params, cfg_f, img, mask, ro[:n], rd[:n], rr[:n], up, k=20
    )
    np.testing.assert_allclose(np.asarray(scores_b), np.asarray(scores_a),
                               rtol=1e-6, atol=1e-6)
