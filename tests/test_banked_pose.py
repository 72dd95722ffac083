"""Banked pose estimation: precomputed ray keys must reproduce the
unbanked path exactly (same logits graph, bit-identical scores/pose)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iffnerf_tpu.pose.id_module import (
    IDConfig,
    image_queries,
    init_id_module,
    ray_bank,
    run_attention,
    score_rays,
)
from iffnerf_tpu.pose.solve import (
    estimate_pose_single,
    estimate_pose_single_banked,
)
from iffnerf_tpu.pose.vit import ViTConfig


@pytest.fixture(scope="module")
def setup():
    cfg = IDConfig(backbone=ViTConfig(depth=1))
    key = jax.random.PRNGKey(23)
    params = init_id_module(key, cfg)
    ks = jax.random.split(key, 5)
    img = jax.random.uniform(ks[0], (96, 96, 3))
    mask = jax.random.uniform(ks[1], (96, 96)) > 0.3
    n = 2048
    rays_ori = jax.random.uniform(ks[2], (n, 3), minval=-1, maxval=1)
    d = jax.random.normal(ks[3], (n, 3))
    rays_dirs = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays_rgb = jax.random.uniform(ks[4], (n, 3))
    return cfg, params, img, mask, rays_ori, rays_dirs, rays_rgb


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_banked_scores_identical(setup, dtype):
    cfg, params, img, mask, ro, rd, rr = setup
    cfg = dataclasses.replace(cfg, compute_dtype=dtype)
    scores_ref, _, patch_valid, _ = run_attention(
        params, cfg, img, mask, ro, rd, rr
    )
    bank = ray_bank(params, cfg, ro, rd, rr)
    q, pv, _ = image_queries(params, cfg, img, mask)
    scores_banked, _ = score_rays(params, cfg, q, pv, None, None, None,
                                  bank=bank)
    np.testing.assert_array_equal(np.asarray(scores_ref),
                                  np.asarray(scores_banked))


def test_banked_estimate_matches_full(setup):
    cfg, params, img, mask, ro, rd, rr = setup
    c2w_ref, scores_ref, idx_ref, w_ref = estimate_pose_single(
        params, cfg, img, mask, ro, rd, rr,
        jnp.asarray([0.0, 0.0, 1.0]), k=32,
    )
    bank = ray_bank(params, cfg, ro, rd, rr)
    c2w_b, scores_b, idx_b, w_b = estimate_pose_single_banked(
        params, cfg, img, mask, bank, ro, rd,
        jnp.asarray([0.0, 0.0, 1.0]), k=32,
    )
    np.testing.assert_array_equal(np.asarray(scores_ref),
                                  np.asarray(scores_b))
    np.testing.assert_array_equal(np.asarray(idx_ref), np.asarray(idx_b))
    np.testing.assert_array_equal(np.asarray(c2w_ref), np.asarray(c2w_b))


def test_sharded_banked_matches_unbanked_sharded():
    """estimate_pose_single_sharded with a precomputed bank must match its
    own unbanked output exactly (the shard computes identical keys)."""
    from iffnerf_tpu.parallel import make_mesh
    from iffnerf_tpu.pose.solve import estimate_pose_single_sharded

    cfg = IDConfig(backbone=ViTConfig(img_size=28, patch_size=14, dim=32,
                                      depth=1, num_heads=4),
                   resize_size=32, crop_size=28)
    key = jax.random.PRNGKey(5)
    params = init_id_module(key, cfg)
    rng = np.random.default_rng(5)
    n = 1600
    ro = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    d = rng.standard_normal((n, 3)).astype(np.float32)
    rd = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    rr = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    img = jnp.asarray(rng.uniform(0, 1, (48, 48, 3)).astype(np.float32))
    mask = jnp.ones((48, 48), jnp.float32)
    up = jnp.asarray([0.0, 0.0, 1.0])

    mesh = make_mesh()
    c2w1, scores1, idx1, w1 = estimate_pose_single_sharded(
        params, cfg, img, mask, ro, rd, rr, up, mesh=mesh, k=32,
    )
    bank = ray_bank(params, cfg, ro, rd, rr)
    c2w2, scores2, idx2, w2 = estimate_pose_single_sharded(
        params, cfg, img, mask, ro, rd, rr, up, mesh=mesh, k=32, bank=bank,
    )
    np.testing.assert_array_equal(np.asarray(scores1), np.asarray(scores2))
    np.testing.assert_array_equal(np.asarray(idx1), np.asarray(idx2))
    np.testing.assert_array_equal(np.asarray(c2w1), np.asarray(c2w2))


def test_bank_shape_dtype(setup):
    cfg, params, img, mask, ro, rd, rr = setup
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    bank = ray_bank(params, cfg16, ro, rd, rr)
    assert bank.shape == (ro.shape[0], cfg.img_num_features)
    assert bank.dtype == jnp.bfloat16


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_fused_bank_kernel_parity(setup, dtype):
    """The two-pass Pallas banked-scoring kernel (interpret mode on CPU)
    matches the XLA banked scores to f32 reduction-order tolerance, with a
    tile that does NOT divide the softmax statistics trivially (multiple
    online-rescale steps)."""
    from iffnerf_tpu.ops.banked_attention import (
        bank_tile_for,
        banked_scores_fused,
    )

    cfg, params, img, mask, ro, rd, rr = setup
    cfg = dataclasses.replace(cfg, compute_dtype=dtype)
    bank = ray_bank(params, cfg, ro, rd, rr)
    q, pv, _ = image_queries(params, cfg, img, mask)
    scores_ref, _ = score_rays(params, cfg, q, pv, None, None, None,
                               bank=bank)
    tile = bank_tile_for(ro.shape[0], target=512)
    assert tile is not None and ro.shape[0] // tile >= 4
    scores_fused = banked_scores_fused(bank, q, pv, tile=tile,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(scores_fused),
                               np.asarray(scores_ref), rtol=2e-5,
                               atol=2e-6)


def test_fused_bank_config_switch(setup, monkeypatch):
    """fused_bank (the default) routes score_rays' banked call through the
    kernel where Mosaic exists (attention comes back None) and the scores
    still agree; on a CPU backend the dispatch stays on the exact XLA path
    unless IFFNERF_FUSED_BANK=1 forces it (as here, with interpret mode)."""
    cfg, params, img, mask, ro, rd, rr = setup
    import unittest.mock

    assert cfg.fused_bank  # default ON
    bank = ray_bank(params, cfg, ro, rd, rr)
    q, pv, _ = image_queries(params, cfg, img, mask)
    # CPU backend, no env override -> exact XLA path despite fused_bank
    scores_ref, att = score_rays(params, cfg, q, pv, None, None, None,
                                 bank=bank)
    assert att is not None

    # kill switch wins over a TPU-looking env
    monkeypatch.setenv("IFFNERF_FUSED_BANK", "0")
    _, att_off = score_rays(params, cfg, q, pv, None, None, None, bank=bank)
    assert att_off is not None

    # forced ON: CPU has no Mosaic backend, interpret-mode via patch
    monkeypatch.setenv("IFFNERF_FUSED_BANK", "1")
    from iffnerf_tpu.ops import banked_attention as ba

    orig = ba.banked_scores_fused

    def interp(bank, q, pv, *, tile, interpret=False):
        return orig(bank, q, pv, tile=tile, interpret=True)

    with unittest.mock.patch.object(ba, "banked_scores_fused", interp):
        scores_f, att_f = score_rays(params, cfg, q, pv, None, None,
                                     None, bank=bank)
    assert att_f is None
    np.testing.assert_allclose(np.asarray(scores_f), np.asarray(scores_ref),
                               rtol=2e-5, atol=2e-6)

    # fused_bank=False disables regardless of env
    cfg_off = dataclasses.replace(cfg, fused_bank=False)
    _, att2 = score_rays(params, cfg_off, q, pv, None, None, None, bank=bank)
    assert att2 is not None


def test_bank_scoring_bf16_mode(setup, monkeypatch):
    """IFFNERF_BANK_SCORING=bf16 (the TPU default for bf16 compute) emits
    the logits matmul in the compute dtype and folds validity + the
    softmax denominator into a per-patch log-shift (no attention array).
    Scores match the exact path within the documented tolerance (7.2e-5
    measured on v5e for the bf16 dot; the log/exp roundtrip adds ~1e-6)
    and select the same top rays."""
    from iffnerf_tpu.ops.topk import exact_topk

    cfg, params, img, mask, ro, rd, rr = setup
    cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    bank = ray_bank(params, cfg, ro, rd, rr)
    q, pv, _ = image_queries(params, cfg, img, mask)
    monkeypatch.delenv("IFFNERF_FUSED_BANK", raising=False)
    monkeypatch.delenv("IFFNERF_BANK_SCORING", raising=False)
    scores_ref, _ = score_rays(params, cfg, q, pv, None, None, None,
                               bank=bank)  # exact (CPU backend)

    monkeypatch.setenv("IFFNERF_BANK_SCORING", "bf16")
    scores_bf, att = score_rays(params, cfg, q, pv, None, None, None,
                                bank=bank)
    assert att is None  # log-shift formulation never materializes it
    np.testing.assert_allclose(np.asarray(scores_bf), np.asarray(scores_ref),
                               rtol=2e-3, atol=2e-4)
    _, i_r = exact_topk(scores_ref, 32)
    _, i_b = exact_topk(scores_bf, 32)
    assert set(np.asarray(i_r).tolist()) == set(np.asarray(i_b).tolist())


def test_bank_scoring_mode_precedence(setup, monkeypatch):
    """IFFNERF_BANK_SCORING wins over the legacy IFFNERF_FUSED_BANK;
    config.fused_bank=False wins over both; unbanked / sharded calls are
    always exact."""
    from iffnerf_tpu.pose.id_module import _bank_scoring_mode

    cfg, *_ = setup
    monkeypatch.setenv("IFFNERF_FUSED_BANK", "1")
    monkeypatch.setenv("IFFNERF_BANK_SCORING", "exact")
    assert _bank_scoring_mode(cfg) == "exact"
    monkeypatch.delenv("IFFNERF_BANK_SCORING")
    assert _bank_scoring_mode(cfg) == "fused"
    monkeypatch.setenv("IFFNERF_FUSED_BANK", "0")
    assert _bank_scoring_mode(cfg) == "exact"
    monkeypatch.setenv("IFFNERF_BANK_SCORING", "bf16")
    assert _bank_scoring_mode(cfg) == "bf16"
    cfg_off = dataclasses.replace(cfg, fused_bank=False)
    assert _bank_scoring_mode(cfg_off) == "exact"


def test_bank_tile_for():
    from iffnerf_tpu.ops.banked_attention import bank_tile_for

    assert bank_tile_for(20000 * 27) == 5400
    assert 540000 % bank_tile_for(540000) == 0
    assert bank_tile_for(1021) is None  # prime, no multiple-of-8 divisor
