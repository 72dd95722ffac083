"""Parity/shape tests for the Identification Module stack: ray preprocessor,
QK attention, image positional encoding, score target/loss, ViT backbone,
and the full jitted pose estimate."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.ref_loader import import_reference, load_ref_module

REF = import_reference()
pytestmark = pytest.mark.skipif(REF is None, reason="reference repo not mounted")

from iffnerf_tpu.pose.id_module import (  # noqa: E402
    IDConfig,
    distance_based_score_loss,
    distance_based_score_target,
    img_position_encoding,
    init_id_module,
    ray_features,
    run_attention,
)
from iffnerf_tpu.pose.solve import estimate_pose_single  # noqa: E402
from iffnerf_tpu.pose.vit import ViTConfig, init_vit, vit_forward_features  # noqa: E402

RNG = np.random.default_rng(5)
CFG = IDConfig()


def _t2j(linear):
    p = {"w": jnp.asarray(linear.weight.detach().numpy().T)}
    if linear.bias is not None:
        p["b"] = jnp.asarray(linear.bias.detach().numpy())
    return p


def test_ray_preprocessor_parity():
    # reference module imports models.tensorBase for positional_encoding
    load_ref_module("models/sh.py", "models.sh")
    ref_rp_mod = load_ref_module(
        "pose_estimation/ray_preprocessor.py", "ref_ray_preprocessor"
    )
    torch.manual_seed(3)
    ref_rp = ref_rp_mod.RayPreprocessor(featureC=256, fea_output=384)

    params = {
        "ray_mlp": [_t2j(ref_rp.mlp[0]), _t2j(ref_rp.mlp[2])],
        "ray_mlp2": [_t2j(ref_rp.mlp2[0]), _t2j(ref_rp.mlp2[2])],
    }
    n = 64
    ori = RNG.standard_normal((n, 3)).astype(np.float32)
    dirs = RNG.standard_normal((n, 3)).astype(np.float32)
    rgb = RNG.uniform(0, 1, (n, 3)).astype(np.float32)

    ours = np.asarray(
        ray_features(params, CFG, jnp.asarray(ori), jnp.asarray(dirs),
                     jnp.asarray(rgb))
    )
    ref = ref_rp(
        torch.from_numpy(ori), torch.from_numpy(dirs), torch.from_numpy(rgb)
    ).detach().numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_attention_scores_parity():
    ref_mha_mod = load_ref_module(
        "pose_estimation/multihead_attention.py", "ref_mha"
    )
    torch.manual_seed(4)
    ref_mha = ref_mha_mod.MultiHeadAttention(384, 398, 384, 1)

    p, r = 17, 333
    img_fea = RNG.standard_normal((p, 398)).astype(np.float32)
    ray_fea = RNG.standard_normal((r, 384)).astype(np.float32)

    import math

    q = img_fea @ np.asarray(ref_mha.q_proj.weight.detach().numpy().T) + \
        ref_mha.q_proj.bias.detach().numpy()
    del q  # parity is checked through the module below

    ref_attn = ref_mha(
        torch.from_numpy(img_fea), torch.from_numpy(ray_fea)
    ).detach().numpy()

    params = {"q_proj": _t2j(ref_mha.q_proj), "k_proj": _t2j(ref_mha.k_proj)}
    q = jnp.asarray(img_fea) @ params["q_proj"]["w"] + params["q_proj"]["b"]
    k = jnp.asarray(ray_fea) @ params["k_proj"]["w"] + params["k_proj"]["b"]
    ours = np.asarray(
        jax.nn.softmax((q @ k.T) / math.sqrt(384), axis=-1)
    )
    np.testing.assert_allclose(ours, ref_attn, rtol=1e-3, atol=1e-6)


def test_img_position_encoding_parity():
    load_ref_module("models/sh.py", "models.sh")
    pe = np.asarray(img_position_encoding(CFG))
    assert pe.shape == (256, 14)
    # reference builds [pos, sin, cos] over a (-1,1) linspace meshgrid
    # (identification_module.py:76-99); check ordering + values directly.
    lin = np.linspace(-1, 1, 16)
    pos = np.stack(np.meshgrid(lin, lin, indexing="ij"), -1).reshape(-1, 2)
    freqs = 2.0 ** np.arange(3)
    pts = (pos[..., None] * freqs).reshape(-1, 6)
    ref = np.concatenate([pos, np.sin(pts), np.cos(pts)], -1)
    np.testing.assert_allclose(pe, ref, atol=1e-6)


def test_score_target_parity():
    ref_loss = load_ref_module("pose_estimation/loss.py", "ref_loss")
    n = 200
    ori = RNG.uniform(-1, 1, (n, 3)).astype(np.float32)
    dirs = RNG.standard_normal((n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [1.5, -2.0, 0.7]
    K = np.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]], np.float32)

    _, _, ref_target, _ = ref_loss.best_one_to_one_rays_selector(
        torch.from_numpy(K), torch.from_numpy(pose), (100, 100),
        torch.from_numpy(dirs), torch.from_numpy(ori), backbone_wh=(16, 16),
    )
    ours = np.asarray(
        distance_based_score_target(jnp.asarray(pose), jnp.asarray(ori),
                                    jnp.asarray(dirs))
    )
    np.testing.assert_allclose(ours, ref_target.numpy(), rtol=1e-4, atol=1e-5)

    # loss normalization: sum of target scaled to n_features (loss.py:139-141)
    pred = jnp.asarray(RNG.uniform(0, 1, n).astype(np.float32))
    loss, target = distance_based_score_loss(
        pred, jnp.asarray(pose), jnp.asarray(ori), jnp.asarray(dirs), 256.0
    )
    np.testing.assert_allclose(float(jnp.sum(target)), 256.0, rtol=1e-4)


def test_vit_and_full_pose_estimate_smoke():
    cfg = IDConfig(backbone=ViTConfig(depth=2))  # tiny for CPU
    key = jax.random.PRNGKey(0)
    params = init_id_module(key, cfg)

    feats = vit_forward_features(
        params["backbone"],
        jnp.asarray(RNG.standard_normal((224, 224, 3)).astype(np.float32)),
        cfg.backbone,
    )
    assert feats.shape == (256, 384)
    assert np.isfinite(np.asarray(feats)).all()

    n_rays = 512
    img = jnp.asarray(RNG.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    mask = jnp.ones((64, 64), bool)
    ori = jnp.asarray(RNG.uniform(-1, 1, (n_rays, 3)).astype(np.float32))
    dirs = RNG.standard_normal((n_rays, 3)).astype(np.float32)
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))
    rgb = jnp.asarray(RNG.uniform(0, 1, (n_rays, 3)).astype(np.float32))
    up = jnp.asarray([0.0, 0.0, 1.0])

    c2w, scores, idx, weights = estimate_pose_single(
        params, cfg, img, mask, ori, dirs, rgb, up, k=50
    )
    assert c2w.shape == (4, 4) and np.isfinite(np.asarray(c2w)).all()
    assert scores.shape == (n_rays,)
    # scores sum to number of valid patches (softmax over rays, summed over
    # 256 valid patches)
    np.testing.assert_allclose(float(jnp.sum(scores)), 256.0, rtol=1e-3)


def test_id_train_step_learns_small_problem():
    """The shared-ray-embedding train step must reduce the score loss on a
    small synthetic problem (one image, small ray set)."""
    from iffnerf_tpu.pose.trainer import make_id_optimizer, make_id_train_step

    import optax

    cfg = IDConfig(backbone=ViTConfig(depth=1))
    params = init_id_module(jax.random.PRNGKey(0), cfg)
    # a stable LR for this tiny synthetic (the reference's 4e-3 is tuned for
    # 540k rays + 32-step accumulation smoothing); the test validates the
    # shared-ray-embedding VJP machinery, not the hyperparameters
    tx = optax.adam(3e-4)
    step = make_id_train_step(cfg, tx, 1)

    n = 1024
    img = jnp.asarray(RNG.uniform(0, 1, (64, 64, 3)).astype(np.float32))[None]
    mask = jnp.ones((1, 64, 64), bool)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, 3.0]
    poses = jnp.asarray(pose)[None]
    ori = jnp.asarray(RNG.uniform(-0.5, 0.5, (n, 3)).astype(np.float32))
    d = RNG.standard_normal((n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    rgb = jnp.asarray(RNG.uniform(0, 1, (n, 3)).astype(np.float32))

    opt = tx.init(params)
    losses = []
    for _ in range(30):
        params, opt, loss = step(params, opt, img, mask, poses, ori, d, rgb)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, losses[::6]
