"""DINOv2 weight-conversion proof (VERDICT round-1 missing item #1).

``convert_torch_dinov2`` maps torch-hub facebookresearch/dinov2 state_dicts
into the jnp ViT pytree. No pretrained weights exist in this zero-egress
image, so the test constructs a RANDOM state_dict in the torch format and
checks forward parity against an independent torch oracle that implements
DINOv2's published forward (conv patch embed, pre-norm blocks with
LayerScale, exact GELU, eps-1e-6 LayerNorms, x_norm_patchtokens output) —
exercising every name, transpose, and math detail the converter relies on
(reference pose_estimation/backbone.py:3-15 downloads the same weights via
torch.hub)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iffnerf_tpu.pose.vit import (
    ViTConfig,
    convert_torch_dinov2,
    init_vit,
    vit_forward_features,
)

RNG = np.random.default_rng(99)


def _synthetic_state_dict(cfg: ViTConfig, scale=0.05):
    """Random weights in torch-hub dinov2 naming/layout (numpy arrays)."""
    d, h = cfg.dim, cfg.dim * cfg.mlp_ratio

    def r(*shape):
        return (scale * RNG.standard_normal(shape)).astype(np.float32)

    sd = {
        "patch_embed.proj.weight": r(d, 3, cfg.patch_size, cfg.patch_size),
        "patch_embed.proj.bias": r(d),
        "cls_token": r(1, 1, d),
        "pos_embed": r(1, 1 + cfg.n_patches, d),
        "norm.weight": 1.0 + r(d),
        "norm.bias": r(d),
    }
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        sd.update({
            f"{b}.norm1.weight": 1.0 + r(d), f"{b}.norm1.bias": r(d),
            f"{b}.attn.qkv.weight": r(3 * d, d),
            f"{b}.attn.qkv.bias": r(3 * d),
            f"{b}.attn.proj.weight": r(d, d), f"{b}.attn.proj.bias": r(d),
            f"{b}.ls1.gamma": r(d),
            f"{b}.norm2.weight": 1.0 + r(d), f"{b}.norm2.bias": r(d),
            f"{b}.mlp.fc1.weight": r(h, d), f"{b}.mlp.fc1.bias": r(h),
            f"{b}.mlp.fc2.weight": r(d, h), f"{b}.mlp.fc2.bias": r(d),
            f"{b}.ls2.gamma": r(d),
        })
    return sd


def _torch_oracle_forward(sd, img, cfg: ViTConfig):
    """Independent torch implementation of DINOv2 forward_features ->
    x_norm_patchtokens (facebookresearch/dinov2 vision_transformer.py)."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    x = torch.from_numpy(img).permute(2, 0, 1)[None]          # [1,3,H,W]
    x = F.conv2d(x, t["patch_embed.proj.weight"],
                 t["patch_embed.proj.bias"], stride=cfg.patch_size)
    x = x.flatten(2).transpose(1, 2)                          # [1,N,D]
    x = torch.cat([t["cls_token"], x], dim=1)
    x = x + t["pos_embed"]

    nh, hd = cfg.num_heads, cfg.dim // cfg.num_heads
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        h = F.layer_norm(x, (cfg.dim,), t[f"{b}.norm1.weight"],
                         t[f"{b}.norm1.bias"], eps=1e-6)
        qkv = F.linear(h, t[f"{b}.attn.qkv.weight"], t[f"{b}.attn.qkv.bias"])
        B, N, _ = qkv.shape
        qkv = qkv.reshape(B, N, 3, nh, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = torch.softmax((q @ k.transpose(-2, -1)) * hd ** -0.5, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, cfg.dim)
        out = F.linear(out, t[f"{b}.attn.proj.weight"],
                       t[f"{b}.attn.proj.bias"])
        x = x + t[f"{b}.ls1.gamma"] * out

        h = F.layer_norm(x, (cfg.dim,), t[f"{b}.norm2.weight"],
                         t[f"{b}.norm2.bias"], eps=1e-6)
        h = F.linear(h, t[f"{b}.mlp.fc1.weight"], t[f"{b}.mlp.fc1.bias"])
        h = F.gelu(h)  # exact erf GELU, as in dinov2's Mlp
        h = F.linear(h, t[f"{b}.mlp.fc2.weight"], t[f"{b}.mlp.fc2.bias"])
        x = x + t[f"{b}.ls2.gamma"] * h

    x = F.layer_norm(x, (cfg.dim,), t["norm.weight"], t["norm.bias"],
                     eps=1e-6)
    return x[0, 1:].numpy()


def test_convert_torch_dinov2_forward_parity():
    cfg = ViTConfig(img_size=28, patch_size=14, dim=32, depth=2, num_heads=4)
    sd = _synthetic_state_dict(cfg)
    img = RNG.standard_normal((28, 28, 3)).astype(np.float32)

    expected = _torch_oracle_forward(sd, img, cfg)
    params = convert_torch_dinov2(sd, cfg)
    got = np.asarray(vit_forward_features(params, jnp.asarray(img), cfg))

    assert got.shape == expected.shape == (cfg.n_patches, cfg.dim)
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


def test_convert_matches_init_tree_structure():
    """Converted params must be a drop-in replacement for init_vit params:
    same tree structure and per-leaf shapes/dtypes."""
    cfg = ViTConfig(img_size=28, patch_size=14, dim=32, depth=2, num_heads=4)
    converted = convert_torch_dinov2(_synthetic_state_dict(cfg), cfg)
    initialized = init_vit(jax.random.PRNGKey(0), cfg)

    conv_paths = jax.tree_util.tree_flatten_with_path(converted)[0]
    init_paths = jax.tree_util.tree_flatten_with_path(initialized)[0]
    assert [p for p, _ in conv_paths] == [p for p, _ in init_paths]
    for (path, a), (_, b) in zip(conv_paths, init_paths):
        assert a.shape == b.shape, (path, a.shape, b.shape)


def test_convert_tool_and_backbone_ckpt_path(tmp_path):
    """End-to-end: tools/convert_dinov2.py converts a torch-saved ViT-S/14
    state_dict to npz, and the pose driver's --backbone_ckpt load path
    (load_pytree -> id_params['backbone'] -> image feature forward) runs on
    the result."""
    import sys, os
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    torch = pytest.importorskip("torch")
    import convert_dinov2 as tool

    from iffnerf_tpu.checkpoint import load_pytree, save_pytree
    from iffnerf_tpu.pose.id_module import (
        IDConfig, image_features, init_id_module,
    )

    cfg = ViTConfig()  # real ViT-S/14 shape
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in _synthetic_state_dict(cfg).items()}
    ckpt = tmp_path / "dinov2_vits14.pth"
    torch.save(sd, ckpt)

    params = tool.from_torch_ckpt(str(ckpt))
    npz = tmp_path / "dinov2_vits14.npz"
    save_pytree(str(npz), params, {"arch": "dinov2_vits14"})

    backbone, meta = load_pytree(str(npz))
    assert meta["arch"] == "dinov2_vits14"

    id_cfg = IDConfig()
    id_params = init_id_module(jax.random.PRNGKey(0), id_cfg)
    # structural drop-in (the exact assignment train_eval_pose_est.py does)
    assert jax.tree_util.tree_structure(
        id_params["backbone"]) == jax.tree_util.tree_structure(backbone)
    id_params["backbone"] = backbone

    img = jnp.asarray(RNG.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    mask = jnp.ones((64, 64), jnp.float32)
    feats_w_pe, patch_valid, feats = image_features(id_params, id_cfg, img,
                                                    mask)
    assert feats.shape == (id_cfg.backbone.n_patches, id_cfg.backbone.dim)
    assert bool(jnp.all(jnp.isfinite(feats)))
