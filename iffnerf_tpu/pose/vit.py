"""Functional DINOv2-style ViT-S/14 image backbone in pure jnp.

The reference downloads ``dinov2_vits14`` via torch.hub at runtime
(pose_estimation/backbone.py:3-15) — impossible in a zero-egress
environment. Instead the architecture (patch embed 14, dim 384, 12 blocks,
6 heads, MLP ratio 4, LayerScale, pre-norm, final LayerNorm) is implemented
natively; ``convert_torch_dinov2`` maps official torch-hub / HuggingFace
``facebook/dinov2-small`` weights into this pytree offline where weights
are available, and random init is used otherwise (the ID-module trainer
fine-tunes the backbone at lr 1e-3, pose_estimation/train.py:31-47, so the
pipeline remains trainable without pretrained weights).

The forward matches DINOv2's ``forward_features``: returns
``x_norm_patchtokens`` [N_patches, D].
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 14
    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: int = 4
    layerscale_init: float = 1e-5

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def n_patches(self) -> int:
        return self.grid * self.grid


def _trunc_normal(key, shape, std=0.02):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape)


def init_vit(key, config: ViTConfig = ViTConfig()):
    d = config.dim
    keys = jax.random.split(key, 4 + config.depth)
    params = {
        "patch_embed": {
            "w": _trunc_normal(
                keys[0], (config.patch_size, config.patch_size, 3, d)
            ),
            "b": jnp.zeros(d),
        },
        "cls_token": _trunc_normal(keys[1], (1, d), std=1e-6),
        "pos_embed": _trunc_normal(keys[2], (1 + config.n_patches, d)),
        "norm": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
        "blocks": [],
    }
    h = d * config.mlp_ratio
    for i in range(config.depth):
        bk = jax.random.split(keys[4 + i], 6)
        params["blocks"].append(
            {
                "norm1": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
                "qkv": {"w": _trunc_normal(bk[0], (d, 3 * d)),
                        "b": jnp.zeros(3 * d)},
                "proj": {"w": _trunc_normal(bk[1], (d, d)), "b": jnp.zeros(d)},
                "ls1": jnp.full(d, config.layerscale_init),
                "norm2": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
                "fc1": {"w": _trunc_normal(bk[2], (d, h)), "b": jnp.zeros(h)},
                "fc2": {"w": _trunc_normal(bk[3], (h, d)), "b": jnp.zeros(d)},
                "ls2": jnp.full(d, config.layerscale_init),
            }
        )
    # tuple so checkpoint round-trips (checkpoint._unflatten) are
    # structural no-ops
    params["blocks"] = tuple(params["blocks"])
    return params


def _layer_norm(p, x, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _attention(block, x, num_heads: int):
    n, d = x.shape
    head = d // num_heads
    qkv = x @ block["qkv"]["w"] + block["qkv"]["b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(n, num_heads, head).transpose(1, 0, 2)

    q, k, v = heads(q), heads(k), heads(v)
    attn = jax.nn.softmax(
        (q @ k.transpose(0, 2, 1)) / math.sqrt(head), axis=-1
    )
    out = (attn @ v).transpose(1, 0, 2).reshape(n, d)
    return out @ block["proj"]["w"] + block["proj"]["b"]


def _mlp(block, x):
    h = jax.nn.gelu(x @ block["fc1"]["w"] + block["fc1"]["b"], approximate=False)
    return h @ block["fc2"]["w"] + block["fc2"]["b"]


def vit_forward_features(params, img: jnp.ndarray,
                         config: ViTConfig = ViTConfig()) -> jnp.ndarray:
    """img [H, W, 3] (normalized) -> x_norm_patchtokens [n_patches, dim]."""
    g, p = config.grid, config.patch_size
    # patch embedding as a reshape + single big matmul (MXU-friendly)
    x = img.reshape(g, p, g, p, 3).transpose(0, 2, 1, 3, 4).reshape(
        g * g, p * p * 3
    )
    w = params["patch_embed"]["w"].reshape(p * p * 3, config.dim)
    x = x @ w + params["patch_embed"]["b"]

    x = jnp.concatenate([params["cls_token"], x], axis=0)
    x = x + params["pos_embed"]

    for block in params["blocks"]:
        x = x + block["ls1"] * _attention(
            block, _layer_norm(block["norm1"], x), config.num_heads
        )
        x = x + block["ls2"] * _mlp(block, _layer_norm(block["norm2"], x))

    x = _layer_norm(params["norm"], x)
    return x[1:]  # drop cls -> patch tokens


def convert_torch_dinov2(state_dict, config: ViTConfig = ViTConfig()):
    """Map a torch-hub DINOv2 ``state_dict`` (facebookresearch/dinov2
    naming) into this module's pytree. Run offline where weights exist;
    save with np.savez and reload with ``load_vit_npz``."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def lin(prefix):
        return {
            "w": jnp.asarray(sd[f"{prefix}.weight"].T),
            "b": jnp.asarray(sd[f"{prefix}.bias"]),
        }

    def norm(prefix):
        return {
            "scale": jnp.asarray(sd[f"{prefix}.weight"]),
            "bias": jnp.asarray(sd[f"{prefix}.bias"]),
        }

    params = {
        # torch conv weight [D, 3, p, p] -> [p, p, 3, D]
        "patch_embed": {
            "w": jnp.asarray(
                sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0)
            ),
            "b": jnp.asarray(sd["patch_embed.proj.bias"]),
        },
        "cls_token": jnp.asarray(sd["cls_token"][0]),
        "pos_embed": jnp.asarray(sd["pos_embed"][0]),
        "norm": norm("norm"),
        "blocks": [],
    }
    for i in range(config.depth):
        b = f"blocks.{i}"
        params["blocks"].append(
            {
                "norm1": norm(f"{b}.norm1"),
                "qkv": lin(f"{b}.attn.qkv"),
                "proj": lin(f"{b}.attn.proj"),
                "ls1": jnp.asarray(sd[f"{b}.ls1.gamma"]),
                "norm2": norm(f"{b}.norm2"),
                "fc1": lin(f"{b}.mlp.fc1"),
                "fc2": lin(f"{b}.mlp.fc2"),
                "ls2": jnp.asarray(sd[f"{b}.ls2.gamma"]),
            }
        )
    params["blocks"] = tuple(params["blocks"])
    return params
