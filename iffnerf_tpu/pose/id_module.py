"""Identification Module: DINOv2 patch features x ray embeddings via
single-head QK attention (reference pose_estimation/identification_module.py,
ray_preprocessor.py, multihead_attention.py, backbone.py).

TPU-first recast: the reference boolean-masks image patches to a dynamic
count (identification_module.py:158); here all 256 patches stay in the
attention with a validity mask, and the per-ray score is the
validity-weighted column sum — identical math, static shapes. The 540k-ray
K projection + [patches, rays] logits are plain batched matmuls that XLA
tiles onto the MXU; the softmax normalizes over the ray axis
(multihead_attention.py:4-12) so scores need the full row — we keep the
logits resident ([256, 540k] f32 = 0.5 GB, fine in HBM; a streaming
variant can replace it if VMEM pressure ever matters).
"""

from __future__ import annotations

import dataclasses
import math
import os

import numpy as np
import jax
import jax.numpy as jnp

from iffnerf_tpu.nn import linear_apply, mlp_init
from iffnerf_tpu.ops.encoding import positional_encoding
from iffnerf_tpu.pose.vit import ViTConfig, init_vit, vit_forward_features

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class IDConfig:
    backbone: ViTConfig = ViTConfig()
    resize_size: int = 256
    crop_size: int = 224
    pe_freqs: int = 3          # image-patch PE (id_module.py:76-99)
    ray_view_pe: int = 8
    ray_pos_pe: int = 8
    ray_rgb_pe: int = 6
    ray_feature_c: int = 256
    mask_threshold: float = 0.1
    # matmul input dtype for the 540k-ray scoring path; the MXU accumulates
    # in f32 either way, softmax/score sums stay f32. "bfloat16" halves the
    # HBM traffic of the candidate-ray matmuls at negligible score error —
    # use it for inference (bench.py does); training keeps float32.
    compute_dtype: str = "float32"
    # single-pass Pallas kernel for the ray-side scoring chain (inference
    # only — no gradient rule): fuses the 5 ray matmuls + logits + online
    # softmax stats in VMEM instead of materializing ~6.7 GB of HBM
    # intermediates (ops/fused_ray_attention.py). Falls back to the XLA
    # path when the ray count has no suitable row-tile divisor.
    fused_scoring: bool = False
    # fast BANKED per-image scoring (inference). On a TPU backend the
    # default mode is "bf16": the [P, R] logits matmul emits the compute
    # dtype (halving the materialized buffer the softmax passes re-read)
    # and upcasts in the consumer — measured 2.288 vs the Pallas kernel's
    # 2.504 and the exact path's 3.737 ms/image in the production banked
    # estimate (v5e, BASELINE round-5), with scores within 7.2e-5 of
    # exact, identical top-100, pose delta ~1e-8. "fused" (two-pass
    # flash-style Pallas kernel, ops/banked_attention.py, f32 logits in
    # VMEM, reduction-order tolerance) and "exact" (bit-identical f32
    # XLA) stay selectable via IFFNERF_BANK_SCORING; the legacy
    # IFFNERF_FUSED_BANK=0/1 maps to exact/fused. False = always exact.
    fused_bank: bool = True

    @property
    def img_num_features(self) -> int:
        return self.backbone.dim

    @property
    def backbone_wh(self):
        return (self.backbone.grid, self.backbone.grid)

    @property
    def pe_channels(self) -> int:
        return 2 + 2 * 2 * self.pe_freqs  # raw xy + sin/cos per freq

    @property
    def ray_in_dim(self) -> int:
        return (3 + 2 * self.ray_pos_pe * 3) + (3 + 2 * self.ray_view_pe * 3) \
            + (3 + 2 * self.ray_rgb_pe * 3)


def init_id_module(key, config: IDConfig = IDConfig()):
    k_vit, k_ray1, k_ray2, k_q, k_k = jax.random.split(key, 5)
    d = config.img_num_features
    fc = config.ray_feature_c
    params = {
        "backbone": init_vit(k_vit, config.backbone),
        # RayPreprocessor: mlp (2 layers) + skip-concat mlp2 (2 layers)
        # (ray_preprocessor.py:4-39)
        "ray_mlp": mlp_init(k_ray1, [config.ray_in_dim, fc, fc]),
        "ray_mlp2": mlp_init(k_ray2, [fc + config.ray_in_dim, fc, d]),
        # QK attention, xavier-uniform + zero bias
        # (multihead_attention.py:44-54)
        "q_proj": _xavier_linear(k_q, d + config.pe_channels, d),
        "k_proj": _xavier_linear(k_k, d, d),
    }
    return params


def _xavier_linear(key, in_dim, out_dim):
    bound = math.sqrt(6.0 / (in_dim + out_dim))
    w = jax.random.uniform(key, (in_dim, out_dim), minval=-bound, maxval=bound)
    return {"w": w, "b": jnp.zeros(out_dim)}


# ---------------------------------------------------------------------------
# Image preprocessing (identification_module.py:36-61)
# ---------------------------------------------------------------------------


def _resize(img: jnp.ndarray, out_h: int, out_w: int,
            method: str) -> jnp.ndarray:
    # antialias=True (the jax default) matches PIL / torchvision
    # antialias=True resampling to ~3e-5 (tests/test_preprocess.py)
    return jax.image.resize(img, (out_h, out_w) + img.shape[2:], method)


def _short_side_resize_shape(h: int, w: int, size: int):
    """torchvision ``Resize(size)`` output shape: short side -> ``size``,
    long side TRUNCATED (``int(size * long / short)``, not rounded) —
    torchvision _compute_resized_output_size semantics."""
    if h <= w:
        return size, int(size * w / h)
    return int(size * h / w), size


def _center_crop_origin(n: int, crop: int) -> int:
    """torchvision ``CenterCrop`` origin: ``int(round((n - crop) / 2.0))``
    with Python banker's rounding (can differ from floor by 1 when
    ``n - crop`` is odd)."""
    return int(round((n - crop) / 2.0))


def preprocess_image(config: IDConfig, img: jnp.ndarray) -> jnp.ndarray:
    """[H, W, 3] in [0,1] -> [224, 224, 3] bicubic-resized (short side 256),
    center-cropped, ImageNet-normalized."""
    h, w = img.shape[:2]
    nh, nw = _short_side_resize_shape(h, w, config.resize_size)
    img = _resize(img, nh, nw, "cubic")
    top = _center_crop_origin(nh, config.crop_size)
    left = _center_crop_origin(nw, config.crop_size)
    img = img[top:top + config.crop_size, left:left + config.crop_size]
    mean = jnp.asarray(IMAGENET_MEAN, img.dtype)
    std = jnp.asarray(IMAGENET_STD, img.dtype)
    return (img - mean) / std


def preprocess_mask(config: IDConfig, mask: jnp.ndarray) -> jnp.ndarray:
    """[H, W] bool -> [grid*grid] patch-validity bool (bilinear 256 ->
    crop 224 -> bilinear to the patch grid, > 0.1;
    identification_module.py:47-61,135)."""
    m = mask.astype(jnp.float32)[..., None]
    h, w = m.shape[:2]
    nh, nw = _short_side_resize_shape(h, w, config.resize_size)
    m = _resize(m, nh, nw, "linear")
    top = _center_crop_origin(nh, config.crop_size)
    left = _center_crop_origin(nw, config.crop_size)
    m = m[top:top + config.crop_size, left:left + config.crop_size]
    g = config.backbone.grid
    m = _resize(m, g, g, "linear")
    return (m[..., 0] > config.mask_threshold).reshape(-1)


def img_position_encoding(config: IDConfig, dtype=jnp.float32) -> jnp.ndarray:
    """[grid*grid, 14] 2-D positional encoding: raw xy + sin/cos octaves
    (identification_module.py:76-99)."""
    g = config.backbone.grid
    lin = np.linspace(-1.0, 1.0, g)
    pos = np.stack(np.meshgrid(lin, lin, indexing="ij"), axis=-1).reshape(-1, 2)
    freqs = 2.0 ** np.arange(config.pe_freqs)
    pts = (pos[..., None] * freqs).reshape(pos.shape[0], -1)
    out = np.concatenate([pos, np.sin(pts), np.cos(pts)], axis=-1)
    return jnp.asarray(out, dtype)


def image_features(params, config: IDConfig, img: jnp.ndarray,
                   mask: jnp.ndarray):
    """-> (features_w_pe [P, D+14], patch_valid [P] bool, features [P, D])."""
    norm_img = preprocess_image(config, img)
    patch_valid = preprocess_mask(config, mask)
    feats = vit_forward_features(params["backbone"], norm_img, config.backbone)
    pe = img_position_encoding(config, feats.dtype)
    return jnp.concatenate([feats, pe], axis=-1), patch_valid, feats


# ---------------------------------------------------------------------------
# Ray path + attention
# ---------------------------------------------------------------------------


def _cast_linear(layer, dtype):
    return {k: v.astype(dtype) for k, v in layer.items()}


def ray_mlp_inputs(config: IDConfig, rays_ori, rays_dir, rays_rgb):
    """[R, ray_in_dim] concatenated raw+PE inputs of the ray MLP, in the
    compute dtype (ray_preprocessor.py:29-33)."""
    dt = jnp.dtype(config.compute_dtype)
    indata = [rays_ori, rays_dir, rays_rgb,
              positional_encoding(rays_ori, config.ray_pos_pe),
              positional_encoding(rays_dir, config.ray_view_pe),
              positional_encoding(rays_rgb, config.ray_rgb_pe)]
    return jnp.concatenate(indata, axis=-1).astype(dt)


def ray_features(params, config: IDConfig, rays_ori, rays_dir, rays_rgb):
    """Skip-MLP ray embedding (ray_preprocessor.py:29-39). Runs in
    ``config.compute_dtype`` (bf16 by default on the 540k-ray hot path)."""
    dt = jnp.dtype(config.compute_dtype)
    x = ray_mlp_inputs(config, rays_ori, rays_dir, rays_rgb)
    h = x
    for layer in params["ray_mlp"]:
        h = jax.nn.relu(linear_apply(_cast_linear(layer, dt), h))
    h = jnp.concatenate([h, x], axis=-1)
    h = jax.nn.relu(linear_apply(_cast_linear(params["ray_mlp2"][0], dt), h))
    return linear_apply(_cast_linear(params["ray_mlp2"][1], dt), h)


def image_queries(params, config: IDConfig, img, mask):
    """Image-side half of the scoring: -> (q [P, D] in the compute dtype,
    patch_valid [P], features_img [P, D])."""
    feats_w_pe, patch_valid, feats = image_features(params, config, img, mask)
    dt = jnp.dtype(config.compute_dtype)
    q = linear_apply(_cast_linear(params["q_proj"], dt),
                     feats_w_pe.astype(dt))             # [P, D]
    return q, patch_valid, feats


def ray_bank(params, config: IDConfig, rays_ori, rays_dir, rays_rgb):
    """Image-independent ray-side keys K [R, D] (ray features + k
    projection), precomputable ONCE per candidate-ray set.

    The candidate rays are fixed per object at test time (the reference
    passes the same set to test.py:84 for every frame), yet its torch path
    recomputes this chain per image — measured 13.0 of 16.9 ms of the
    per-image estimate on v5e (extra/decompose_pose.py). Banking K turns
    repeated pose queries into ViT + one [R,D]@[D,P] matmul + softmax."""
    feats_rays = ray_features(params, config, rays_ori, rays_dir, rays_rgb)
    dt = jnp.dtype(config.compute_dtype)
    return linear_apply(_cast_linear(params["k_proj"], dt),
                        feats_rays.astype(dt))          # [R, D]


def _bank_scoring_mode(config: IDConfig) -> str:
    """Trace-time dispatch for the banked scoring path. Returns one of
    "bf16" (logits matmul emits the compute dtype, upcast in the
    consumer — the TPU default for bf16 compute, BASELINE round-5),
    "fused" (two-pass Pallas kernel, ops/banked_attention.py), or
    "exact" (bit-identical f32-logits XLA — always the answer off-TPU
    and when ``config.fused_bank`` is False). IFFNERF_BANK_SCORING picks
    a mode explicitly; the legacy IFFNERF_FUSED_BANK=0/1 kill switch
    maps to exact/fused (tests force the kernel with it in interpret
    mode on CPU)."""
    if not config.fused_bank:
        return "exact"
    env = os.environ.get("IFFNERF_BANK_SCORING")
    if env in ("bf16", "fused", "exact"):
        return env
    legacy = os.environ.get("IFFNERF_FUSED_BANK")
    if legacy is not None:
        return "fused" if legacy != "0" else "exact"
    if jax.default_backend() != "tpu":
        return "exact"
    return ("bf16" if jnp.dtype(config.compute_dtype) == jnp.bfloat16
            else "fused")


def score_rays(params, config: IDConfig, q, patch_valid, rays_ori, rays_dir,
               rays_rgb, axis_name: str | None = None, bank=None):
    """Ray-side scoring for a (shard of the) candidate set: K projection,
    QK^T logits, softmax over the ray axis, validity-weighted column sum
    (identification_module.py:162-168). When ``axis_name`` is given the rays
    are a shard of a mesh axis and the softmax max/sum statistics reduce
    over it (per-shard [P] vectors — the only cross-device traffic), making
    the sharded scores exactly the full softmax's. ``bank`` supplies
    precomputed keys (ray_bank) and skips the ray-feature chain — the
    logits are bit-identical either way.

    Returns (scores [R], attention [P, R])."""
    k = (bank if bank is not None
         else ray_bank(params, config, rays_ori, rays_dir, rays_rgb))
    mode = (_bank_scoring_mode(config)
            if bank is not None and axis_name is None else "exact")
    if mode == "fused":
        from iffnerf_tpu.ops.banked_attention import (
            bank_tile_for,
            banked_scores_fused,
        )

        tile = bank_tile_for(k.shape[0])
        if tile is not None:
            scores = banked_scores_fused(k, q, patch_valid, tile=tile)
            return scores, None
    # "bf16": the dot emits the (bf16) input dtype — the MXU still
    # accumulates f32, only the materialized [P, R] buffer the softmax
    # passes re-read halves; the upcast fuses into the consumer.
    pet = None if mode == "bf16" else jnp.float32
    logits = jnp.dot(q, k.T, preferred_element_type=pet).astype(
        jnp.float32
    ) / math.sqrt(q.shape[-1])                          # [P, R] f32
    m = jnp.max(logits, axis=-1)
    if axis_name is not None:
        m = jax.lax.pmax(m, axis_name)
    if mode == "bf16":
        # fold validity and the denominator into one per-patch log-shift:
        # scores = sum_p exp(l - m - log d - (0|inf)) — the final pass is
        # a single exp+sum and the [P, R] attention array is never
        # materialized (measured 0.73 ms faster than the divide-then-sum
        # graph at the production shape, BASELINE round-5). Within f32
        # log/exp-roundtrip tolerance of the exact scores; attention is
        # not produced (same contract as the fused kernel).
        denom = jnp.sum(jnp.exp(logits - m[:, None]), axis=-1)
        shift = (m + jnp.log(denom)
                 + jnp.where(patch_valid, 0.0, jnp.inf))
        scores = jnp.sum(jnp.exp(logits - shift[:, None]), axis=0)
        return scores, None
    e = jnp.exp(logits - m[:, None])
    denom = jnp.sum(e, axis=-1)
    if axis_name is not None:
        denom = jax.lax.psum(denom, axis_name)
    attention = e / denom[:, None]
    scores = jnp.sum(
        jnp.where(patch_valid[:, None], attention, 0.0), axis=0
    )
    return scores, attention


def run_attention(params, config: IDConfig, img, mask, rays_ori, rays_dir,
                  rays_rgb):
    """-> (scores [N_rays], attention [P, N_rays], patch_valid [P],
    features_img [P, D]) (identification_module.py:162-168: per-ray score is
    the sum of its softmaxed attention column over foreground patches)."""
    q, patch_valid, feats = image_queries(params, config, img, mask)
    scores, attention = score_rays(
        params, config, q, patch_valid, rays_ori, rays_dir, rays_rgb
    )
    return scores, attention, patch_valid, feats


def test_image(params, config: IDConfig, img, mask, rays_ori, rays_dir,
               rays_rgb, rays_to_output: int = 100):
    """Top-k candidate rays for one image
    (identification_module.py:193-209)."""
    scores, attention, patch_valid, _ = run_attention(
        params, config, img, mask, rays_ori, rays_dir, rays_rgb
    )
    from iffnerf_tpu.ops.topk import exact_topk

    values, indices = exact_topk(scores, rays_to_output)
    return indices, values, scores, attention, patch_valid


# ---------------------------------------------------------------------------
# Loss (pose_estimation/loss.py:87-146)
# ---------------------------------------------------------------------------


def distance_based_score_target(camera_pose, rays_ori, rays_dir,
                                tanh_denominator: float = 1.0):
    """Per-ray target: 1 - tanh(point-line distance of the GT camera center
    from the ray), clamped to the origin for rays pointing away
    (loss.py:4-40, the ``target_score`` actually used)."""
    cam_pos = camera_pose[:3, 3]
    v = cam_pos[None, :] - rays_ori
    proj = jnp.sum(v * rays_dir, axis=-1, keepdims=True)
    closest = jnp.where(proj < 0, rays_ori, rays_ori + proj * rays_dir)
    distance = jnp.linalg.norm(closest - cam_pos, axis=-1)
    return 1.0 - jnp.tanh(distance / tanh_denominator)


def distance_based_score_loss(pred_score, camera_pose, rays_ori, rays_dir,
                              total_number_of_features):
    """MSE against the normalized target (Σ target = n_valid_patches,
    loss.py:109-146). Returns (loss, target)."""
    target = distance_based_score_target(camera_pose, rays_ori, rays_dir)
    target = jax.lax.stop_gradient(
        target * (total_number_of_features / jnp.sum(target))
    )
    return jnp.mean(jnp.square(pred_score - target)), target
