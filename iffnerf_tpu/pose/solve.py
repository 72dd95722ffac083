"""Single-image 6DoF pose estimation — one jit-compiled XLA program
(reference pose_estimation/test.py:84-194; SURVEY.md §3.6, the north-star
latency path).

The whole estimate — DINO features -> ray scoring -> top-k -> duplicate-origin
drop -> weighted LSQ intersection -> negative-ray reweight -> look-at
rotation — runs with zero host round-trips. The reference's dynamic
``torch.unique`` dedup (test.py:133-138) becomes a static pairwise
origin-equality count; its NaN/singularity early-exits become ``where``
guards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from iffnerf_tpu.ops.topk import exact_topk
from iffnerf_tpu.pose.geometry import (
    compute_line_intersection_impl2,
    det3,
    exclude_negatives,
    inv3,
    make_rotation_mat,
)
from iffnerf_tpu.pose.id_module import (
    IDConfig,
    image_queries,
    ray_mlp_inputs,
    run_attention,
    score_rays,
)


def _fused_tile(r: int, target: int = 2160) -> int | None:
    """Largest row-tile that divides ``r``, is a multiple of 8 (Mosaic f32
    sublane tile), and is <= ``target``; None disables the fused path."""
    best = None
    for t in range(8, min(target, r) + 1, 8):
        if r % t == 0:
            best = t
    return best


def _scores_maybe_fused(params, config: IDConfig, img, mask, rays_ori,
                        rays_dirs, rays_rgb):
    """Candidate-ray scores via the fused Pallas kernel when enabled and
    tileable, else the reference-shaped XLA path."""
    tile = _fused_tile(rays_ori.shape[0]) if config.fused_scoring else None
    if tile is None:
        scores, _, _, _ = run_attention(
            params, config, img, mask, rays_ori, rays_dirs, rays_rgb
        )
        return scores
    from iffnerf_tpu.ops.fused_ray_attention import fused_ray_scores

    q, patch_valid, _ = image_queries(params, config, img, mask)
    x = ray_mlp_inputs(config, rays_ori, rays_dirs, rays_rgb)
    return fused_ray_scores(
        params, q, patch_valid, x, tile=tile,
        interpret=jax.default_backend() != "tpu",
    )


def solve_pose_from_topk(ori_k: jnp.ndarray, dirs_k: jnp.ndarray,
                         weights_k: jnp.ndarray, model_up: jnp.ndarray):
    """Closed-form camera pose from the top-k scored rays
    (reference test.py:133-194). All [k, 3] / [k] inputs; returns c2w [4,4].
    """
    # drop rays sharing an origin with another ray (test.py:133-138):
    # keep i  iff  no j != i has the identical origin
    same = jnp.all(ori_k[:, None, :] == ori_k[None, :, :], axis=-1)
    keep = jnp.sum(same, axis=-1) == 1

    w = weights_k * keep
    w = w / jnp.sum(w)
    center = compute_line_intersection_impl2(
        ori_k, dirs_k, weights=keep.astype(ori_k.dtype)
    )
    neg = exclude_negatives(center, ori_k, dirs_k)
    w = w * neg
    w = w / jnp.sum(w)
    # The reference re-solves with identical arguments after the reweight
    # (test.py:153-155, weights commented out) — the center is unchanged, so
    # a second solve is pure waste; only the watch direction uses ``w``.

    watch_dir = jnp.sum(dirs_k * w[:, None], axis=0)
    watch_dir = watch_dir / jnp.linalg.norm(watch_dir)

    model_up = model_up / jnp.linalg.norm(model_up)
    w2c_rot = make_rotation_mat(-watch_dir, model_up)
    singular = jnp.abs(det3(w2c_rot)) < 1e-7
    w2c_rot = jnp.where(singular, jnp.eye(3, dtype=w2c_rot.dtype), w2c_rot)

    c2w = jnp.eye(4, dtype=ori_k.dtype)
    # closed-form 3x3 inverse (geometry.det3): jnp.linalg.inv's LU custom
    # call breaks the solve into unfusable tiny kernels on TPU
    c2w = c2w.at[:3, :3].set(inv3(w2c_rot))
    c2w = c2w.at[:3, 3].set(center)

    bad = jnp.any(jnp.isnan(c2w))
    return jnp.where(bad, jnp.eye(4, dtype=c2w.dtype), c2w)


@functools.partial(jax.jit, static_argnames=("config", "k"))
def estimate_pose_single(params, config: IDConfig, img, mask, rays_ori,
                         rays_dirs, rays_rgb, model_up, k: int = 100):
    """Full single-image estimate. Returns (c2w [4,4], scores [N_rays],
    topk_idx [k], topk_weights [k])."""
    scores = _scores_maybe_fused(
        params, config, img, mask, rays_ori, rays_dirs, rays_rgb
    )
    weights_k, idx = exact_topk(scores, k)
    c2w = solve_pose_from_topk(
        rays_ori[idx], rays_dirs[idx], weights_k, model_up
    )
    return c2w, scores, idx, weights_k


@functools.partial(jax.jit, static_argnames=("config", "k"))
def estimate_pose_single_banked(params, config: IDConfig, img, mask, bank,
                                rays_ori, rays_dirs, model_up, k: int = 100):
    """Single-image estimate against a precomputed ray bank
    (id_module.ray_bank): per image only ViT -> Q, one [P,D]@[D,R] logits
    matmul, softmax column sum, top-k and the closed-form solve run —
    measured ~77% of the per-image latency is the image-independent ray
    chain (extra/decompose_pose.py), which the bank amortizes across every
    query against the same object. Scores are bit-identical to
    estimate_pose_single's (same logits graph). Returns (c2w, scores,
    topk_idx, topk_weights)."""
    q, patch_valid, _ = image_queries(params, config, img, mask)
    scores, _ = score_rays(
        params, config, q, patch_valid, None, None, None, bank=bank
    )
    weights_k, idx = exact_topk(scores, k)
    c2w = solve_pose_from_topk(
        rays_ori[idx], rays_dirs[idx], weights_k, model_up
    )
    return c2w, scores, idx, weights_k


@functools.partial(jax.jit, static_argnames=("config", "k", "mesh"))
def estimate_pose_single_sharded(params, config: IDConfig, img, mask,
                                 rays_ori, rays_dirs, rays_rgb, model_up,
                                 mesh, k: int = 100, bank=None):
    """``estimate_pose_single`` with the candidate-ray axis sharded over
    ``mesh``'s 'data' axis (SURVEY.md §5): each device embeds and scores its
    ray shard, the softmax statistics reduce with two [P]-vector
    collectives, every shard takes a local top-k, and the merged global
    top-k feeds the closed-form solve. The image path (DINO features)
    runs replicated — it is a fixed 224x224 cost vs 540k rays.

    The ray count must divide by the mesh size (540000 = 20000 points x 27
    isocell dirs divides any power-of-two mesh up to 32). Exact up to float
    reduction order vs the single-device path. ``bank`` supplies
    ray-sharded precomputed keys (id_module.ray_bank) and skips the
    per-image ray-feature chain, exactly like the single-chip banked
    path."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import get_shard_map
    shard_map = get_shard_map()

    n = rays_ori.shape[0]
    assert n % mesh.size == 0, (n, mesh.size)

    q, patch_valid, _ = image_queries(params, config, img, mask)

    def _topk_from_scores(scores, shard_rows):
        w_loc, i_loc = exact_topk(scores, k)
        gidx = i_loc + jax.lax.axis_index("data") * shard_rows
        return scores, w_loc, gidx

    if bank is not None:
        def shard_fn(params, q, patch_valid, bk, ro):
            scores, _ = score_rays(params, config, q, patch_valid, None,
                                   None, None, axis_name="data", bank=bk)
            return _topk_from_scores(scores, ro.shape[0])

        scores, w_cand, gidx_cand = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P(), P("data"), P("data")),
            out_specs=(P("data"), P("data"), P("data")),
            check_rep=False,
        )(params, q, patch_valid, bank, rays_ori)
    else:
        def shard_fn(params, q, patch_valid, ro, rd, rr):
            scores, _ = score_rays(params, config, q, patch_valid, ro, rd,
                                   rr, axis_name="data")
            return _topk_from_scores(scores, ro.shape[0])

        scores, w_cand, gidx_cand = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P(), P("data"), P("data"), P("data")),
            out_specs=(P("data"), P("data"), P("data")),
            check_rep=False,
        )(params, q, patch_valid, rays_ori, rays_dirs, rays_rgb)

    weights_k, sel = jax.lax.top_k(w_cand, k)        # merge shard top-k's
    idx = jnp.take(gidx_cand, sel)
    c2w = solve_pose_from_topk(
        jnp.take(rays_ori, idx, axis=0), jnp.take(rays_dirs, idx, axis=0),
        weights_k, model_up,
    )
    return c2w, scores, idx, weights_k
