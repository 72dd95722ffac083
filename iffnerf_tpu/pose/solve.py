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

from iffnerf_tpu.pose.geometry import (
    compute_line_intersection_impl2,
    exclude_negatives,
    make_rotation_mat,
)
from iffnerf_tpu.pose.id_module import IDConfig, run_attention


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
    singular = jnp.abs(jnp.linalg.det(w2c_rot)) < 1e-7
    w2c_rot = jnp.where(singular, jnp.eye(3, dtype=w2c_rot.dtype), w2c_rot)

    c2w = jnp.eye(4, dtype=ori_k.dtype)
    c2w = c2w.at[:3, :3].set(jnp.linalg.inv(w2c_rot))
    c2w = c2w.at[:3, 3].set(center)

    bad = jnp.any(jnp.isnan(c2w))
    return jnp.where(bad, jnp.eye(4, dtype=c2w.dtype), c2w)


@functools.partial(jax.jit, static_argnames=("config", "k"))
def estimate_pose_single(params, config: IDConfig, img, mask, rays_ori,
                         rays_dirs, rays_rgb, model_up, k: int = 100):
    """Full single-image estimate. Returns (c2w [4,4], scores [N_rays],
    topk_idx [k], topk_weights [k])."""
    scores, _, _, _ = run_attention(
        params, config, img, mask, rays_ori, rays_dirs, rays_rgb
    )
    weights_k, idx = jax.lax.top_k(scores, k)
    c2w = solve_pose_from_topk(
        rays_ori[idx], rays_dirs[idx], weights_k, model_up
    )
    return c2w, scores, idx, weights_k
