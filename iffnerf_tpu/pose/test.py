"""Pose-estimation evaluation harness (reference pose_estimation/test.py:10-268):
per test image run the jitted single-image estimate, accumulate
translation/angular errors, top-100 recall and score loss, and emit the
reference's JSON row schema (test.py:235-247)."""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from iffnerf_tpu.pose.geometry import (
    compute_angular_error,
    compute_translation_error,
)
from iffnerf_tpu.pose.id_module import (
    IDConfig,
    distance_based_score_loss,
)
from iffnerf_tpu.pose.solve import (
    estimate_pose_single_banked,
    estimate_pose_single_sharded,
)


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _solver_debug_intermediates(scores, idx, weights_k, rays_ori, dirs_solve,
                                model_up):
    """Recompute the closed-form solver chain with the reference's dynamic
    shapes (host numpy) for the debug dump (reference test.py:131-190):
    duplicate-origin rays are DROPPED (not masked), producing the variable-
    length ``topk_unique_*`` arrays the reference saves. Same math as
    solve.solve_pose_from_topk, whose fixed-shape masking it mirrors."""
    from iffnerf_tpu.pose.geometry import (
        compute_line_intersection_impl2,
        exclude_negatives,
        make_rotation_mat,
    )

    idx = np.asarray(idx)
    weights_k = np.asarray(weights_k)
    ori_k = np.asarray(rays_ori)[idx]
    dirs_k = np.asarray(dirs_solve)[idx]

    # reference test.py:135-140: keep rays whose origin appears exactly once
    _, inverse, counts = np.unique(ori_k, axis=0, return_inverse=True,
                                   return_counts=True)
    keep = counts[inverse] == 1
    u_idx, u_w = idx[keep], weights_k[keep]
    ori_u, dirs_u = ori_k[keep], dirs_k[keep]

    w = u_w / u_w.sum()
    center = np.asarray(
        compute_line_intersection_impl2(jnp.asarray(ori_u),
                                        jnp.asarray(dirs_u))
    )
    neg = np.asarray(
        exclude_negatives(jnp.asarray(center), jnp.asarray(ori_u),
                          jnp.asarray(dirs_u))
    )
    w = w * neg
    w = w / w.sum()
    watch = (dirs_u * w[:, None]).sum(0)
    watch = watch / np.linalg.norm(watch)
    rot = np.asarray(make_rotation_mat(jnp.asarray(-watch),
                                       jnp.asarray(model_up)))
    if abs(np.linalg.det(rot)) < 1e-7:
        rot = np.eye(3, dtype=rot.dtype)
    c2w = np.eye(4, dtype=ori_u.dtype)
    c2w[:3, :3] = np.linalg.inv(rot)
    c2w[:3, 3] = center
    return {
        "topk_unique_ray_idx": u_idx,
        "topk_unique_weights": u_w,
        "topk_unique_weights_after_exclusion": w,
        "pred_camera_optical_center": center,
        "pred_camera_watch_dir": -watch,
        "pred_c2w_matrix": c2w,
    }


def test_pose_estimation(dataset, id_params, id_config: IDConfig, rays_ori,
                         rays_dirs, rays_rgb, model_up, sequence_id: str = "",
                         compute_loss: bool = True, inerf_refinement: bool = False,
                         nerf=None, k: int = 100, log_fn=print, mesh=None,
                         save: bool = False, save_all: bool = False,
                         save_dir: str = "."):
    """Returns (results, avg_translation_error, avg_angular_error,
    avg_loss_score, avg_recall). With ``mesh`` the candidate-ray axis of
    the scoring is sharded over its data axis (the ray count must divide
    the mesh size; 20000 points x 27 isocell dirs divides any
    power-of-two mesh up to 32).

    ``save`` dumps the intermediate tensors of image 0 (every image with
    ``save_all``) to ``save_dir/sample_results_<i>.npz`` with the
    reference's field names (test.py:93-105,140-145,178-190; npz instead
    of torch.save, and ``save_dir`` instead of its hardcoded home path)."""
    model_up = model_up / jnp.linalg.norm(model_up)
    if mesh is not None and rays_ori.shape[0] % mesh.size != 0:
        log_fn(f"pose mesh disabled: {rays_ori.shape[0]} rays not divisible "
               f"by mesh size {mesh.size}")
        mesh = None

    translation_errors, angular_errors = [], []
    recalls, avg_loss_scores, results = [], [], []

    n_images = len(dataset.all_rgbs)
    w, h = dataset.img_wh

    # per-image latency (reference test.py:249-256 fills this with CUDA
    # event timing): force completion with a host pull and subtract the
    # measured round-trip floor — block_until_ready is unreliable through
    # the axon relay (bench.py methodology)
    @jax.jit
    def _probe(x):
        return x + 1.0

    float(_probe(jnp.float32(0.0)))
    rtt = float(np.median([_timed(lambda: float(_probe(jnp.float32(0.0))))
                           for _ in range(5)]))

    # Image-independent ray keys, computed ONCE per candidate set: the rays
    # are fixed across this object's frames (reference test.py:84 receives
    # the same set per frame yet recomputes the chain per image — measured
    # ~77% of per-image latency, extra/decompose_pose.py). With the exact
    # banked XLA path scores are bit-identical to the unbanked path; on
    # TPU the default "bf16" mode (bf16-emitted logits matmul,
    # id_module._bank_scoring_mode) scores within ~7e-5 instead —
    # IFFNERF_BANK_SCORING=exact restores bit-identity. The
    # negated-direction sign below applies here too.
    from iffnerf_tpu.pose.id_module import ray_bank

    bank = ray_bank(id_params, id_config, rays_ori, -rays_dirs, rays_rgb)

    t0 = time.perf_counter()
    warmed = False
    for img_idx in range(n_images):
        pose = jnp.asarray(dataset.poses[img_idx])
        obs = jnp.asarray(dataset.all_rgbs[img_idx]).reshape(h, w, -1)
        if obs.shape[-1] == 4:
            mask_img = obs[..., -1]
            obs_img = obs[..., :3] * obs[..., -1:] + (1 - obs[..., -1:])
        else:
            mask_img = jnp.ones(obs.shape[:-1], obs.dtype)
            obs_img = obs

        # Score AND solve with the NEGATED generator directions — the sign
        # the ID module was trained on (pose_estimation/train.py:98). The
        # reference's test path queries the un-negated directions
        # (test.py:84-91), i.e. embeddings it never trained — measured
        # recall ~0; with the trained sign the solver geometry is identical
        # (line intersection is sign-invariant; exclude_negatives and the
        # watch direction want camera-pointing rays, which -dirs are).
        def _estimate():
            if mesh is not None:
                return estimate_pose_single_sharded(
                    id_params, id_config, obs_img, mask_img, rays_ori,
                    -rays_dirs, rays_rgb, model_up, mesh=mesh, k=k,
                    bank=bank,
                )
            return estimate_pose_single_banked(
                id_params, id_config, obs_img, mask_img, bank, rays_ori,
                -rays_dirs, model_up, k=k,
            )

        if not warmed:  # compile outside the per-image timing
            np.asarray(_estimate()[0])
            warmed = True
        t_img = time.perf_counter()
        c2w, scores, idx, weights = _estimate()
        np.asarray(c2w)  # forced completion of the whole program
        elapsed_ms = max(time.perf_counter() - t_img - rtt, 0.0) * 1000.0

        avg_score, recall = -1.0, -1.0
        if compute_loss:
            loss, target = distance_based_score_loss(
                scores, pose, rays_ori, -rays_dirs,
                id_config.backbone_wh[0] * id_config.backbone_wh[1],
            )
            avg_score = float(loss)
            target_idx = jax.lax.top_k(target, k)[1]
            recall = float(
                jnp.isin(target_idx, idx).sum() / target_idx.shape[0]
            )
        avg_loss_scores.append(avg_score)
        recalls.append(recall)

        if save and (img_idx == 0 or save_all):
            import os

            dump = {
                "gt_pose": np.asarray(pose),
                "camera_intrinsic": np.asarray(
                    dataset.K[0] if getattr(dataset, "K", None) is not None
                    else np.eye(3)
                ),
                "all_rays_ori": np.asarray(rays_ori),
                "all_rays_dirs": np.asarray(rays_dirs),
                "all_rays_rgb": np.asarray(rays_rgb),
                "obs_img": np.asarray(obs_img),
                "mask_img": np.asarray(mask_img),
                "topk_nonunique_ray_idx": np.asarray(idx),
                "topk_nonunique_weights": np.asarray(weights),
                "all_predict_weights": np.asarray(scores),
                "model_up": np.asarray(model_up),
            }
            if compute_loss:
                dump["all_target_weights"] = np.asarray(target)
                dump["loss"] = avg_score
                dump["recall"] = recall
            dump.update(_solver_debug_intermediates(
                scores, idx, weights, rays_ori, -rays_dirs, model_up
            ))
            os.makedirs(save_dir, exist_ok=True)
            np.savez(
                os.path.join(save_dir, f"sample_results_{img_idx}.npz"),
                **dump,
            )
            log_fn("Sample result saved")

        if inerf_refinement and nerf is not None:
            from iffnerf_tpu.inerf import estimate_pose_inerf

            nerf_config, nerf_params, nerf_mask = nerf
            obs4 = np.concatenate(
                [np.asarray(obs_img), np.asarray(mask_img)[..., None]], -1
            )
            _, c2w, _ = estimate_pose_inerf(
                np.asarray(c2w), obs4, np.asarray(dataset.K[0]),
                nerf_config, nerf_params, nerf_mask,
                n_iters=800, lrate=0.02, dice_loss=True,
                sampling_strategy="random",
            )
            c2w = jnp.asarray(c2w)

        gt_pos = pose[:3, 3]
        pred_pos = c2w[:3, 3]
        translation_errors.append(
            float(compute_translation_error(gt_pos, pred_pos))
        )
        angular_errors.append(
            float(compute_angular_error(pose[:3, :3], c2w[:3, :3]))
        )

        results.append(
            {
                "sequence_id": sequence_id,
                "category_name": "id_net",
                "frame_id": img_idx,
                "loss": float(jnp.mean(weights)),
                "scores_loss": avg_score,
                "recall": recall,
                "total_optimization_time_in_ms": elapsed_ms,
                "pred_c2w": np.asarray(c2w).tolist(),
                "gt_c2w": np.asarray(pose).tolist(),
            }
        )

    total = time.perf_counter() - t0
    log_fn(f"Average loss score: {np.mean(avg_loss_scores)}")
    log_fn(f"Average Recall: {np.mean(recalls)}")
    log_fn(f"Time per element: {total / max(n_images, 1)}")
    avg_t = float(np.mean(translation_errors))
    avg_a = float(np.mean(angular_errors))
    log_fn(f"Translation Error: {avg_t}")
    log_fn(f"Angular Error: {avg_a}")
    return results, avg_t, avg_a, float(np.mean(avg_loss_scores)), float(
        np.mean(recalls)
    )
