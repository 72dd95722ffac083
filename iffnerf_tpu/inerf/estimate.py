"""iNeRF: iterative photometric pose refinement against a frozen field
(reference inerf/estimate_pose_inerf.py:23-195, inerf/inerf.py:39-104,
inerf/dice_loss.py:8-75).

TPU-first recast (SURVEY.md §3.7): the reference's 800-iteration host loop
re-samples pixels with numpy, rebuilds rays in torch, and syncs the pose to
CPU every step. Here the entire optimization is ONE ``lax.scan`` inside one
jit: pixel sampling (jax.random), ray regeneration from the current se(3)
pose, rendering, loss, and the Adam update all stay on device; only the
SIFT point-of-interest detection (cv2, inherently host-side) runs before
the program launches.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax

from iffnerf_tpu.models.field import AlphaMask, FieldConfig
from iffnerf_tpu.models.render import render_rays
from iffnerf_tpu.pose.isocell import vec2ss_matrix


def find_poi(img_rgb: np.ndarray) -> np.ndarray:
    """SIFT keypoints (host-side, cv2; reference inerf/inerf.py:39-49).
    Returns unique integer xy coordinates [N, 2]."""
    import cv2

    gray = (cv2.cvtColor(img_rgb, cv2.COLOR_RGB2GRAY) * 255.0).astype(
        np.uint8
    )
    keypoints = cv2.SIFT_create().detect(gray, None)
    if not keypoints:
        return np.zeros((0, 2), dtype=np.int64)
    xy = np.array([kp.pt for kp in keypoints]).astype(np.int64)
    return np.unique(xy, axis=0)


def camera_transfer(w, v, theta, start_pose):
    """Exponential-map pose update (reference CameraTransfer,
    inerf/inerf.py:64-91): T = exp([w]θ-style Rodrigues, V(θ)v) @ start."""
    wss = vec2ss_matrix(w)
    wss2 = wss @ wss
    eye = jnp.eye(3, dtype=start_pose.dtype)
    rot = eye + jnp.sin(theta) * wss + (1.0 - jnp.cos(theta)) * wss2
    trans = (
        eye * theta + (1.0 - jnp.cos(theta)) * wss
        + (theta - jnp.sin(theta)) * wss2
    ) @ v
    exp_i = jnp.zeros((4, 4), dtype=start_pose.dtype)
    exp_i = exp_i.at[:3, :3].set(rot)
    exp_i = exp_i.at[:3, 3].set(trans)
    exp_i = exp_i.at[3, 3].set(1.0)
    return exp_i @ start_pose


def soft_dice_loss(probs_logits, labels, p: float = 1.0, smooth: float = 1.0):
    """Soft-Dice on sigmoid(logits) (reference inerf/dice_loss.py:34-57;
    autodiff replaces its hand-written backward)."""
    probs = jax.nn.sigmoid(probs_logits.reshape(-1))
    labels = labels.reshape(-1)
    numer = 2.0 * jnp.sum(probs * labels) + smooth
    denor = jnp.sum(probs ** p + labels ** p) + smooth
    return 1.0 - numer / denor


def _build_candidates(obs_img: np.ndarray, sampling_strategy: str,
                      kernel_size: int, dil_iter: int, batch_size: int):
    """Host-side pixel-candidate set per strategy
    (reference estimate_pose_inerf.py:44-132)."""
    h, w = obs_img.shape[:2]
    coords = np.stack(
        np.meshgrid(np.arange(w), np.arange(h)), -1
    ).astype(np.int64)  # [H, W, 2] (x, y)

    if sampling_strategy == "random":
        return coords.reshape(-1, 2)
    poi = find_poi(obs_img[..., :3].astype(np.float32))
    if sampling_strategy == "interest_points":
        if poi.shape[0] >= batch_size:
            return poi
        # pad with non-POI pixels like the reference (:119-124)
        mask = np.ones((h, w), bool)
        if poi.shape[0]:
            mask[poi[:, 1], poi[:, 0]] = False
        rest = coords[mask]
        return np.concatenate([poi, rest], axis=0)
    if sampling_strategy == "interest_regions":
        import cv2

        regions = np.zeros((h, w), np.uint8)
        if poi.shape[0]:
            regions[poi[:, 1], poi[:, 0]] = 1
        regions = cv2.dilate(
            regions, np.ones((kernel_size, kernel_size), np.uint8),
            iterations=dil_iter,
        ).astype(bool)
        cand = coords[regions]
        return cand if cand.shape[0] else coords.reshape(-1, 2)
    raise ValueError(f"Unknown sampling strategy {sampling_strategy}")


def estimate_pose_inerf(start_pose, obs_img: np.ndarray, cam_k,
                        config: FieldConfig, params, mask: AlphaMask | None,
                        sampling_strategy: str = "interest_regions",
                        lrate: float = 0.02, batch_size: int = 1024,
                        kernel_size: int = 35, dil_iter: int = 1,
                        color_bkgd_aug: str = "random", n_iters: int = 1000,
                        dice_loss: bool = False, seed: int = 0,
                        return_history: bool = False):
    """Returns (final_rgb_loss, refined c2w [4,4], pose history [n,4,4] | None).

    obs_img is [H, W, 4] RGBA in [0,1] (alpha = object mask)."""
    h, w = obs_img.shape[:2]
    candidates = _build_candidates(
        obs_img, sampling_strategy, kernel_size, dil_iter, batch_size
    )

    from iffnerf_tpu.geometry import get_ray_directions_Ks

    k_arr = jnp.asarray(cam_k, jnp.float32).reshape(1, 3, 3)
    ori_dirs, dx, dy = get_ray_directions_Ks(h, w, k_arr)
    ori_dirs, dx, dy = ori_dirs[0], dx[0], dy[0]
    dirs_norm = ori_dirs / jnp.linalg.norm(ori_dirs, axis=-1, keepdims=True)

    obs = jnp.asarray(obs_img, jnp.float32)
    cand = jnp.asarray(candidates)
    start = jnp.asarray(start_pose, jnp.float32)

    loss_val, pose, history = _run(
        config, params, mask, mask is not None, start, obs, cand, dirs_norm,
        ori_dirs, dx, dy, float(lrate), jax.random.PRNGKey(seed), n_iters,
        batch_size, color_bkgd_aug, dice_loss,
    )
    history = np.asarray(history) if return_history else None
    return float(loss_val), np.asarray(pose), history


@functools.partial(
    jax.jit,
    static_argnames=("config", "has_mask", "lrate", "n_iters", "batch_size",
                     "color_bkgd_aug", "dice_loss"),
)
def _run(config, params, mask, has_mask, start_pose, obs, cand, dirs_norm,
         ori_dirs, dx, dy, lrate, key, n_iters, batch_size, color_bkgd_aug,
         dice_loss):
    mask_arg = mask if has_mask else None
    # LR decays 0.8^(k/100) (reference estimate_pose_inerf.py:185-187)
    tx = optax.adam(optax.exponential_decay(lrate, 100, 0.8),
                    b1=0.9, b2=0.999)
    init_w = 1e-6 * jax.random.normal(jax.random.fold_in(key, 1), (3,))
    init_v = 1e-6 * jax.random.normal(jax.random.fold_in(key, 2), (3,))
    init_t = 1e-6 * jax.random.normal(jax.random.fold_in(key, 3), ())
    pose_params = {"w": init_w, "v": init_v, "theta": init_t}
    opt_state = tx.init(pose_params)

    dxn = jnp.linalg.norm(dx - ori_dirs, axis=-1)
    dyn = jnp.linalg.norm(dy - ori_dirs, axis=-1)
    radii_cam = (0.5 * (dxn + dyn))[..., None] * (2.0 / jnp.sqrt(12.0))

    def loss_fn(pose_params, batch_xy, bg_color):
        pose = camera_transfer(
            pose_params["w"], pose_params["v"], pose_params["theta"],
            start_pose,
        )
        bx, by = batch_xy[:, 0], batch_xy[:, 1]
        d_cam = dirs_norm[by, bx]
        rays_d = d_cam @ pose[:3, :3].T
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
        radii = radii_cam[by, bx]
        rays = jnp.concatenate([rays_o, rays_d, radii], axis=-1)

        target = obs[by, bx]
        rgb_t, alpha_t = target[:, :3], target[:, 3:]
        target_rgb = rgb_t * alpha_t + bg_color * (1.0 - alpha_t)

        rgb, _, acc, _, _, _ = render_rays(
            config, params, mask_arg, rays, is_train=False,
            bg_color=bg_color,
        )
        rgb_loss = jnp.mean(jnp.square(rgb - target_rgb))
        total = rgb_loss
        if dice_loss:
            op = jnp.clip(acc, 1e-3, 1.0 - 1e-3)
            total = total + soft_dice_loss(op[:, None], alpha_t)
        return total, rgb_loss

    def step(carry, it):
        pose_params, opt_state, key = carry
        key, sk, bk = jax.random.split(key, 3)
        idx = jax.random.choice(
            sk, cand.shape[0], (batch_size,), replace=False
        )
        batch_xy = cand[idx]
        if color_bkgd_aug == "white":
            bg = jnp.ones(3)
        elif color_bkgd_aug == "random":
            bg = jax.random.uniform(bk, (3,))
        else:
            bg = jnp.zeros(3)
        (_, rgb_loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            pose_params, batch_xy, bg
        )
        updates, opt_state = tx.update(grads, opt_state, pose_params)
        pose_params = optax.apply_updates(pose_params, updates)
        pose = camera_transfer(
            pose_params["w"], pose_params["v"], pose_params["theta"],
            start_pose,
        )
        return (pose_params, opt_state, key), (rgb_loss, pose)

    (pose_params, _, _), (losses, poses) = jax.lax.scan(
        step, (pose_params, opt_state, key), jnp.arange(n_iters)
    )
    final_pose = camera_transfer(
        pose_params["w"], pose_params["v"], pose_params["theta"], start_pose
    )
    return losses[-1], final_pose, poses
