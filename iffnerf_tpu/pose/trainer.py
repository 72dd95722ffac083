"""ID-module trainer (reference pose_estimation/train.py:8-234).

Parity: 1500 iterations, gradient accumulation over 32 random train images
per optimizer step, Adam with per-module LRs (ray preprocessor + attention
4e-3, backbone 1e-3), candidate-ray-set renewal every 10 iterations,
NaN-loss skip, periodic pose eval on train+val. Trains with the *negated*
ray directions (train.py:98) — the reference's (asymmetric) convention.

TPU-first: the 32-image accumulation is one jitted ``lax.scan`` — grads are
summed on device and applied once, so an optimizer step is a single XLA
program instead of 32 backward passes + a host loop.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from iffnerf_tpu.pose.id_module import (
    IDConfig,
    distance_based_score_loss,
)


def make_id_optimizer(params):
    labels = {
        "backbone": "backbone",
        "ray_mlp": "fast",
        "ray_mlp2": "fast",
        "q_proj": "fast",
        "k_proj": "fast",
    }
    tx = optax.multi_transform(
        {"fast": optax.adam(4.0e-3), "backbone": optax.adam(1.0e-3)},
        {k: labels[k] for k in params},
    )
    return tx


def _make_id_step_core(config: IDConfig, tx, accum_steps: int):
    """The un-jitted optimizer-step body shared by ``make_id_train_step``
    (one dispatch per step) and ``make_id_train_scan`` (one dispatch per
    renewal period): scan over ``accum_steps`` images, sum grads, skip
    non-finite contributions (train.py:114-115), apply Adam.

    TPU optimization over the reference: the candidate-ray embedding (the
    540k-ray MLP, the step's dominant FLOPs) does not depend on the image,
    so it is computed ONCE per optimizer step; per-image losses take the
    embedding as an input, their cotangents accumulate across the scan, and
    one explicit VJP pulls them back through the ray MLP — mathematically
    identical to the reference's 32 independent backward passes."""
    import math as _math

    from iffnerf_tpu.pose.id_module import image_features, ray_features

    def per_image_loss(params, feats_rays, img, mask, pose, rays_ori,
                       rays_dirs):
        feats_w_pe, patch_valid, _ = image_features(params, config, img, mask)
        dt = jnp.dtype(config.compute_dtype)
        q = feats_w_pe.astype(dt) @ params["q_proj"]["w"].astype(dt) + \
            params["q_proj"]["b"].astype(dt)
        k = feats_rays.astype(dt) @ params["k_proj"]["w"].astype(dt) + \
            params["k_proj"]["b"].astype(dt)
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        attention = jax.nn.softmax(logits / _math.sqrt(q.shape[-1]), axis=-1)
        scores = jnp.sum(
            jnp.where(patch_valid[:, None], attention, 0.0), axis=0
        )
        loss, _ = distance_based_score_loss(
            scores, pose, rays_ori, rays_dirs, jnp.sum(patch_valid)
        )
        return loss

    grad_fn = jax.value_and_grad(per_image_loss, argnums=(0, 1))

    def step(params, opt_state, imgs, masks, poses, rays_ori, rays_dirs,
             rays_rgb):
        feats_rays, ray_vjp = jax.vjp(
            lambda p: ray_features(p, config, rays_ori, rays_dirs, rays_rgb),
            params,
        )

        def body(carry, batch):
            grads_acc, dfeats_acc, loss_acc = carry
            img, mask, pose = batch
            loss, (g_params, g_feats) = grad_fn(
                params, feats_rays, img, mask, pose, rays_ori, rays_dirs
            )
            ok = jnp.isfinite(loss)
            g_params = jax.tree.map(lambda g: jnp.where(ok, g, 0.0), g_params)
            g_feats = jnp.where(ok, g_feats, 0.0)
            return (
                jax.tree.map(jnp.add, grads_acc, g_params),
                dfeats_acc + g_feats,
                loss_acc + jnp.where(ok, loss, 0.0),
            ), None

        zero = jax.tree.map(jnp.zeros_like, params)
        (grads, dfeats, loss_sum), _ = jax.lax.scan(
            body, (zero, jnp.zeros_like(feats_rays), 0.0),
            (imgs, masks, poses),
        )
        (ray_grads,) = ray_vjp(dfeats)
        grads = jax.tree.map(jnp.add, grads, ray_grads)
        grads = jax.tree.map(lambda g: g / accum_steps, grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_sum / accum_steps

    return step


def make_id_train_step(config: IDConfig, tx, accum_steps: int):
    """One jitted optimizer step (see ``_make_id_step_core``)."""
    return functools.partial(jax.jit, donate_argnums=(0, 1))(
        _make_id_step_core(config, tx, accum_steps)
    )


def make_id_train_scan(config: IDConfig, tx, accum_steps: int, *,
                       rgba: bool):
    """Device-resident multi-step ID-module training: a whole chunk of
    optimizer steps (typically one ray-renewal period, 10 steps) as ONE
    ``lax.scan`` inside one jit. One dispatch per chunk instead of one per
    step — through a relay-attached TPU the per-step path's ~200-buffer
    donated ViT pytree costs seconds of rebinding PER DISPATCH (measured
    20.3 s/it host wall vs 0.43 s/it device time, BASELINE round 4), and
    even locally it removes 10 host round trips (SURVEY §3.3's
    per-iteration staging is the pattern being replaced).

    Numerically identical to ``make_id_train_step`` called in a loop with
    the same image-index rows: the image gather + RGBA blend moves
    in-graph (same blend expression as ``train_id_module``'s host path,
    bg=1), everything else is the shared step core.

    Returns run(params, opt_state, imgs_pool [N,H,W,C], poses_pool [N,4,4],
    img_idx [K, accum], rays_ori, rays_dirs, rays_rgb)
    -> (params, opt_state, losses [K])."""
    core = _make_id_step_core(config, tx, accum_steps)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run(params, opt_state, imgs_pool, poses_pool, img_idx, rays_ori,
            rays_dirs, rays_rgb):
        def step_body(carry, idx_row):
            params, opt_state = carry
            batch = jnp.take(imgs_pool, idx_row, axis=0)
            if rgba:
                masks = batch[..., -1] > 0.3
                imgs = batch[..., :3] * batch[..., -1:] + (1 - batch[..., -1:])
            else:
                masks = jnp.ones(batch.shape[:-1], bool)
                imgs = batch
            poses = jnp.take(poses_pool, idx_row, axis=0)
            params, opt_state, loss = core(
                params, opt_state, imgs, masks, poses, rays_ori, rays_dirs,
                rays_rgb,
            )
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step_body, (params, opt_state), img_idx
        )
        return params, opt_state, losses

    return run


def train_id_module(key, id_params, id_config: IDConfig, rays_generator,
                    train_dataset, val_dataset, sequence_id: str = "",
                    n_iterations: int = 1500,
                    gradient_accumulation_steps: int = 32,
                    renewal_every_n_iterations: int = 10,
                    val_every_n_iterations: int = 20,
                    start_iterations: int = 0, log_fn=print,
                    eval_fn=None, scan_steps: int = 0):
    """Returns trained id_params. ``rays_generator()`` yields
    (rays_ori, rays_dirs, rays_rgb); ``eval_fn(params, rays)`` optional
    periodic pose eval hook.

    ``scan_steps > 0`` runs chunks of up to that many optimizer steps as
    one on-device ``lax.scan`` dispatch (``make_id_train_scan``; chunks
    break at ray-renewal and eval boundaries, so ``scan_steps=10`` = one
    dispatch per renewal period). Same image-index stream, same math."""
    from iffnerf_tpu.train.trainer import make_summary_writer

    writer = make_summary_writer("runs")
    tx = make_id_optimizer(id_params)
    opt_state = tx.init(id_params)

    w, h = train_dataset.img_wh
    all_rgbs = np.asarray(train_dataset.all_rgbs).reshape(
        len(train_dataset.all_rgbs), h, w, -1
    )
    poses = np.asarray(train_dataset.poses)
    rgba = all_rgbs.shape[-1] == 4

    if scan_steps > 0:
        # the scan path keeps the WHOLE image pool device-resident (the
        # scan body indexes it on device); cap the HBM it may claim and
        # fall back to the per-step path (which stages one accum batch per
        # dispatch) for oversized pools
        pool_gb = all_rgbs.nbytes / 1e9
        max_gb = float(os.environ.get("IFFNERF_ID_POOL_GB", "4"))
        if pool_gb > max_gb:
            print(
                f"[id-train] image pool {pool_gb:.1f} GB exceeds the "
                f"device-resident budget ({max_gb} GB, IFFNERF_ID_POOL_GB)"
                " — falling back to per-step dispatch (scan_steps=0)"
            )
            scan_steps = 0
    if scan_steps > 0:
        scan_fn = make_id_train_scan(
            id_config, tx, gradient_accumulation_steps, rgba=rgba
        )
        imgs_pool = jnp.asarray(all_rgbs)
        poses_pool = jnp.asarray(poses)
    else:
        step_fn = make_id_train_step(
            id_config, tx, gradient_accumulation_steps
        )

    # model_up = mean of train-pose Y columns (pose_estimation/train.py:60)
    model_up = jnp.asarray(poses[:, :3, 1].mean(axis=0))

    rays = None
    rng = np.random.default_rng(
        int(jax.random.randint(key, (), 0, 2 ** 31 - 1))
    )
    running = 0.0

    def boundary_dist(it):
        """Steps until the next renewal/eval boundary after ``it``."""
        d = renewal_every_n_iterations - it % renewal_every_n_iterations
        if eval_fn is not None:
            # eval fires after step it when (it+1) % val == 0
            d = min(d, val_every_n_iterations - it % val_every_n_iterations)
        return min(d, n_iterations - it)

    it = start_iterations
    while it < n_iterations:
        if (rays is None) or it % renewal_every_n_iterations == 0:
            rays_ori, rays_dirs, rays_rgb = rays_generator()
            rays = (jnp.asarray(rays_ori), jnp.asarray(rays_dirs),
                    jnp.asarray(rays_rgb))

        chunk = min(scan_steps, boundary_dist(it)) if scan_steps > 0 else 1
        idx_rows = np.stack([
            rng.integers(0, all_rgbs.shape[0], gradient_accumulation_steps)
            for _ in range(chunk)
        ])

        if scan_steps > 0:
            id_params, opt_state, losses = scan_fn(
                id_params, opt_state, imgs_pool, poses_pool,
                jnp.asarray(idx_rows, jnp.int32), rays[0], -rays[1], rays[2],
            )
            losses = np.asarray(losses)
        else:
            batch = all_rgbs[idx_rows[0]]
            if rgba:
                masks = batch[..., -1] > 0.3
                imgs = batch[..., :3] * batch[..., -1:] + (1 - batch[..., -1:])
            else:
                masks = np.ones(batch.shape[:-1], bool)
                imgs = batch
            id_params, opt_state, loss = step_fn(
                id_params, opt_state, jnp.asarray(imgs), jnp.asarray(masks),
                jnp.asarray(poses[idx_rows[0]]), rays[0], -rays[1], rays[2],
            )
            losses = np.asarray([float(loss)])

        for j, loss_j in enumerate(losses):
            running += float(loss_j)
            writer.add_scalar("train/loss", float(loss_j),
                              global_step=it + j)
            if (it + j + 1) % 20 == 0:
                log_fn(f"[{it + j}] loss: {running / 20}")
                running = 0.0
        it += len(losses)
        if eval_fn is not None and it % val_every_n_iterations == 0:
            eval_fn(id_params, rays, model_up)

    writer.close()
    return id_params, model_up
