"""Scan-of-steps ID-module training (make_id_train_scan) fidelity.

One lax.scan dispatch over K optimizer steps must reproduce the per-step
path exactly: same image-index rows -> same parameter trajectory. Mirrors
tests/test_scan_fidelity.py for the field trainer (reference hot loop:
pose_estimation/train.py:79-123)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from iffnerf_tpu.pose import IDConfig, init_id_module
from iffnerf_tpu.pose.trainer import (
    make_id_train_scan,
    make_id_train_step,
    train_id_module,
)
from iffnerf_tpu.pose.vit import ViTConfig

RNG = np.random.default_rng(11)

# Parameters the score loss is EXACTLY invariant to: a bias added to every
# ray's key shifts each patch's logit row by a constant, and softmax along
# the ray axis is shift-invariant — so d(loss)/d(k_proj.b) == 0 and likewise
# for the final ray-MLP bias (it reaches k only through k_proj.w as another
# all-ray-constant shift). Their "gradients" are pure f32 cancellation
# noise, which Adam normalizes to ~lr-sized drift in directions that cannot
# affect the model. Excluded from trajectory comparison; bounded separately.
_INVARIANT = ("['k_proj']['b']", "['ray_mlp2'][1]['b']")


def _assert_params_close(p_ref, p_new, steps, lr):
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(p_ref), jax.tree.leaves(p_new)
    ):
        name = jax.tree_util.keystr(path)
        a, b = np.asarray(a), np.asarray(b)
        if name in _INVARIANT:
            # drift bounded by the Adam step budget
            assert np.abs(a - b).max() <= 2.1 * steps * lr, name
        else:
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=max(5e-5, 0.1 * lr),
                                       err_msg=name)


def _tiny_problem(n_imgs=4, n_rays=256, rgba=True):
    c = 4 if rgba else 3
    imgs = RNG.uniform(0, 1, (n_imgs, 48, 48, c)).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (n_imgs, 1, 1))
    poses[:, 2, 3] = 3.0 + RNG.uniform(0, 1, n_imgs)
    ori = RNG.uniform(-0.5, 0.5, (n_rays, 3)).astype(np.float32)
    d = RNG.standard_normal((n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rgb = RNG.uniform(0, 1, (n_rays, 3)).astype(np.float32)
    return imgs, poses, ori, d.astype(np.float32), rgb


def test_scan_matches_per_step_path():
    cfg = IDConfig(backbone=ViTConfig(depth=1))
    params = init_id_module(jax.random.PRNGKey(3), cfg)
    tx = optax.adam(1e-3)
    accum, k_steps = 2, 3
    imgs, poses, ori, d, rgb = _tiny_problem()

    idx_rows = RNG.integers(0, imgs.shape[0], (k_steps, accum))

    # per-step path with host-side RGBA blending (train_id_module's loop)
    step = make_id_train_step(cfg, tx, accum)
    p1, o1 = jax.tree.map(jnp.array, params), tx.init(params)
    losses1 = []
    for row in idx_rows:
        batch = imgs[row]
        masks = batch[..., -1] > 0.3
        blended = batch[..., :3] * batch[..., -1:] + (1 - batch[..., -1:])
        p1, o1, loss = step(
            p1, o1, jnp.asarray(blended), jnp.asarray(masks),
            jnp.asarray(poses[row]), jnp.asarray(ori), jnp.asarray(d),
            jnp.asarray(rgb),
        )
        losses1.append(float(loss))

    # scan path: in-graph gather + blend
    scan = make_id_train_scan(cfg, tx, accum, rgba=True)
    p2, o2 = jax.tree.map(jnp.array, params), tx.init(params)
    p2, o2, losses2 = scan(
        p2, o2, jnp.asarray(imgs), jnp.asarray(poses),
        jnp.asarray(idx_rows, jnp.int32), jnp.asarray(ori), jnp.asarray(d),
        jnp.asarray(rgb),
    )

    np.testing.assert_allclose(np.asarray(losses2), losses1, rtol=1e-5)
    # XLA fuses the scan body differently from the standalone step program:
    # identical math, different f32 summation order -> ~1e-6-scale grad
    # drift. Tolerance catches wiring errors (wrong indices/blend would be
    # O(1e-2)), not f32 noise.
    _assert_params_close(p1, p2, k_steps, 1e-3)


class _FakeDataset:
    def __init__(self, imgs, poses):
        n, h, w, c = imgs.shape
        self.img_wh = (w, h)
        self.all_rgbs = imgs.reshape(n, h * w, c)
        self.poses = poses


def test_train_id_module_scan_steps_trajectory():
    """The full training loop with scan_steps>0 must reproduce scan_steps=0
    exactly: same rng stream, same renewal cadence, same params."""
    cfg = IDConfig(backbone=ViTConfig(depth=1))
    imgs, poses, ori, d, rgb = _tiny_problem()
    ds = _FakeDataset(imgs, poses)

    calls = {"a": 0, "b": 0}

    def gen_a():
        calls["a"] += 1
        return ori, d, rgb

    def gen_b():
        calls["b"] += 1
        return ori, d, rgb

    common = dict(
        n_iterations=5, gradient_accumulation_steps=2,
        renewal_every_n_iterations=2, log_fn=lambda *_: None,
    )
    params = init_id_module(jax.random.PRNGKey(5), cfg)
    key = jax.random.PRNGKey(9)
    p_loop, up_loop = train_id_module(
        key, jax.tree.map(jnp.array, params), cfg, gen_a, ds, ds,
        scan_steps=0, **common)
    p_scan, up_scan = train_id_module(
        key, jax.tree.map(jnp.array, params), cfg, gen_b, ds, ds,
        scan_steps=10, **common)

    assert calls["a"] == calls["b"] == 3  # renewals at it 0, 2, 4
    np.testing.assert_allclose(np.asarray(up_loop), np.asarray(up_scan))
    _assert_params_close(p_loop, p_scan, 5, 4e-3)
