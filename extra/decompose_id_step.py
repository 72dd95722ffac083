"""Stage decomposition of the ID-module optimizer step at reference scale.

bench_id_train.py times the production step as host dispatches, which
through the axon relay can be inflated by per-dispatch stalls. This script
times each stage with the reps-in-graph method (decompose_pose.py): an
on-device fori_loop repeats the stage, so the single host pull amortizes
any relay overhead and the number is device time.

Stages (ViT-S/14 depth D, R candidate rays, A accum images):

  a. ray_features fwd (R rays)                        — once per step
  b. ray_features VJP pullback                        — once per step
  c. image_features (preproc + ViT + PE + select)     — per image
  d. per-image loss fwd (c + QK logits + softmax sum) — per image
  e. per-image loss grad (value_and_grad of d)        — per image
  f. scan of A accumulated grads (the production body)
  g. adam update alone

Usage: python extra/decompose_id_step.py [--depth 12] [--accum 32]
           [--gen_points 20000] [--reps 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iffnerf_tpu.runtime import setup as _runtime_setup

_runtime_setup()

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _pull(x):
    return float(np.asarray(x))


def bench(label, make_body, reps=4, base=0.0, consts=(), timed=3):
    @jax.jit
    def looped(*consts):
        def body(i, carry):
            return carry + make_body(i, *consts)

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    _pull(looped(*consts))
    ts = []
    for _ in range(timed):
        t0 = time.perf_counter()
        _pull(looped(*consts))
        ts.append(time.perf_counter() - t0)
    dt = (float(np.median(ts)) - base) / reps * 1e3
    print(f"{label:58s} {dt:9.2f} ms  (reps={reps})", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--accum", type=int, default=32)
    ap.add_argument("--gen_points", type=int, default=20000)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import math

    from iffnerf_tpu.pose import IDConfig, init_id_module
    from iffnerf_tpu.pose.id_module import (
        distance_based_score_loss,
        image_features,
        ray_features,
    )
    from iffnerf_tpu.pose.trainer import make_id_optimizer
    from iffnerf_tpu.pose.vit import ViTConfig

    icfg = IDConfig(backbone=ViTConfig(depth=args.depth))
    params = init_id_module(jax.random.PRNGKey(7), icfg)

    n_rays = args.gen_points * 27
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    rays_ori = jax.random.normal(ks[0], (n_rays, 3))
    rays_dirs = jax.random.normal(ks[1], (n_rays, 3))
    rays_dirs = rays_dirs / jnp.linalg.norm(rays_dirs, axis=-1, keepdims=True)
    rays_rgb = jax.random.uniform(ks[2], (n_rays, 3))
    img = jax.random.uniform(ks[3], (800, 800, 3))
    msk = jnp.ones((800, 800), bool)
    pose = jnp.eye(4).at[2, 3].set(4.0)
    imgs = jax.random.uniform(ks[4], (args.accum, 800, 800, 3))
    msks = jnp.ones((args.accum, 800, 800), bool)
    poses = jnp.tile(pose[None], (args.accum, 1, 1))
    jax.block_until_ready(rays_rgb)

    base = 0.0
    _pull(jnp.float32(0))
    t0 = time.perf_counter()
    for _ in range(10):
        _pull(jnp.float32(0))
    base = (time.perf_counter() - t0) / 10
    print(f"scalar pull rtt {base * 1e3:.1f} ms", flush=True)
    reps = args.reps

    # ---- a. ray features fwd ----
    def rf(i, params, rays_ori, rays_dirs, rays_rgb):
        out = ray_features(
            params, icfg, rays_ori.at[0, 0].add(jnp.float32(i) * 1e-12),
            rays_dirs, rays_rgb)
        return jnp.sum(out)

    bench(f"a. ray_features fwd ({n_rays} rays)", rf, reps=reps, base=base,
          consts=(params, rays_ori, rays_dirs, rays_rgb))

    # ---- b. ray features VJP ----
    def rvjp(i, params, rays_ori, rays_dirs, rays_rgb):
        feats, vjp = jax.vjp(
            lambda p: ray_features(
                p, icfg, rays_ori.at[0, 0].add(jnp.float32(i) * 1e-12),
                rays_dirs, rays_rgb),
            params)
        (g,) = vjp(jnp.ones_like(feats))
        return jnp.sum(feats) + sum(
            jnp.sum(l) for l in jax.tree.leaves(g))

    bench("b. ray_features fwd+VJP", rvjp, reps=reps, base=base,
          consts=(params, rays_ori, rays_dirs, rays_rgb))

    # ---- c. image features ----
    def imf(i, params, img, msk):
        f, pv, _ = image_features(
            params, icfg, img.at[0, 0, 0].add(jnp.float32(i) * 1e-12), msk)
        return jnp.sum(f) + jnp.sum(pv)

    bench(f"c. image_features (800x800 -> ViT d{args.depth})", imf,
          reps=reps, base=base, consts=(params, img, msk))

    # ---- d/e. per-image loss ----
    def loss_of(params, feats_rays, img, msk, pose, rays_ori, rays_dirs):
        feats_w_pe, patch_valid, _ = image_features(params, icfg, img, msk)
        dt = jnp.dtype(icfg.compute_dtype)
        q = feats_w_pe.astype(dt) @ params["q_proj"]["w"].astype(dt) + \
            params["q_proj"]["b"].astype(dt)
        k = feats_rays.astype(dt) @ params["k_proj"]["w"].astype(dt) + \
            params["k_proj"]["b"].astype(dt)
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        attention = jax.nn.softmax(logits / math.sqrt(q.shape[-1]), axis=-1)
        scores = jnp.sum(
            jnp.where(patch_valid[:, None], attention, 0.0), axis=0)
        loss, _ = distance_based_score_loss(
            scores, pose, rays_ori, rays_dirs, jnp.sum(patch_valid))
        return loss

    feats_rays = ray_features(params, icfg, rays_ori, rays_dirs, rays_rgb)
    jax.block_until_ready(feats_rays)

    def lf(i, params, feats_rays, img, msk, rays_ori, rays_dirs):
        return loss_of(params, feats_rays,
                       img.at[0, 0, 0].add(jnp.float32(i) * 1e-12), msk,
                       pose, rays_ori, rays_dirs)

    bench("d. per-image loss fwd", lf, reps=reps, base=base,
          consts=(params, feats_rays, img, msk, rays_ori, rays_dirs))

    gfn = jax.value_and_grad(loss_of, argnums=(0, 1))

    def lg(i, params, feats_rays, img, msk, rays_ori, rays_dirs):
        loss, (gp, gf) = gfn(params, feats_rays,
                             img.at[0, 0, 0].add(jnp.float32(i) * 1e-12),
                             msk, pose, rays_ori, rays_dirs)
        return loss + jnp.sum(gf) + sum(
            jnp.sum(l) for l in jax.tree.leaves(gp))

    bench("e. per-image loss fwd+grad", lg, reps=reps, base=base,
          consts=(params, feats_rays, img, msk, rays_ori, rays_dirs))

    # ---- f. the production accumulation scan ----
    def scan32(i, params, feats_rays, imgs, msks, poses, rays_ori,
               rays_dirs):
        def body(carry, batch):
            im, mk, po = batch
            loss, (gp, gf) = gfn(params, feats_rays, im, mk, po, rays_ori,
                                 rays_dirs)
            ok = jnp.isfinite(loss)
            gp = jax.tree.map(lambda g: jnp.where(ok, g, 0.0), gp)
            return (
                jax.tree.map(jnp.add, carry[0], gp),
                carry[1] + jnp.where(ok, gf, 0.0),
                carry[2] + jnp.where(ok, loss, 0.0),
            ), None

        zero = jax.tree.map(jnp.zeros_like, params)
        (gacc, facc, lacc), _ = jax.lax.scan(
            body,
            (zero, jnp.zeros_like(feats_rays),
             jnp.float32(0.0) + jnp.float32(i) * 1e-12),
            (imgs, msks, poses))
        return lacc + jnp.sum(facc) + sum(
            jnp.sum(l) for l in jax.tree.leaves(gacc))

    bench(f"f. accumulation scan ({args.accum} images)", scan32,
          reps=max(1, reps // 4), base=base,
          consts=(params, feats_rays, imgs, msks, poses, rays_ori,
                  rays_dirs))

    # ---- g. adam ----
    tx = make_id_optimizer(params)
    opt_state = tx.init(params)
    g0 = jax.tree.map(jnp.ones_like, params)

    def adam(i, params, g0, o):
        import optax

        g = jax.tree.map(lambda x: x + jnp.float32(i) * 1e-12, g0)
        upd, _ = tx.update(g, o, params)
        newp = optax.apply_updates(params, upd)
        return sum(jnp.sum(l) for l in jax.tree.leaves(newp))

    bench("g. adam update alone", adam, reps=reps, base=base,
          consts=(params, g0, opt_state))


if __name__ == "__main__":
    main()
