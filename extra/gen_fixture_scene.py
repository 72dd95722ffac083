"""Generate a full-size synthetic Blender-format scene on the accelerator.

Same analytic scenes as ``tests/fixtures.py`` (single source of truth for
the geometry constants, imported from there), but volume-rendered with jax
so a 116-view 800x800 dataset takes minutes instead of the hour the
single-core numpy generator needs. Used for production-scale schedule
runs (the reference trains on real NeRF-synthetic scenes,
``/root/reference/train.py:262``; this image has no datasets, so the
schedule campaigns documented in BASELINE.md run on these stand-ins).

Usage:
    python extra/gen_fixture_scene.py --root /tmp/lego_cluster \
        --shape cluster --wh 800 --n_train 100 --n_test 8
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from fixtures import (  # noqa: E402
    CAMERA_ANGLE_X,
    _CLUSTER,
    _lookat_blender,
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _sigma_ball_j(x):
    r = jnp.linalg.norm(x, axis=-1)
    return 30.0 / (1.0 + jnp.exp(-20.0 * (0.7 - r)))


def _sigma_cluster_j(x):
    s = jnp.full(x.shape[:-1], jnp.inf)
    for c, r in _CLUSTER:
        s = jnp.minimum(s, jnp.linalg.norm(x - jnp.asarray(c), axis=-1) - r)
    return 30.0 / (1.0 + jnp.exp(160.0 * s))


_SIGMAS = {"ball": _sigma_ball_j, "cluster": _sigma_cluster_j}


@functools.partial(jax.jit, static_argnames=("wh", "n_steps", "shape"))
def _render_view_j(c2w_blender, *, wh: int, n_steps: int, shape: str):
    w = h = wh
    focal = 0.5 * w / np.tan(0.5 * CAMERA_ANGLE_X)
    i, j = jnp.meshgrid(
        jnp.arange(w, dtype=jnp.float32) + 0.5,
        jnp.arange(h, dtype=jnp.float32) + 0.5,
        indexing="xy",
    )
    dirs_cam = jnp.stack(
        [(i - w / 2) / focal, (j - h / 2) / focal, jnp.ones_like(i)], -1
    )
    b2o = jnp.diag(jnp.asarray([1.0, -1.0, -1.0, 1.0], jnp.float32))
    c2w = c2w_blender.astype(jnp.float32) @ b2o
    dirs = dirs_cam @ c2w[:3, :3].T
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origin = c2w[:3, 3]

    ts = jnp.linspace(2.0, 6.0, n_steps)
    dt = ts[1] - ts[0]
    sigma_fn = _SIGMAS[shape]

    def step(carry, t):
        rgb, trans = carry
        pts = origin + dirs * t
        alpha = 1.0 - jnp.exp(-sigma_fn(pts) * dt)
        weight = trans * alpha
        color = 0.5 + 0.45 * jnp.cos(jnp.pi * pts[..., :3] * 2.0)
        return (rgb + weight[..., None] * color, trans * (1.0 - alpha)), None

    (rgb, trans), _ = jax.lax.scan(
        step, (jnp.zeros((h, w, 3)), jnp.ones((h, w))), ts
    )
    acc = 1.0 - trans
    rgba = jnp.concatenate([jnp.clip(rgb, 0, 1), acc[..., None]], -1)
    return (rgba * 255).astype(jnp.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--shape", choices=list(_SIGMAS), default="cluster")
    ap.add_argument("--wh", type=int, default=800)
    ap.add_argument("--n_train", type=int, default=100)
    ap.add_argument("--n_test", type=int, default=8)
    ap.add_argument("--n_steps", type=int, default=192)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from PIL import Image

    rng = np.random.default_rng(args.seed)
    for split, n in (("train", args.n_train), ("test", args.n_test),
                     ("val", args.n_test)):
        frames = []
        os.makedirs(os.path.join(args.root, split), exist_ok=True)
        for k in range(n):
            theta = 2 * np.pi * (k + (0.33 if split != "train" else 0)) / n
            phi = np.deg2rad(30 + 25 * rng.random())
            campos = 4.0 * np.array(
                [np.cos(theta) * np.cos(phi), np.sin(theta) * np.cos(phi),
                 np.sin(phi)]
            )
            c2w = _lookat_blender(campos)
            img = np.asarray(
                _render_view_j(jnp.asarray(c2w), wh=args.wh,
                               n_steps=args.n_steps, shape=args.shape)
            )
            rel = f"./{split}/r_{k}"
            Image.fromarray(img, "RGBA").save(
                os.path.join(args.root, f"{rel[2:]}.png")
            )
            frames.append(
                {"file_path": rel, "transform_matrix": c2w.tolist()}
            )
            print(f"{split} {k + 1}/{n}", flush=True)
        with open(os.path.join(args.root,
                               f"transforms_{split}.json"), "w") as f:
            json.dump(
                {"camera_angle_x": CAMERA_ANGLE_X, "frames": frames}, f
            )
    print("done", args.root)


if __name__ == "__main__":
    main()
