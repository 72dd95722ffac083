"""Synthetic Blender-format micro-scene for end-to-end tests.

Generates a tiny NeRF-synthetic-style dataset (transforms_*.json + RGBA
PNGs) by analytically volume-rendering a soft colored sphere — a stand-in
for the lego scene that needs no downloads (SURVEY.md §4 test plan:
"golden-value tests against tiny fixtures").
"""

from __future__ import annotations

import json
import os

import numpy as np

CAMERA_ANGLE_X = 0.6911112070083618  # lego fov


def _sigma(x):
    r = np.linalg.norm(x, axis=-1)
    return 30.0 / (1.0 + np.exp(-20.0 * (0.7 - r)))


# A sparse "cluster" stand-in for chunky real scenes (lego's trained
# alpha-mask occupancy is ~0.084 of its shrunk bbox window): one central
# ball plus six axis satellites, solid interiors so the analytic GT
# renders alias-free at the generator's step size.
_CLUSTER = [
    (np.array([0.0, 0.0, 0.0]), 0.22),
    (np.array([0.47, 0.0, 0.0]), 0.125),
    (np.array([-0.47, 0.0, 0.0]), 0.125),
    (np.array([0.0, 0.47, 0.0]), 0.125),
    (np.array([0.0, -0.47, 0.0]), 0.125),
    (np.array([0.0, 0.0, 0.47]), 0.125),
    (np.array([0.0, 0.0, -0.47]), 0.125),
]


def _sigma_cluster(x):
    s = np.full(x.shape[:-1], np.inf)
    for c, r in _CLUSTER:
        s = np.minimum(s, np.linalg.norm(x - c, axis=-1) - r)
    return 30.0 / (1.0 + np.exp(160.0 * s))


_SIGMA_FNS = {"ball": _sigma, "cluster": _sigma_cluster}


def _color(x):
    return 0.5 + 0.45 * np.cos(np.pi * x[..., :3] * 2.0)


def _lookat_blender(campos, target=np.zeros(3), up=np.array([0.0, 0.0, 1.0])):
    z = campos - target
    z = z / np.linalg.norm(z)
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, campos
    return c2w


def _render_view(c2w_blender, wh: int, n_steps: int = 192,
                 sigma_fn=_sigma):
    w = h = wh
    focal = 0.5 * w / np.tan(0.5 * CAMERA_ANGLE_X)
    i, j = np.meshgrid(
        np.arange(w, dtype=np.float64) + 0.5,
        np.arange(h, dtype=np.float64) + 0.5,
        indexing="xy",
    )
    dirs_cam = np.stack(
        [(i - w / 2) / focal, (j - h / 2) / focal, np.ones_like(i)], -1
    )
    b2o = np.diag([1.0, -1.0, -1.0, 1.0])
    c2w = c2w_blender @ b2o
    dirs = dirs_cam @ c2w[:3, :3].T
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    origin = c2w[:3, 3]

    ts = np.linspace(2.0, 6.0, n_steps)
    dt = ts[1] - ts[0]
    rgb = np.zeros((h, w, 3))
    trans = np.ones((h, w))
    for t in ts:
        pts = origin + dirs * t
        alpha = 1.0 - np.exp(-sigma_fn(pts) * dt)
        weight = trans * alpha
        rgb += weight[..., None] * _color(pts)
        trans *= 1.0 - alpha
    acc = 1.0 - trans
    rgba = np.concatenate([np.clip(rgb, 0, 1), acc[..., None]], -1)
    return (rgba * 255).astype(np.uint8)


def make_blender_fixture(root: str, n_train: int = 10, n_test: int = 3,
                         wh: int = 48, seed: int = 0,
                         shape: str = "ball", n_steps: int = 192):
    """Create the dataset under ``root``; returns root.

    ``shape="ball"`` (default) is the dense soft sphere every test uses;
    ``shape="cluster"`` is a sparse lego-occupancy scene (~0.08 of its
    shrunk bbox) for production-occupancy schedule runs.
    """
    from PIL import Image

    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("test", n_test), ("val", n_test)):
        frames = []
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for k in range(n):
            theta = 2 * np.pi * (k + (0.33 if split != "train" else 0)) / n
            phi = np.deg2rad(30 + 25 * rng.random())
            campos = 4.0 * np.array(
                [np.cos(theta) * np.cos(phi), np.sin(theta) * np.cos(phi),
                 np.sin(phi)]
            )
            c2w = _lookat_blender(campos)
            img = _render_view(c2w, wh, n_steps=n_steps,
                               sigma_fn=_SIGMA_FNS[shape])
            rel = f"./{split}/r_{k}"
            Image.fromarray(img, "RGBA").save(
                os.path.join(root, f"{rel[2:]}.png")
            )
            frames.append(
                {"file_path": rel, "transform_matrix": c2w.tolist()}
            )
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(
                {"camera_angle_x": CAMERA_ANGLE_X, "frames": frames}, f
            )
    return root
