"""Metashape-XML scene loader ("repair" dataset,
reference dataLoader/repair.py:23-209 + repair_camera_parser.py).

Parity: cameras.xml poses (recentered + rescaled), undistorted images with
masks from ``masks/``, hold-every-10 test split, bbox [[-1,-1,0],[1,1,1]],
near/far [0.1, 1.8], white bg, per-image intrinsics (each camera carries its
own K), 7-channel rays with mip radii.

Note: the reference's RepairDataset calls its parser expecting a dict but
the parser returns a 3-tuple (repair.py:26 vs repair_camera_parser.py:200) —
a latent crash we do not replicate.
"""

from __future__ import annotations

import os

import numpy as np

from iffnerf_tpu.data.base import RayDataset, load_image, stack_or_flatten
from iffnerf_tpu.data.metashape import load_cameras_xml
from iffnerf_tpu.data.spiral import create_spiral
from iffnerf_tpu.data.rays_np import ray_directions_Ks_np, rays_with_radii_np

VAL_SPLIT_EVERY = 10


def load_repair(datadir: str, split: str = "train", downsample: float = 1.0,
                is_stack: bool = False, **kwargs) -> RayDataset:
    cameras, _, _ = load_cameras_xml(
        os.path.join(datadir, "cameras.xml"), datadir,
        img_resize_factor=downsample, img_dirname="undistorted_images",
    )
    if not cameras:
        raise FileNotFoundError(f"no usable cameras.xml under {datadir}")

    n = len(cameras["filenames"])
    val_idx = set(range(0, n, VAL_SPLIT_EVERY))
    sel = sorted(val_idx) if split == "test" else [
        i for i in range(n) if i not in val_idx
    ]

    poses, rays_list, rgbs_list = [], [], []
    img_wh = None
    for i in sel:
        img = load_image(cameras["filenames"][i])
        h, w = img.shape[:2]
        if downsample != 1.0:
            img = load_image(
                cameras["filenames"][i],
                (int(w / downsample), int(h / downsample)),
            )
            h, w = img.shape[:2]
        img_wh = (w, h)

        mask_path = os.path.join(
            datadir, "masks", os.path.basename(cameras["filenames"][i])
        )
        if os.path.exists(mask_path):
            m = load_image(mask_path, (w, h))
            mask = np.ceil(m[..., :1])
        else:
            mask = np.ones((h, w, 1), np.float32)
        rgba = np.concatenate([img[..., :3], mask], axis=-1)
        rgbs_list.append(rgba)

        c2w = cameras["cam2world"][i].astype(np.float32)
        poses.append(
            np.concatenate(
                [c2w, np.array([[0, 0, 0, 1]], np.float32)], 0
            )[:4] if c2w.shape[0] == 3 else c2w
        )

        K = cameras["Ks"][i][None]
        ori_dirs, dx, dy = ray_directions_Ks_np(h, w, K)
        ori_dirs, dx, dy = ori_dirs[0], dx[0], dy[0]
        dirs = ori_dirs / np.linalg.norm(ori_dirs, axis=-1, keepdims=True)
        rays_o, rays_d, radii = rays_with_radii_np(
            dirs, poses[-1], directions=ori_dirs, dx=dx, dy=dy, keepdim=True
        )
        rays_list.append(
            np.concatenate([rays_o, rays_d, radii], -1).astype(np.float32)
        )

    all_rays, all_rgbs = stack_or_flatten(rays_list, rgbs_list, is_stack)
    scene_bbox = np.array([[-1.0, -1.0, 0.0], [1.0, 1.0, 1.0]], np.float32)
    poses_np = np.stack(poses)
    up = poses_np[:, :3, 1].sum(0)
    up = up / np.linalg.norm(up)
    return RayDataset(
        all_rays=all_rays, all_rgbs=all_rgbs, poses=poses_np,
        K=cameras["Ks"][sel[0]][None].astype(np.float32),
        scene_bbox=scene_bbox,
        near_far=(0.1, 1.8), white_bg=True, img_wh=img_wh,
        is_stack=is_stack, split=split, downsample=downsample,
        render_path=create_spiral(scene_bbox, up, invert_z=False),
    )
