"""mip360 loader + COLMAP reader tests over a synthetic sparse model."""

import os
import struct

import numpy as np
import pytest

from iffnerf_tpu.data.colmap import (
    read_extrinsics_binary,
    read_extrinsics_text,
    read_intrinsics_binary,
    read_intrinsics_text,
    read_points3D_binary,
)
from iffnerf_tpu.data.mip360 import load_mip360


def _quat_from_rotmat(r):
    w = np.sqrt(max(0, 1 + r[0, 0] + r[1, 1] + r[2, 2])) / 2
    x = (r[2, 1] - r[1, 2]) / (4 * w)
    y = (r[0, 2] - r[2, 0]) / (4 * w)
    z = (r[1, 0] - r[0, 1]) / (4 * w)
    return np.array([w, x, y, z])


@pytest.fixture(scope="module")
def colmap_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("mip360")
    sparse = root / "sparse" / "0"
    os.makedirs(sparse)
    os.makedirs(root / "images")
    rng = np.random.default_rng(0)

    n = 10
    # cameras.bin: one PINHOLE camera
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 64, 48))
        f.write(struct.pack("<dddd", 80.0, 80.0, 32.0, 24.0))

    # images.bin: n cameras looking at origin from a ring
    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            theta = 2 * np.pi * i / n
            pos = np.array([3 * np.cos(theta), 3 * np.sin(theta), 1.5])
            z = -pos / np.linalg.norm(pos)  # camera z looks at origin
            x = np.cross(np.array([0, 0, 1.0]), z)
            x /= np.linalg.norm(x)
            y = np.cross(z, x)
            c2w_rot = np.stack([x, y, z], axis=1)
            w2c_rot = c2w_rot.T
            tvec = -w2c_rot @ pos
            q = _quat_from_rotmat(w2c_rot)
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<dddd", *q))
            f.write(struct.pack("<ddd", *tvec))
            f.write(struct.pack("<i", 1))
            f.write(f"img_{i:03d}.png\x00".encode())
            f.write(struct.pack("<Q", 0))

            from PIL import Image

            Image.fromarray(
                rng.integers(0, 255, (48, 64, 3), dtype=np.uint8).astype(
                    np.uint8
                )
            ).save(root / "images" / f"img_{i:03d}.png")

    # points3D.bin: a small cloud near the origin
    n_pts = 50
    with open(sparse / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", n_pts))
        for i in range(n_pts):
            xyz = rng.uniform(-0.5, 0.5, 3)
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<ddd", *xyz))
            f.write(struct.pack("<BBB", 128, 128, 128))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 0))
    return str(root)


def test_colmap_binary_readers(colmap_scene):
    sparse = os.path.join(colmap_scene, "sparse/0")
    cams = read_intrinsics_binary(os.path.join(sparse, "cameras.bin"))
    assert cams[1].model == "PINHOLE"
    np.testing.assert_allclose(cams[1].params, [80.0, 80.0, 32.0, 24.0])

    imgs = read_extrinsics_binary(os.path.join(sparse, "images.bin"))
    assert len(imgs) == 10
    assert imgs[1].name == "img_000.png"

    xyz, rgb, err = read_points3D_binary(os.path.join(sparse, "points3D.bin"))
    assert xyz.shape == (50, 3)
    assert (np.abs(xyz) <= 0.5).all()


def test_colmap_text_readers(tmp_path):
    with open(tmp_path / "cameras.txt", "w") as f:
        f.write("# comment\n1 SIMPLE_PINHOLE 64 48 80.0 32.0 24.0\n")
    cams = read_intrinsics_text(str(tmp_path / "cameras.txt"))
    assert cams[1].model == "SIMPLE_PINHOLE"

    with open(tmp_path / "images.txt", "w") as f:
        f.write("# comment\n")
        f.write("1 1 0 0 0 0.1 0.2 0.3 1 img.png\n")
        f.write("1.0 2.0 7 3.0 4.0 -1\n")
    imgs = read_extrinsics_text(str(tmp_path / "images.txt"))
    assert imgs[1].name == "img.png"
    np.testing.assert_allclose(imgs[1].tvec, [0.1, 0.2, 0.3])
    assert imgs[1].xys.shape == (2, 2)


def test_mip360_loader_contract(colmap_scene):
    train = load_mip360(colmap_scene, split="train", downsample=2.0,
                        is_stack=False)
    w, h = train.img_wh
    assert (w, h) == (32, 24)
    n_train = len([i for i in range(10) if i % 8 != 0])
    assert train.all_rays.shape == (n_train * w * h, 7)
    assert train.all_rgbs.shape == (n_train * w * h, 3)
    assert not train.white_bg and train.near_far == (0.01, 1.4)
    # recentred + rescaled: camera centers should be within ~unit-ish scale
    centers = train.poses[:, :3, 3]
    assert np.abs(centers).max() < 20.0
    np.testing.assert_allclose(
        np.linalg.norm(train.all_rays[:, 3:6], axis=-1), 1.0, atol=1e-4
    )

    test = load_mip360(colmap_scene, split="test", downsample=2.0,
                       is_stack=True)
    assert test.all_rays.shape == (2, h, w, 7)
