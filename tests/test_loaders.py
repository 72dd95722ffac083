"""Contract tests for the dataset loaders over synthetic fixtures in each
on-disk format (SURVEY.md §2.7 duck-typed contract)."""

import json
import os

import numpy as np
import pytest

from tests.fixtures import make_blender_fixture

from iffnerf_tpu.data import (
    dataset_dict,
    load_llff,
    load_nsvf,
    load_tankstemple,
    load_your_own,
)


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


@pytest.fixture(scope="module")
def nsvf_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("nsvf")
    os.makedirs(root / "pose")
    os.makedirs(root / "rgb")
    with open(root / "intrinsics.txt", "w") as f:
        f.write("1111.11 400.0 400.0 0.\n0. 0. 0.\n1.\n800 800\n")
    np.savetxt(root / "bbox.txt", np.array([[-1, -1, -1, 1, 1, 1, 0.1]]))
    rng = np.random.default_rng(0)
    for i, prefix in enumerate(["0_", "0_", "1_", "2_"]):
        c2w = np.eye(4)
        c2w[:3, 3] = rng.standard_normal(3)
        np.savetxt(root / "pose" / f"{prefix}{i:04d}.txt", c2w)
        img = (rng.uniform(0, 255, (800, 800, 4))).astype(np.uint8)
        _write_png(root / "rgb" / f"{prefix}{i:04d}.png", img)
    return str(root)


def test_nsvf_loader_contract(nsvf_scene):
    train = load_nsvf(nsvf_scene, split="train", downsample=8.0,
                      is_stack=False)
    assert train.all_rays.shape == (2 * 100 * 100, 6)
    assert train.all_rgbs.shape == (2 * 100 * 100, 3)
    assert train.white_bg and train.near_far == (0.5, 6.0)
    assert train.render_path.shape == (40, 4, 4)
    np.testing.assert_allclose(
        np.linalg.norm(train.all_rays[:, 3:6], axis=-1), 1.0, atol=1e-5
    )

    test = load_nsvf(nsvf_scene, split="test", downsample=8.0, is_stack=True)
    assert test.all_rays.shape == (1, 100, 100, 6)


def test_tankstemple_loader_contract(nsvf_scene):
    # same on-disk layout; intrinsics interpreted as a 3x3-ish matrix
    with open(os.path.join(nsvf_scene, "intrinsics.txt"), "w") as f:
        f.write("1111.11 0. 960. 0.\n0. 1111.11 540. 0.\n0. 0. 1. 0.\n0 0 0 1\n")
    ds = load_tankstemple(nsvf_scene, split="train", downsample=8.0,
                          is_stack=False, ori_wh=(800, 800))
    assert ds.all_rays.shape[-1] == 7
    assert ds.all_rgbs.shape[-1] == 4  # white-distance mask appended
    assert ds.near_far == (0.01, 6.0)
    assert ds.render_path.shape == (100, 4, 4)
    # bbox scaled by 1.2
    np.testing.assert_allclose(ds.scene_bbox[1], [1.2, 1.2, 1.2], atol=1e-5)


@pytest.fixture(scope="module")
def llff_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("llff")
    os.makedirs(root / "images_4")
    rng = np.random.default_rng(1)
    n = 10
    poses_bounds = np.zeros((n, 17))
    for i in range(n):
        # down-right-back pose with hwf column
        m = np.eye(4)[:3]
        m[:3, 3] = rng.standard_normal(3) * 0.1 + [0, 0, 4]
        hwf = np.array([120.0, 160.0, 100.0])
        poses_bounds[i, :15] = np.concatenate(
            [m, hwf[:, None]], axis=1
        ).reshape(-1)
        poses_bounds[i, 15:] = [2.0, 6.0]
        img = (rng.uniform(0, 255, (120, 160, 3))).astype(np.uint8)
        _write_png(root / "images_4" / f"img_{i:03d}.png", img)
    np.save(root / "poses_bounds.npy", poses_bounds)
    return str(root)


def test_llff_loader_contract(llff_scene):
    train = load_llff(llff_scene, split="train", downsample=4.0,
                      is_stack=False, hold_every=8)
    w, h = train.img_wh
    assert (w, h) == (40, 30)
    # 10 images, hold-every-8 -> 2 test, 8 train
    assert train.all_rays.shape == (8 * w * h, 6)
    assert train.all_rgbs.shape == (8 * w * h, 3)
    assert not train.white_bg and train.near_far == (0.0, 1.0)
    assert train.render_path.shape == (120, 4, 4)
    # NDC origins: z component is 1 + 2*near/oz <= 1
    assert np.isfinite(train.all_rays).all()

    test = load_llff(llff_scene, split="test", downsample=4.0, is_stack=True)
    assert test.all_rays.shape == (2, h, w, 6)


def test_your_own_loader_contract(tmp_path):
    scene = make_blender_fixture(str(tmp_path / "scene"), n_train=3,
                                 n_test=1, wh=32)
    # convert fixture jsons to colmap2nerf style (w/h/cx/cy fields)
    for split in ("train", "test"):
        p = os.path.join(scene, f"transforms_{split}.json")
        with open(p) as f:
            meta = json.load(f)
        meta.update(
            {"w": 32, "h": 32, "cx": 16.0, "cy": 16.0,
             "camera_angle_y": meta["camera_angle_x"]}
        )
        with open(p, "w") as f:
            json.dump(meta, f)

    ds = load_your_own(scene, split="train", is_stack=False)
    assert ds.all_rays.shape == (3 * 32 * 32, 6)
    assert ds.all_rgbs.shape == (3 * 32 * 32, 3)  # RGBA blended to white
    assert ds.near_far == (0.1, 100.0)
    np.testing.assert_allclose(
        np.linalg.norm(ds.all_rays[:, 3:6], axis=-1), 1.0, atol=1e-5
    )


def test_registry_names():
    for name in ("blender", "nsvf", "tankstemple", "llff", "own_data"):
        assert name in dataset_dict
