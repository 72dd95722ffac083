"""CO3D loader test over a synthetic frame_annotations.jgz fixture."""

import gzip
import json
import os

import numpy as np
import pytest

from iffnerf_tpu.data.co3d import load_co3d


@pytest.fixture(scope="module")
def co3d_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("co3d_root")
    category = root / "toy"
    sequence = category / "seq1"
    os.makedirs(sequence / "images")
    os.makedirs(sequence / "masks")
    os.makedirs(category / "set_lists")
    rng = np.random.default_rng(0)
    from PIL import Image

    annotations = []
    train_list, test_list = [], []
    n = 8
    for i in range(n):
        theta = 2 * np.pi * i / n
        pos = np.array([2 * np.cos(theta), 2 * np.sin(theta), 1.0])
        z = -pos / np.linalg.norm(pos)
        x = np.cross([0, 0, 1.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4)
        c2w[:3, :3] = np.stack([x, y, z], axis=1)
        c2w[:3, 3] = pos
        # invert the loader's conversion to author a valid annotation:
        # mtx = inv(c2w); R_p3d/T from mtx via flip+transpose
        mtx = np.linalg.inv(c2w)
        flip = np.diag([-1.0, -1.0, 1.0, 1.0])
        m = mtx.copy()
        m[:3, :3] = m[:3, :3].T          # undo transpose
        m = m @ np.linalg.inv(flip)      # undo the @ co3d2opencv
        img_rel = f"toy/seq1/images/frame{i:03d}.png"
        mask_rel = f"toy/seq1/masks/frame{i:03d}.png"
        h, w = 48, 64
        scale = min(h, w) / 2.0
        annotations.append({
            "sequence_name": "seq1",
            "frame_number": i,
            "image": {"path": img_rel, "size": [h, w]},
            "mask": {"path": mask_rel},
            "viewpoint": {
                "R": m[:3, :3].tolist(),
                "T": m[:3, 3].tolist(),
                # fx=80 -> ndc focal = -80/scale
                "focal_length": [-80.0 / scale, -80.0 / scale],
                "principal_point": [-(32.0 - w / 2) / scale,
                                    -(24.0 - h / 2) / scale],
            },
        })
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        ).save(root / img_rel)
        Image.fromarray(
            (rng.uniform(0, 1, (h, w)) > 0.4).astype(np.uint8) * 255
        ).save(root / mask_rel)
        (train_list if i % 4 else test_list).append(["seq1", i, img_rel])

    with gzip.open(category / "frame_annotations.jgz", "wt") as fh:
        json.dump(annotations, fh)
    with open(category / "set_lists" / "set_lists_toy.json", "w") as fh:
        json.dump({"train": train_list, "val": test_list,
                   "test": test_list}, fh)
    return str(sequence)


def test_co3d_loader_contract(co3d_scene):
    train = load_co3d(co3d_scene, split="train", is_stack=False)
    w, h = train.img_wh
    assert (w, h) == (64, 48)
    assert train.all_rays.shape == (6 * w * h, 7)
    assert train.all_rgbs.shape == (6 * w * h, 4)
    assert train.near_far == (0.1, 0.8) and train.white_bg
    np.testing.assert_allclose(
        np.linalg.norm(train.all_rays[:, 3:6], axis=-1), 1.0, atol=1e-4
    )
    # poses recentred/rescaled to unit-ish scale
    assert np.linalg.norm(train.poses[:, :3, 3], axis=-1).max() <= 1.0 + 1e-4

    test = load_co3d(co3d_scene, split="test", is_stack=True)
    assert test.all_rays.shape == (2, h, w, 7)
