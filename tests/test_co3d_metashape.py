"""Dedicated CO3D-Metashape loader test over a fixture with the reference
layout (reference dataLoader/co3d_metashape.py): CO3D category dir with
frame_annotations.jgz + set_lists picking the split, sequence dir with
Metashape cameras.xml + images/ + undistorted_images/ + masks_metashape/."""

import gzip
import json
import os

import numpy as np
import pytest

from iffnerf_tpu.data import dataset_dict
from iffnerf_tpu.data.co3d_metashape import load_co3d_metashape

XML_TEMPLATE = """<?xml version="1.0" encoding="UTF-8"?>
<document version="1.5.0">
  <chunk label="chunk" enabled="true">
    <sensors>
      <sensor id="0" label="cam" type="frame">
        <resolution width="64" height="48"/>
        <calibration type="frame" class="adjusted">
          <resolution width="64" height="48"/>
          <f>80.0</f>
          <cx>1.5</cx>
          <cy>-0.5</cy>
        </calibration>
      </sensor>
    </sensors>
    <cameras>
      {cams}
    </cameras>
  </chunk>
</document>
"""

CAM_TEMPLATE = """<camera id="{i}" sensor_id="0" label="frame{i:03d}">
  <transform>{t}</transform>
</camera>"""


@pytest.fixture(scope="module")
def co3d_metashape_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("co3dms_root")
    category = root / "toy"
    sequence = category / "seq1"
    os.makedirs(sequence / "images")
    os.makedirs(sequence / "undistorted_images")
    os.makedirs(sequence / "masks_metashape")
    os.makedirs(category / "set_lists")
    rng = np.random.default_rng(3)
    from PIL import Image

    cams, annotations, train_list, test_list = [], [], [], []
    n = 10
    for i in range(n):
        theta = 2 * np.pi * i / n
        pos = np.array([2 * np.cos(theta), 2 * np.sin(theta), 1.0])
        z = -pos / np.linalg.norm(pos)
        x = np.cross([0, 0, 1.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, pos
        cams.append(CAM_TEMPLATE.format(
            i=i, t=" ".join(str(v) for v in c2w.reshape(-1))
        ))

        img_rel = f"toy/seq1/images/frame{i:03d}.png"
        annotations.append({
            "sequence_name": "seq1",
            "frame_number": i,
            "image": {"path": img_rel, "size": [48, 64]},
        })
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(img).save(root / img_rel)
        Image.fromarray(img).save(
            sequence / "undistorted_images" / f"frame{i:03d}.png"
        )
        # grayscale mask with values straddling the 0.3 threshold
        Image.fromarray(
            rng.integers(0, 255, (48, 64), dtype=np.uint8)
        ).save(sequence / "masks_metashape" / f"frame{i:03d}.png")
        (train_list if i % 5 else test_list).append(["seq1", i, img_rel])

    with gzip.open(category / "frame_annotations.jgz", "wt") as fh:
        json.dump(annotations, fh)
    with open(category / "set_lists" / "set_lists_toy.json", "w") as fh:
        json.dump({"train": train_list, "val": test_list,
                   "test": test_list}, fh)
    with open(sequence / "cameras.xml", "w") as fh:
        fh.write(XML_TEMPLATE.format(cams="\n".join(cams)))
    return str(sequence)


def test_registered_as_dedicated_loader():
    assert dataset_dict["co3d_metashape"] is load_co3d_metashape


def test_co3d_metashape_contract(co3d_metashape_scene):
    train = load_co3d_metashape(co3d_metashape_scene, split="train",
                                is_stack=False)
    w, h = train.img_wh
    assert (w, h) == (64, 48)
    n_train = 8  # 10 frames, every 5th in test
    # 6-channel rays (ori + normalized viewdirs; no radii — reference :273)
    assert train.all_rays.shape == (n_train * w * h, 6)
    assert train.all_rgbs.shape == (n_train * w * h, 4)
    norms = np.linalg.norm(np.asarray(train.all_rays[:, 3:6]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # mask binarized by the 0.3-threshold-then-ceil rule
    alpha = np.asarray(train.all_rgbs[:, 3])
    assert set(np.unique(alpha)).issubset({0.0, 1.0})
    assert 0.1 < alpha.mean() < 1.0
    assert train.near_far == (0.1, 1.5) and train.white_bg
    assert np.allclose(np.asarray(train.scene_bbox),
                       [[-1, -1, -1], [1, 1, 1]])
    assert train.render_path is not None

    test = load_co3d_metashape(co3d_metashape_scene, split="test",
                               is_stack=True)
    assert test.all_rays.shape == (2, w * h, 6)
    assert test.poses.shape == (2, 4, 4)
    # split frames keyed by CO3D set_lists membership: frames 0 and 5
    # poses normalized to unit-ish scale by the metashape recenter/rescale
    assert np.linalg.norm(
        np.asarray(test.poses)[:, :3, 3], axis=-1).max() <= 1.0 + 1e-5


def test_co3d_metashape_rejects_val_split(co3d_metashape_scene):
    with pytest.raises(ValueError):
        load_co3d_metashape(co3d_metashape_scene, split="val")
