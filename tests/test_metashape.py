"""Metashape cameras.xml parser + repair loader tests."""

import os

import numpy as np
import pytest

from iffnerf_tpu.data.metashape import load_cameras_xml
from iffnerf_tpu.data.repair import load_repair

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
          <k1>0.0</k1>
        </calibration>
      </sensor>
    </sensors>
    <cameras>
      {cams}
    </cameras>
  </chunk>
</document>
"""

CAM_TEMPLATE = """<camera id="{i}" sensor_id="0" label="img_{i:03d}">
  <transform>{t}</transform>
</camera>"""


@pytest.fixture(scope="module")
def metashape_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("repair")
    os.makedirs(root / "undistorted_images")
    os.makedirs(root / "masks")
    rng = np.random.default_rng(0)
    from PIL import Image

    cams = []
    for i in range(12):
        theta = 2 * np.pi * i / 12
        pos = np.array([2 * np.cos(theta), 2 * np.sin(theta), 1.0])
        z = -pos / np.linalg.norm(pos)
        x = np.cross([0, 0, 1.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, pos
        cams.append(
            CAM_TEMPLATE.format(
                i=i, t=" ".join(str(v) for v in c2w.reshape(-1))
            )
        )
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(img).save(
            root / "undistorted_images" / f"img_{i:03d}.png"
        )
        Image.fromarray(
            (rng.uniform(0, 1, (48, 64)) > 0.3).astype(np.uint8) * 255
        ).save(root / "masks" / f"img_{i:03d}.png")

    with open(root / "cameras.xml", "w") as f:
        f.write(XML_TEMPLATE.format(cams="\n".join(cams)))
    return str(root)


def test_parse_cameras_xml(metashape_scene):
    cameras, inv_scale, inv_tf = load_cameras_xml(
        os.path.join(metashape_scene, "cameras.xml"), metashape_scene
    )
    assert len(cameras["filenames"]) == 12
    assert cameras["cam2world"].shape == (12, 4, 4)
    assert cameras["Ks"].shape == (12, 3, 3)
    # rescaled: camera centers within unit norm
    assert np.linalg.norm(cameras["cam2world"][:, :3, 3], axis=-1).max() \
        <= 1.0 + 1e-5
    assert inv_scale > 0


def test_repair_loader_contract(metashape_scene):
    train = load_repair(metashape_scene, split="train", is_stack=False)
    w, h = train.img_wh
    assert (w, h) == (64, 48)
    n_train = 12 - len(range(0, 12, 10))
    assert train.all_rays.shape == (n_train * w * h, 7)
    assert train.all_rgbs.shape == (n_train * w * h, 4)
    assert train.near_far == (0.1, 1.8) and train.white_bg

    test = load_repair(metashape_scene, split="test", is_stack=True)
    assert test.all_rays.shape[0] == 2
