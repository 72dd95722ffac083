"""Coverage for auxiliary paths left untested in round 1: the camera-path
renderer (evaluation_path) and the sweep farm's grid/lock protocol
(extra/auto_run_paramsets)."""

import os
import sys

import numpy as np
import jax

from iffnerf_tpu.models import FieldConfig, init_field

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "extra"))


class _PathDataset:
    img_wh = (24, 18)
    K = np.array([[[30.0, 0, 12], [0, 30.0, 9], [0, 0, 1]]], np.float32)


def test_evaluation_path_renders_frames(tmp_path):
    from iffnerf_tpu.render.renderer import evaluation_path

    cfg = FieldConfig(grid_size=(8, 8, 8), density_n_comp=(2, 2, 2),
                      app_n_comp=(3, 3, 3), app_dim=6,
                      shading_mode="MLP_Fea", feature_c=8, view_pe=2,
                      fea_pe=2, step_ratio=2.0)
    params = init_field(jax.random.PRNGKey(0), cfg)

    c2ws = []
    for theta in (0.0, 0.5):
        pos = 3.0 * np.array([np.cos(theta), np.sin(theta), 0.5])
        fwd = -pos / np.linalg.norm(pos)
        right = np.cross([0, 0, 1.0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        c2ws.append(np.stack([right, -up, fwd, pos], axis=1))

    frames = evaluation_path(
        cfg, params, None, np.asarray(c2ws, np.float32), _PathDataset(),
        save_path=str(tmp_path), white_bg=True, chunk=128,
    )
    assert len(frames) == 2
    assert frames[0].shape == (18, 24, 3)
    assert frames[0].dtype == np.uint8
    # video artifact written (gif fallback without ffmpeg)
    assert any(f.startswith("video.") for f in os.listdir(tmp_path))


def test_paramsets_grid_and_locks(tmp_path):
    import auto_run_paramsets as arp

    params, names = arp.get_param_list({
        "lr_init": [0.01, 0.02],
        ("n_iters", "batch_size"): [(100, 64), (200, 128)],
    })
    assert len(params) == 4 and len(names) == 4
    assert "--lr_init 0.01" in params[0]
    assert "--n_iters 100" in params[0] and "--batch_size 64" in params[0]
    # tuple keys vary jointly: (100,64) and (200,128) only
    assert not any("--n_iters 100 --batch_size 128" in p.replace("  ", " ")
                   for p in params)
    assert names[0] != names[1]

    log = str(tmp_path / "exp1")
    os.makedirs(log)
    assert not arp.stop_requested(str(tmp_path))
    arp.get_folder_locker(log)
    assert os.path.exists(os.path.join(log, "lockFolder"))
    arp.release_folder_locker(log)
    assert not os.path.exists(os.path.join(log, "lockFolder"))
    os.makedirs(os.path.join(str(tmp_path), "stopFolder"))
    assert arp.stop_requested(str(tmp_path))
