"""Tests for the smaller offline tools (SURVEY §2.10) left lightly tested
in round 1: per_object_results, statistic_mean, print_sequence_statistics,
pose_perturbation_study, compute_scaling_factor, colmap2nerf,
extra/compute_metrics."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "extra"))


def _pose_row(seq, frame, ang_deg=0.0, t_err=0.0, time_ms=10.0):
    """GT identity pose; prediction rotated ang_deg about z and shifted."""
    gt = np.eye(4)
    c, s = np.cos(np.radians(ang_deg)), np.sin(np.radians(ang_deg))
    pred = np.eye(4)
    pred[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    pred[0, 3] = t_err
    return {
        "sequence_id": seq, "category_name": "cat", "frame_id": frame,
        "loss": 0.0, "scores_loss": 0.0, "recall": 1.0,
        "total_optimization_time_in_ms": time_ms,
        "pred_c2w": pred.tolist(), "gt_c2w": gt.tolist(),
    }


def test_per_object_results(tmp_path):
    from per_object_results import evaluate_poses_per_object

    rows = [
        _pose_row("a", 0, ang_deg=10.0, t_err=0.5),
        _pose_row("a", 1, ang_deg=20.0, t_err=1.5),
        _pose_row("b", 0, ang_deg=0.0, t_err=0.0),
    ]
    path = tmp_path / "r.json"
    path.write_text(json.dumps(rows))
    out = evaluate_poses_per_object(str(path))
    by_obj = {r["object"]: r for r in out}
    assert by_obj["a_cat"]["n"] == 2
    np.testing.assert_allclose(by_obj["a_cat"]["mean_angular"], 15.0,
                               atol=1e-5)
    np.testing.assert_allclose(by_obj["a_cat"]["median_translation"], 1.0)
    np.testing.assert_allclose(by_obj["b_cat"]["mean_angular"], 0.0,
                               atol=1e-5)


def test_statistic_mean_combines_duplicates(tmp_path):
    from statistic_mean import combine_pose_eval_files

    rows = [_pose_row("a", 0, time_ms=10.0), _pose_row("a", 0, time_ms=30.0),
            _pose_row("a", 1, time_ms=50.0)]
    src, dst = tmp_path / "in.json", tmp_path / "out.json"
    src.write_text(json.dumps(rows))
    out = combine_pose_eval_files(str(src), str(dst))
    assert len(out) == 2
    by_frame = {r["frame_id"]: r for r in out}
    assert by_frame[0]["total_optimization_time_in_ms"] == 20.0
    assert by_frame[1]["total_optimization_time_in_ms"] == 50.0
    assert json.loads(dst.read_text()) == out


def test_print_sequence_statistics(tmp_path):
    from print_sequence_statistics import evaluate_poses

    rows = [_pose_row("a", 0, ang_deg=30.0, t_err=2.0, time_ms=1000.0)]
    src, csv = tmp_path / "r.json", tmp_path / "r.csv"
    src.write_text(json.dumps(rows))
    mean_ang, mean_tr, mean_time_s = evaluate_poses(str(src), str(csv))
    np.testing.assert_allclose(mean_ang, 30.0, atol=1e-5)
    np.testing.assert_allclose(mean_tr, 2.0)
    np.testing.assert_allclose(mean_time_s, 1.0)
    assert csv.exists()


def test_pose_perturbation_study(tmp_path, monkeypatch):
    import pose_perturbation_study as pps

    rows = [_pose_row("a", i) for i in range(4)]
    src, dst = tmp_path / "in.json", tmp_path / "out.json"
    src.write_text(json.dumps(rows))
    monkeypatch.setattr(sys, "argv", [
        "pose_perturbation_study", str(src), str(dst),
        "--rot_deg", "5", "--trans", "0.02", "--seed", "1",
    ])
    pps.main()
    out = json.loads(dst.read_text())
    assert len(out) == 4
    for row in out:
        pred = np.asarray(row["pred_c2w"])
        gt = np.asarray(row["gt_c2w"])
        # perturbed prediction differs from GT but stays close
        assert 0.0 < np.abs(pred - gt).max() < 0.2


def test_compute_scaling_factor(tmp_path, monkeypatch, capsys):
    import jax
    import compute_scaling_factor as csf

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_blender_fixture

    from iffnerf_tpu.checkpoint import save_field
    from iffnerf_tpu.models import FieldConfig, init_field

    scene = tmp_path / "scene"
    make_blender_fixture(str(scene), n_train=2, n_test=1, wh=16)
    expdir = tmp_path / "log" / "tensorf_obj_VM"
    os.makedirs(expdir)
    cfg = FieldConfig(grid_size=(8, 8, 8), density_n_comp=(2, 2, 2),
                      app_n_comp=(2, 2, 2), app_dim=3,
                      shading_mode="MLP_Fea", feature_c=8,
                      view_pe=2, fea_pe=2)
    save_field(str(expdir / "ckpt.npz"), cfg,
               init_field(jax.random.PRNGKey(0), cfg))
    monkeypatch.setattr(sys, "argv", [
        "compute_scaling_factor", "--exp_patch", str(tmp_path / "log"),
        "--datadir", str(scene), "--data_type", "blender",
    ])
    csf.main()
    out = capsys.readouterr().out
    assert "obj" in out and "ratio" in out


def test_colmap2nerf_text_model(tmp_path, monkeypatch):
    import colmap2nerf

    model = tmp_path / "sparse0"
    os.makedirs(model)
    (model / "cameras.txt").write_text(
        "# cams\n1 PINHOLE 64 48 80.0 80.0 32.0 24.0\n"
    )
    # identity quaternion, camera at origin looking down +z (opencv w2c)
    (model / "images.txt").write_text(
        "1 1 0 0 0 0 0 2 1 r_0.png\n\n"
        "2 1 0 0 0 0 0 4 1 r_1.png\n\n"
    )
    out = tmp_path / "transforms.json"
    monkeypatch.setattr(sys, "argv", [
        "colmap2nerf", "--colmap_dir", str(model), "--out", str(out),
    ])
    colmap2nerf.main()
    data = json.loads(out.read_text())
    assert data["w"] == 64 and data["h"] == 48
    assert len(data["frames"]) == 2
    np.testing.assert_allclose(
        data["camera_angle_x"], 2 * np.arctan(64 / 160.0)
    )
    m = np.asarray(data["frames"][0]["transform_matrix"])
    # w2c translation (0,0,2) -> blender c2w position (0,0,-2)
    np.testing.assert_allclose(m[:3, 3], [0, 0, -2], atol=1e-6)


def test_compute_metrics_dirs(tmp_path, capsys):
    import compute_metrics

    from PIL import Image

    rng = np.random.default_rng(0)
    a, b = tmp_path / "renders", tmp_path / "gt"
    os.makedirs(a)
    os.makedirs(b)
    for i in range(2):
        img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(img).save(a / f"{i}.png")
        Image.fromarray(img).save(b / f"{i}.png")
    compute_metrics.main(str(a), str(b))
    out = capsys.readouterr().out
    assert "PSNR" in out and "SSIM: 1.0000" in out


def test_load_torch_checkpoint_structure(tmp_path):
    """A converted reference .th checkpoint must produce the exact pytree
    STRUCTURE of a natively initialized field (lists vs tuples matter:
    jitted-program caches and donation signatures key on the treedef)."""
    import torch
    import jax
    import jax.numpy as jnp

    from iffnerf_tpu.checkpoint import load_torch_checkpoint
    from iffnerf_tpu.models import FieldConfig, init_field

    rng = np.random.default_rng(0)
    g = (8, 9, 10)
    nc, na, app_dim, feat_c = 2, 3, 6, 16
    sd = {}
    mats = {0: (g[1], g[0]), 1: (g[2], g[0]), 2: (g[2], g[1])}
    vecs = {0: g[2], 1: g[1], 2: g[0]}
    for i in range(3):
        h, w = mats[i]
        sd[f"density_plane.{i}"] = torch.from_numpy(
            rng.standard_normal((1, nc, h, w)).astype(np.float32))
        sd[f"app_plane.{i}"] = torch.from_numpy(
            rng.standard_normal((1, na, h, w)).astype(np.float32))
        sd[f"density_line.{i}"] = torch.from_numpy(
            rng.standard_normal((1, nc, vecs[i], 1)).astype(np.float32))
        sd[f"app_line.{i}"] = torch.from_numpy(
            rng.standard_normal((1, na, vecs[i], 1)).astype(np.float32))
    sd["basis_mat.weight"] = torch.from_numpy(
        rng.standard_normal((app_dim, 3 * na)).astype(np.float32))
    in_mlp = 2 * 2 * 3 + 2 * 2 * app_dim + 3 + app_dim  # view_pe/fea_pe=2
    for i, (fin, fout) in zip((0, 2, 4),
                              ((in_mlp, feat_c), (feat_c, feat_c),
                               (feat_c, 3))):
        sd[f"renderModule.mlp.{i}.weight"] = torch.from_numpy(
            rng.standard_normal((fout, fin)).astype(np.float32))
        sd[f"renderModule.mlp.{i}.bias"] = torch.from_numpy(
            rng.standard_normal((fout,)).astype(np.float32))
    ckpt = {
        "model_name": "TensorVMSplit",
        "kwargs": {
            "aabb": np.array([[-1.5] * 3, [1.5] * 3], np.float32),
            "gridSize": list(g),
            "density_n_comp": [nc] * 3,
            "appearance_n_comp": [na] * 3,
            "app_dim": app_dim,
            "shadingMode": "MLP_Fea",
            "near_far": [2.0, 6.0],
            "density_shift": -10.0,
            "alphaMask_thres": 1e-4,
            "distance_scale": 25.0,
            "rayMarch_weight_thres": 1e-4,
            "pos_pe": 6, "view_pe": 2, "fea_pe": 2,
            "featureC": feat_c, "step_ratio": 2.0,
            "fea2denseAct": "softplus",
        },
        "state_dict": sd,
    }
    path = str(tmp_path / "ref.th")
    torch.save(ckpt, path)

    config, params, mask = load_torch_checkpoint(path)
    native = init_field(jax.random.PRNGKey(0), config)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(native))
    for ours, ref in zip(jax.tree_util.tree_leaves(params),
                         jax.tree_util.tree_leaves(native)):
        assert ours.shape == ref.shape, (ours.shape, ref.shape)
