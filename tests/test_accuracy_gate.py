"""tools/run_accuracy_gate.py plumbing smoke (VERDICT r3 #6): the
one-command chain (convert -> train ID module -> pose eval -> aggregate ->
threshold) runs end-to-end at fixture scale and its gate/exit-code logic
behaves. No DINOv2 weights exist in this image, so the run uses
--allow_random_init; accuracy itself is NOT asserted (BASELINE.md:
novel-view accuracy requires the pretrained backbone)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.fixtures import make_blender_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def gate_setup(tmp_path_factory):
    """Fixture scene + a quickly-trained field checkpoint laid out the way
    the pose driver expects (exp dir named tensorf_<obj>_VM)."""
    root = tmp_path_factory.mktemp("gate")
    scene = make_blender_fixture(str(root / "data" / "lego"), n_train=8,
                                 n_test=2, wh=40)
    cfg_path = root / "cfg.txt"
    cfg_path.write_text(
        "dataset_name = blender\n"
        f"datadir = {scene}\n"
        "expname = gate_vm\n"
        f"basedir = {root / 'log'}\n"
        "n_iters = 180\n"
        "batch_size = 1024\n"
        "N_voxel_init = 13824\n"
        "N_voxel_final = 21952\n"
        "upsamp_list = [140]\n"
        "update_AlphaMask_list = [100]\n"
        "shadingMode = Ref\n"
        "view_pe = 2\nfea_pe = 2\n"
        "L1_weight_inital = 8e-5\n"
        "rm_weight_mask_thre = 1e-3\n"
        "N_vis = 0\nvis_every = 100000\n"
        "step_ratio = 0.5\n"
    )
    from iffnerf_tpu.config import config_parser
    from iffnerf_tpu.train import reconstruction

    args = config_parser(["--config", str(cfg_path)])
    reconstruction(args, log_fn=lambda *a: None)

    exp = root / "exp" / "tensorf_lego_VM"
    exp.mkdir(parents=True)
    (exp / "gate_vm.npz").symlink_to(root / "log" / "gate_vm" / "gate_vm.npz")
    return root, str(cfg_path), str(root / "data"), str(root / "exp")


def _run_gate(root, cfg, datadir, exp_patch, out_name, extra=()):
    env = dict(os.environ, IFFNERF_PLATFORM="cpu")
    out_dir = str(root / out_name)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_accuracy_gate.py"),
         "--allow_random_init",
         "--config", cfg, "--datadir", datadir, "--exp_patch", exp_patch,
         "--out_dir", out_dir,
         "--id_iters", "3", "--accum_steps", "2", "--gen_points", "1000",
         "--id_backbone_depth", "1", *extra],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    return proc, out_dir


def test_gate_chain_runs_and_gates(gate_setup):
    root, cfg, datadir, exp_patch = gate_setup
    proc, out_dir = _run_gate(root, cfg, datadir, exp_patch, "out_strict")
    assert proc.returncode in (0, 1), proc.stderr[-2000:]

    # aggregate artifact with the reference-schema stat fields
    stats = json.load(open(os.path.join(out_dir, "gate_stats.json")))
    for field in ("n", "median_angular_error", "median_translation_error",
                  "ang_acc@5.", "tr_acc@.1", "mean_inference_time_s"):
        assert field in stats, field
    assert stats["n"] == 2

    # machine-readable verdict on stdout, consistent with the exit code
    verdict = json.loads(proc.stdout.strip().splitlines()[-1])
    assert verdict["gate"] == "pose_accuracy"
    assert verdict["passed"] == (proc.returncode == 0)
    assert verdict["pretrained_backbone"] is False

    # per-row schema of the underlying JSON
    rows = json.load(open(os.path.join(out_dir, "pose_results.json")))
    assert rows and "pred_c2w" in rows[0] and "gt_c2w" in rows[0]


def test_gate_loose_thresholds_pass(gate_setup):
    """With thresholds looser than a random-init run's errors, the gate
    passes — proving the PASS path, not just FAIL."""
    root, cfg, datadir, exp_patch = gate_setup
    proc, _ = _run_gate(
        root, cfg, datadir, exp_patch, "out_loose",
        extra=("--max_median_rot_deg", "1e9", "--max_median_trans", "1e9"),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    verdict = json.loads(proc.stdout.strip().splitlines()[-1])
    assert verdict["passed"] is True


def test_gate_pipeline_error_is_exit_2(gate_setup, tmp_path):
    """A mis-named exp dir yields zero result rows -> exit code 2 with a
    diagnostic, not a silent pass."""
    root, cfg, datadir, _ = gate_setup
    bad_exp = tmp_path / "exp_badname"
    (bad_exp / "wrong_name").mkdir(parents=True)
    proc, _ = _run_gate(root, cfg, datadir, str(bad_exp), "out_bad")
    assert proc.returncode == 2
    assert "no result rows" in proc.stderr or "error" in proc.stderr.lower()


def test_apply_gate_logic():
    sys.path.insert(0, REPO)
    from tools.run_accuracy_gate import apply_gate

    class A:
        max_median_rot_deg = 10.0
        max_median_trans = 0.2
        min_acc5 = 50.0

    good = {"median_angular_error": 5.0, "median_translation_error": 0.1,
            "ang_acc@5.": 80.0}
    bad = {"median_angular_error": 12.0, "median_translation_error": 0.1,
           "ang_acc@5.": 80.0}
    low_acc = {"median_angular_error": 5.0,
               "median_translation_error": 0.1, "ang_acc@5.": 20.0}
    assert apply_gate(dict(good), A()) is True
    assert apply_gate(dict(bad), A()) is False
    assert apply_gate(dict(low_acc), A()) is False
