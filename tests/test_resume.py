"""Crash-resume machinery e2e (VERDICT r2 #6).

A mid-phase ``--ckpt_every`` checkpoint plus ``--resume_iter`` must
reconstruct the full schedule state — grid size, samples-per-ray, the LR
decay measured from the last upsample reset (reference
train.py:165-170,401-415 semantics) — and a resumed run must land within
tolerance of an uninterrupted one. The "crash" is simulated by a log_fn
that raises once training passes the checkpoint iteration, exactly like
a process kill after the periodic save.
"""

import json
import os
import re

import numpy as np
import pytest

from tests.fixtures import make_blender_fixture

from iffnerf_tpu.checkpoint import load_field
from iffnerf_tpu.config import config_parser
from iffnerf_tpu.data import load_blender
from iffnerf_tpu.render import evaluation
from iffnerf_tpu.train import reconstruction
from iffnerf_tpu.utils.misc import cal_n_samples

N_ITERS = 260
UPSAMP = 120
MASK_UPDATES = (80, 200)
CKPT_EVERY = 80  # periodic saves at 80, 160 (mid-phase), 240


@pytest.fixture(scope="module")
def fixture_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("resume_fixture")
    return make_blender_fixture(str(root), n_train=10, n_test=2, wh=48)


def _args(scene, basedir, expname, **extra):
    argv = [
        "--datadir", scene,
        "--expname", expname,
        "--basedir", str(basedir),
        "--n_iters", str(N_ITERS),
        "--batch_size", "1024",
        "--N_voxel_init", str(24 ** 3),
        "--N_voxel_final", str(40 ** 3),
        "--upsamp_list", str(UPSAMP),
        "--update_AlphaMask_list", str(MASK_UPDATES[0]),
        "--update_AlphaMask_list", str(MASK_UPDATES[1]),
        "--shadingMode", "MLP_Fea",
        "--view_pe", "2", "--fea_pe", "2",
        "--L1_weight_inital", "8e-5",
        "--L1_weight_rest", "4e-5",
        "--rm_weight_mask_thre", "1e-3",
        "--N_vis", "0", "--vis_every", "100000",
        "--step_ratio", "0.5",
    ]
    for k, v in extra.items():
        argv += [f"--{k}", str(v)]
    return config_parser(argv)


def _psnr(scene, config, params, mask):
    test_ds = load_blender(scene, split="test", is_stack=True)
    return float(np.mean(evaluation(
        test_ds, config, params, mask, save_path=None, N_vis=-1,
        white_bg=True, compute_extra_metrics=False, chunk=4096,
    )))


class _SimulatedCrash(RuntimeError):
    pass


@pytest.fixture(scope="module")
def runs(fixture_scene, tmp_path_factory):
    base = tmp_path_factory.mktemp("resume_runs")

    # A: uninterrupted reference run
    cfg_a, p_a, m_a, _ = reconstruction(
        _args(fixture_scene, base, "uninterrupted"), log_fn=lambda *a: None
    )
    psnr_a = _psnr(fixture_scene, cfg_a, p_a, m_a)

    # B: crash after the it-160 periodic checkpoint
    def crashing_log(msg):
        m = re.match(r"it (\d+) ", str(msg))
        if m and int(m.group(1)) >= 170:
            raise _SimulatedCrash(msg)

    with pytest.raises(_SimulatedCrash):
        reconstruction(
            _args(fixture_scene, base, "crashed", ckpt_every=CKPT_EVERY),
            log_fn=crashing_log,
        )
    logdir = os.path.join(base, "crashed")
    ckpt = os.path.join(logdir, "crashed_phase.npz")
    return dict(base=base, psnr_a=psnr_a, cfg_a=cfg_a, logdir=logdir,
                ckpt=ckpt)


def test_periodic_ckpt_written_mid_phase(runs):
    assert os.path.exists(runs["ckpt"])
    with open(os.path.join(runs["logdir"], "phase_ckpt.json")) as f:
        meta = json.load(f)
    # last periodic save before the crash at ~170 is the mid-phase it 160
    assert meta["it"] == 160


def test_mid_phase_resume_matches_uninterrupted(runs, fixture_scene):
    logs = []
    args = _args(fixture_scene, runs["base"], "crashed",
                 ckpt_every=CKPT_EVERY)
    args.ckpt = runs["ckpt"]
    args.resume_iter = 160
    cfg_c, p_c, m_c, _ = reconstruction(args, log_fn=logs.append)

    # schedule state at the join: grid/samples from the checkpoint, LR
    # decayed from the last upsample boundary (120), NOT from iteration 0
    join = next(s for s in logs if s.startswith("resuming at it 160"))
    ck_cfg, _, _ = load_field(runs["ckpt"])
    m = re.match(
        r"resuming at it 160 \(grid \((\d+), (\d+), (\d+)\), (\d+) samples, "
        r"lr decay ([0-9.]+)\)", join)
    assert m, join
    grid = tuple(int(g) for g in m.group(1, 2, 3))
    assert grid == tuple(ck_cfg.grid_size)
    assert int(m.group(4)) == min(
        args.nSamples, cal_n_samples(ck_cfg.grid_size, args.step_ratio))
    lr_factor = args.lr_decay_target_ratio ** (1.0 / args.n_iters)
    assert float(m.group(5)) == pytest.approx(lr_factor ** (160 - UPSAMP),
                                              abs=5e-5)

    # end state matches the uninterrupted schedule
    assert tuple(cfg_c.grid_size) == tuple(runs["cfg_a"].grid_size)
    psnr_c = _psnr(fixture_scene, cfg_c, p_c, m_c)
    assert psnr_c > 20.0
    assert abs(psnr_c - runs["psnr_a"]) < 3.0, (psnr_c, runs["psnr_a"])

    # the completed resume ends past the 200 phase boundary, whose
    # auto-save overwrote the phase checkpoint — set up for the
    # boundary-resume test below
    with open(os.path.join(runs["logdir"], "phase_ckpt.json")) as f:
        runs["boundary_meta"] = json.load(f)


def test_phase_boundary_resume(runs, fixture_scene):
    # the tail of the resumed run saved its last periodic/phase ckpt at a
    # boundary (200 = update_AlphaMask) or periodic stop (240)
    meta = runs.get("boundary_meta")
    assert meta is not None and meta["it"] in (200, 240)
    start = meta["it"]

    args = _args(fixture_scene, runs["base"], "crashed",
                 ckpt_every=CKPT_EVERY)
    args.ckpt = runs["ckpt"]
    args.resume_iter = start
    cfg_d, p_d, m_d, _ = reconstruction(args, log_fn=lambda *a: None)
    assert tuple(cfg_d.grid_size) == tuple(runs["cfg_a"].grid_size)
    psnr_d = _psnr(fixture_scene, cfg_d, p_d, m_d)
    assert psnr_d > 20.0
    assert abs(psnr_d - runs["psnr_a"]) < 3.0, (psnr_d, runs["psnr_a"])
