"""End-to-end smoke: train a tiny TensorVMSplit on the synthetic fixture and
check novel-view PSNR (SURVEY.md §7 minimum slice)."""

import os

import numpy as np
import pytest
import jax

from tests.fixtures import make_blender_fixture

from iffnerf_tpu.config import config_parser
from iffnerf_tpu.data import load_blender
from iffnerf_tpu.render import evaluation
from iffnerf_tpu.train import reconstruction
from iffnerf_tpu.checkpoint import save_field, load_field


@pytest.fixture(scope="module")
def fixture_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("blender_fixture")
    return make_blender_fixture(str(root), n_train=10, n_test=2, wh=48)


def test_blender_loader_contract(fixture_scene):
    train = load_blender(fixture_scene, split="train", is_stack=False)
    assert train.all_rays.shape[-1] == 7
    assert train.all_rgbs.shape[-1] == 4
    assert train.all_rays.shape[0] == 10 * 48 * 48
    assert train.white_bg and train.near_far == (2.0, 6.0)
    # dirs normalized, radii positive
    d = train.all_rays[:, 3:6]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert (train.all_rays[:, 6] > 0).all()

    test = load_blender(fixture_scene, split="test", is_stack=True)
    assert test.all_rays.shape == (2, 48, 48, 7)
    assert test.all_rgbs.shape == (2, 48, 48, 4)


def test_train_e2e_psnr(fixture_scene, tmp_path):
    args = config_parser(
        [
            "--datadir", fixture_scene,
            "--expname", "fixture_vm",
            "--basedir", str(tmp_path),
            "--n_iters", "400",
            "--batch_size", "1024",
            "--N_voxel_init", str(24 ** 3),
            "--N_voxel_final", str(40 ** 3),
            "--upsamp_list", "200",
            "--update_AlphaMask_list", "120",
            "--update_AlphaMask_list", "240",
            "--shadingMode", "Ref",
            "--view_pe", "2",
            "--fea_pe", "2",
            "--L1_weight_inital", "8e-5",
            "--L1_weight_rest", "4e-5",
            "--rm_weight_mask_thre", "1e-3",
            "--N_vis", "0",
            "--vis_every", "100000",
            "--step_ratio", "0.5",
        ]
    )
    config, params, mask, logfolder = reconstruction(args, log_fn=lambda *a: None)
    assert mask is not None

    test_ds = load_blender(fixture_scene, split="test", is_stack=True)
    psnrs = evaluation(
        test_ds, config, params, mask, save_path=None, N_vis=-1,
        white_bg=True, compute_extra_metrics=False, chunk=4096,
    )
    mean_psnr = float(np.mean(psnrs))
    print("novel-view PSNR:", mean_psnr)
    assert mean_psnr > 20.0, f"PSNR too low: {mean_psnr}"

    # checkpoint round-trip preserves eval behavior
    ckpt = os.path.join(logfolder, "fixture_vm.npz")
    config2, params2, mask2 = load_field(ckpt)
    assert config2 == config
    psnrs2 = evaluation(
        test_ds, config2, params2, mask2, save_path=None, N_vis=-1,
        white_bg=True, compute_extra_metrics=False,
    )
    np.testing.assert_allclose(np.mean(psnrs2), mean_psnr, atol=1e-3)


def test_train_scan_mode_matches(fixture_scene, tmp_path):
    """--train_scan (device-resident lax.scan steps) reaches comparable
    PSNR to the per-step path on a short run."""
    args = config_parser(
        [
            "--datadir", fixture_scene,
            "--expname", "fixture_scan",
            "--basedir", str(tmp_path),
            "--n_iters", "150",
            "--batch_size", "1024",
            "--N_voxel_init", str(24 ** 3),
            "--N_voxel_final", str(32 ** 3),
            "--upsamp_list", "120",
            "--update_AlphaMask_list", "80",
            "--shadingMode", "MLP_Fea",
            "--view_pe", "2", "--fea_pe", "2",
            "--L1_weight_inital", "8e-5",
            "--N_vis", "0", "--vis_every", "100000",
            "--step_ratio", "0.5",
            "--train_scan", "1",
        ]
    )
    config, params, mask, _ = reconstruction(args, log_fn=lambda *a: None)
    test_ds = load_blender(fixture_scene, split="test", is_stack=True)
    psnrs = evaluation(
        test_ds, config, params, mask, save_path=None, N_vis=-1,
        white_bg=True, compute_extra_metrics=False,
    )
    assert float(np.mean(psnrs)) > 18.0, psnrs


def test_probe_compact_ratio_low_occupancy():
    """The phase-boundary occupancy probe must pick a ladder buffer that
    covers the measured valid fraction with margin, and decline when the
    fraction is too high for anything below the cap."""
    import jax.numpy as jnp

    from iffnerf_tpu.models import FieldConfig, init_field
    from iffnerf_tpu.models.field import make_alpha_mask
    from iffnerf_tpu.train.trainer import _COMPACT_LADDER, probe_compact_ratio

    cfg = FieldConfig(grid_size=(24, 24, 24), density_n_comp=(4, 4, 4),
                      app_n_comp=(8, 8, 8), app_dim=9, shading_mode="Ref",
                      feature_c=16, view_pe=2, fea_pe=2, step_ratio=1.0)
    g = 33
    lin = np.linspace(-1.5, 1.5, g, dtype=np.float32)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    r = np.sqrt(xx ** 2 + yy ** 2 + zz ** 2)
    sparse = make_alpha_mask(
        jnp.asarray((r < 0.25).astype(np.float32)),
        np.array([[-1.5] * 3, [1.5] * 3], np.float32),
    )

    # rays from a radius-4 shell aimed at the box center: every ray hits
    rng = np.random.default_rng(3)
    d = rng.standard_normal((2048, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([-4.0 * d, d, 0.01 * np.ones((2048, 1), np.float32)],
                          -1)

    ratio, frac = probe_compact_ratio(
        cfg, sparse, rays, jax.random.PRNGKey(0),
        n_samples=cfg.n_samples, batch_size=512, cap=0.25,
    )
    assert 0.0 < frac < 0.15
    assert ratio in _COMPACT_LADDER and ratio < 0.25
    assert ratio >= frac * 1.3

    # a dense mask leaves nothing below the cap -> probe declines
    dense = make_alpha_mask(
        jnp.ones((g, g, g), jnp.float32),
        np.array([[-1.5] * 3, [1.5] * 3], np.float32),
    )
    ratio2, frac2 = probe_compact_ratio(
        cfg, dense, rays, jax.random.PRNGKey(0),
        n_samples=cfg.n_samples, batch_size=512, cap=0.25,
    )
    assert ratio2 is None and frac2 > 0.2
