"""Parity tests: TensorVMSplit/TensorCP field + renderer vs the reference
implementation (imported as a golden oracle from /root/reference)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.ref_loader import import_reference

REF = import_reference()
pytestmark = pytest.mark.skipif(REF is None, reason="reference repo not mounted")

from iffnerf_tpu.models import (  # noqa: E402
    AlphaMask,
    FieldConfig,
    compute_alpha,
    compute_appfeature,
    compute_densityfeature,
    init_field,
    normalize_coord,
    density_l1,
    render_rays,
    sample_alpha,
    tv_loss_app,
    tv_loss_density,
    update_alpha_mask,
    upsample_volume_grid,
    vector_comp_diffs,
)

RNG = np.random.default_rng(7)


def make_ref_model(model="TensorVMSplit", shading="MLP_Fea", grid=(16, 17, 18)):
    from models.tensoRF import TensorVMSplit, TensorCP

    cls = {"TensorVMSplit": TensorVMSplit, "TensorCP": TensorCP}[model]
    torch.manual_seed(0)
    return cls(
        torch.tensor([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]]),
        grid,
        "cpu",
        density_n_comp=[2, 3, 4] if model == "TensorVMSplit" else [4, 4, 4],
        appearance_n_comp=[3, 4, 5] if model == "TensorVMSplit" else [6, 6, 6],
        app_dim=9,
        shadingMode=shading,
        featureC=16,
        view_pe=2,
        fea_pe=2,
        pos_pe=2,
    )


def config_from_ref(m, model="TensorVMSplit"):
    return FieldConfig(
        model_name=model,
        aabb=tuple(map(tuple, m.aabb.numpy().tolist())),
        grid_size=tuple(int(g) for g in m.gridSize),
        density_n_comp=tuple(m.density_n_comp),
        app_n_comp=tuple(m.app_n_comp),
        app_dim=m.app_dim,
        shading_mode=m.shadingMode,
        near_far=tuple(m.near_far),
        density_shift=m.density_shift,
        alpha_mask_thres=m.alphaMask_thres,
        distance_scale=m.distance_scale,
        ray_march_weight_thres=m.rayMarch_weight_thres,
        pos_pe=m.pos_pe,
        view_pe=m.view_pe,
        fea_pe=m.fea_pe,
        feature_c=m.featureC,
        step_ratio=m.step_ratio,
        fea2dense_act=m.fea2denseAct,
    )


def _t2j_linear(linear):
    p = {"w": jnp.asarray(linear.weight.detach().numpy().T)}
    if linear.bias is not None:
        p["b"] = jnp.asarray(linear.bias.detach().numpy())
    return p


def params_from_ref(m, model="TensorVMSplit", shading="MLP_Fea"):
    params = {}
    if model == "TensorVMSplit":
        params["density_plane"] = tuple(
            jnp.asarray(p.detach().numpy()[0].transpose(1, 2, 0))
            for p in m.density_plane
        )
        params["app_plane"] = tuple(
            jnp.asarray(p.detach().numpy()[0].transpose(1, 2, 0)) for p in m.app_plane
        )
    params["density_line"] = tuple(
        jnp.asarray(l.detach().numpy()[0, :, :, 0].T) for l in m.density_line
    )
    params["app_line"] = tuple(
        jnp.asarray(l.detach().numpy()[0, :, :, 0].T) for l in m.app_line
    )
    params["basis_mat"] = {"w": jnp.asarray(m.basis_mat.weight.detach().numpy().T)}
    if shading == "MLP_Fea":
        params["shading"] = {
            "mlp": [_t2j_linear(m.renderModule.mlp[i]) for i in (0, 2, 4)]
        }
    elif shading == "Ref":
        rm = m.renderModule
        params["shading"] = {
            "diffuse": _t2j_linear(rm.diffuse_color_mlp[0]),
            "tint": _t2j_linear(rm.tint_color_mlp[0]),
            "roughness": _t2j_linear(rm.roughness_mlp[0]),
            "bottleneck": _t2j_linear(rm.bottleneck_mlp),
            "specular": _t2j_linear(rm.specular_mlp[0]),
            "normal": _t2j_linear(rm.normal_mlp[0]),
        }
    return params


def sample_coords(n=257):
    return (RNG.uniform(-1.1, 1.1, size=(n, 3))).astype(np.float32)


@pytest.mark.parametrize("model", ["TensorVMSplit", "TensorCP"])
def test_density_and_app_feature_parity(model):
    m = make_ref_model(model)
    cfg = config_from_ref(m, model)
    params = params_from_ref(m, model)

    xyz = sample_coords()
    ref_d = m.compute_densityfeature(torch.from_numpy(xyz)).detach().numpy()
    ours_d = np.asarray(compute_densityfeature(cfg, params, jnp.asarray(xyz)))
    np.testing.assert_allclose(ours_d, ref_d, rtol=1e-4, atol=1e-5)

    ref_a = m.compute_appfeature(torch.from_numpy(xyz)).detach().numpy()
    ours_a = np.asarray(compute_appfeature(cfg, params, jnp.asarray(xyz)))
    np.testing.assert_allclose(ours_a, ref_a, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shading", ["MLP_Fea", "Ref"])
def test_forward_parity(shading):
    m = make_ref_model(shading=shading)
    cfg = config_from_ref(m)
    params = params_from_ref(m, shading=shading)

    n = 64
    rays = RNG.standard_normal((n, 7)).astype(np.float32)
    rays[:, :3] *= 3.0
    rays[:, 3:6] /= np.linalg.norm(rays[:, 3:6], axis=-1, keepdims=True)
    rays[:, 6] = np.abs(rays[:, 6]) * 0.01

    with torch.no_grad():
        ref_rgb, ref_depth, ref_acc, ref_alpha, ref_z, ref_dists = m(
            torch.from_numpy(rays), is_train=False, white_bg=True
        )
    rgb, depth, acc, alpha, z_vals, dists = render_rays(
        cfg, params, None, jnp.asarray(rays), is_train=False, white_bg=True
    )
    np.testing.assert_allclose(np.asarray(z_vals), ref_z.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), ref_alpha.numpy(), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(acc), ref_acc.numpy(), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb), ref_rgb.numpy(), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(depth), ref_depth.numpy(), rtol=1e-3, atol=1e-4)


def test_alpha_mask_and_compute_alpha_parity():
    from models.tensorBase import AlphaGridMask

    m = make_ref_model()
    # Random 0.1-scale init under softplus(x - 10) is all-transparent, which
    # makes updateAlphaMask degenerate (no occupied voxels). Boost density so
    # the mask has structure.
    with torch.no_grad():
        for i in range(3):
            m.density_plane[i].mul_(8.0)
            m.density_line[i].mul_(8.0)
    m.density_shift = 0.0
    cfg = config_from_ref(m)
    params = params_from_ref(m)

    new_aabb_ref = m.updateAlphaMask(gridSize=(17, 19, 23))
    mask, new_aabb, occ = update_alpha_mask(cfg, params, None, (17, 19, 23))

    ref_vol = m.alphaMask.alpha_volume[0, 0].numpy()
    np.testing.assert_allclose(np.asarray(mask.volume), ref_vol, atol=1e-6)
    np.testing.assert_allclose(new_aabb, new_aabb_ref.numpy(), rtol=1e-5, atol=1e-6)

    # compute_alpha under the mask
    xyz = (RNG.uniform(-1.6, 1.6, size=(301, 3))).astype(np.float32)
    ref_alpha = (
        m.compute_alpha(torch.from_numpy(xyz), float(m.stepSize)).detach().numpy()
    )
    ours_alpha = np.asarray(
        compute_alpha(cfg, params, mask, jnp.asarray(xyz), cfg.step_size)
    )
    np.testing.assert_allclose(ours_alpha, ref_alpha, rtol=1e-3, atol=1e-5)

    # sample_alpha parity against the torch grid_sample path
    ref_samp = (
        AlphaGridMask("cpu", m.aabb, m.alphaMask.alpha_volume[0, 0])
        .sample_alpha(torch.from_numpy(xyz))
        .numpy()
    )
    np.testing.assert_allclose(
        np.asarray(sample_alpha(mask, jnp.asarray(xyz))), ref_samp, atol=1e-5
    )


def test_upsample_parity():
    m = make_ref_model()
    cfg = config_from_ref(m)
    params = params_from_ref(m)

    m.upsample_volume_grid((24, 26, 28))
    new_cfg, new_params = upsample_volume_grid(cfg, params, (24, 26, 28))

    assert new_cfg.grid_size == (24, 26, 28)
    assert abs(new_cfg.step_size - float(m.stepSize)) < 1e-5
    assert new_cfg.n_samples == m.nSamples
    for i in range(3):
        ref_p = m.density_plane[i].detach().numpy()[0].transpose(1, 2, 0)
        np.testing.assert_allclose(
            np.asarray(new_params["density_plane"][i]), ref_p, rtol=1e-4, atol=1e-5
        )
        ref_l = m.density_line[i].detach().numpy()[0, :, :, 0].T
        np.testing.assert_allclose(
            np.asarray(new_params["density_line"][i]), ref_l, rtol=1e-4, atol=1e-5
        )


def test_regularizer_parity():
    from utils import TVLoss

    m = make_ref_model()
    cfg = config_from_ref(m)
    params = params_from_ref(m)

    np.testing.assert_allclose(
        float(density_l1(cfg, params)), float(m.density_L1()), rtol=1e-5
    )
    tv = TVLoss()
    np.testing.assert_allclose(
        float(tv_loss_density(cfg, params)),
        float(m.TV_loss_density(tv)),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(tv_loss_app(cfg, params)), float(m.TV_loss_app(tv)), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(vector_comp_diffs(cfg, params)),
        float(m.vector_comp_diffs()),
        rtol=1e-4,
    )


def test_init_field_shapes_and_render_jit():
    cfg = FieldConfig(grid_size=(16, 17, 18), density_n_comp=(2, 3, 4),
                      app_n_comp=(3, 4, 5), app_dim=9, shading_mode="Ref",
                      feature_c=16, view_pe=2, fea_pe=2, pos_pe=2)
    params = init_field(jax.random.PRNGKey(0), cfg)
    assert params["density_plane"][0].shape == (17, 16, 2)
    assert params["density_line"][0].shape == (18, 2)
    assert params["basis_mat"]["w"].shape == (12, 9)

    rays = jnp.asarray(RNG.standard_normal((32, 7)).astype(np.float32))
    fn = jax.jit(
        lambda p, r, k: render_rays(cfg, p, None, r, key=k, is_train=True,
                                    white_bg=True)
    )
    rgb, depth, acc, *_ = fn(params, rays, jax.random.PRNGKey(1))
    assert rgb.shape == (32, 3) and np.isfinite(np.asarray(rgb)).all()


def test_fused_features_match_separate():
    """compute_features_fused (packed one-row gathers) must equal the
    separate density/app evaluations."""
    from iffnerf_tpu.models.field import compute_features_fused

    cfg = FieldConfig(grid_size=(16, 17, 18), density_n_comp=(2, 3, 4),
                      app_n_comp=(3, 4, 5), app_dim=9, shading_mode="Ref",
                      feature_c=16, view_pe=2, fea_pe=2, pos_pe=2)
    params = init_field(jax.random.PRNGKey(2), cfg)
    xyz = jnp.asarray(RNG.uniform(-1.15, 1.15, (333, 3)).astype(np.float32))

    sigma_f, app_f = compute_features_fused(cfg, params, xyz)
    sigma_s = compute_densityfeature(cfg, params, xyz)
    app_s = compute_appfeature(cfg, params, xyz)
    np.testing.assert_allclose(np.asarray(sigma_f), np.asarray(sigma_s),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(app_f), np.asarray(app_s),
                               rtol=1e-5, atol=1e-6)


def test_packed_trilerp_matches_grid_sample_3d():
    from iffnerf_tpu.models.field import make_alpha_mask
    from iffnerf_tpu.ops.grid_sample import grid_sample_3d

    vol = jnp.asarray(
        (RNG.uniform(0, 1, (9, 11, 13)) > 0.5).astype(np.float32)
    )
    mask = make_alpha_mask(vol, np.array([[-1.0, -1, -1], [1, 1, 1]]))
    xyz = jnp.asarray(RNG.uniform(-1.2, 1.2, (257, 3)).astype(np.float32))
    ours = np.asarray(sample_alpha(mask, xyz))
    ref = np.asarray(grid_sample_3d(vol, xyz * 1.0))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_compacted_render_matches_dense():
    """Masked-sample compaction (render._compact_fused_features) must be
    exact, including the dense overflow fallback."""
    from iffnerf_tpu.models.field import make_alpha_mask

    cfg_base = dict(grid_size=(16, 17, 18), density_n_comp=(2, 3, 4),
                    app_n_comp=(3, 4, 5), app_dim=9, shading_mode="Ref",
                    feature_c=16, view_pe=2, fea_pe=2, pos_pe=2,
                    fused_eval="on")
    params = init_field(jax.random.PRNGKey(4), FieldConfig(**cfg_base))
    # a mask with ~20% occupancy
    vol = (RNG.uniform(0, 1, (9, 9, 9)) < 0.2).astype(np.float32)
    mask = make_alpha_mask(jnp.asarray(vol),
                           np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]]))

    rays = RNG.standard_normal((64, 7)).astype(np.float32)
    rays[:, :3] *= 3.0
    rays[:, 3:6] /= np.linalg.norm(rays[:, 3:6], axis=-1, keepdims=True)
    rays = jnp.asarray(rays)

    outs = {}
    # dense, compact, forced-overflow, and multi-k count dispatch
    for ratios in ((), (0.5,), (0.01,), (0.01, 0.05, 0.5)):
        cfg = FieldConfig(**cfg_base, compact_ratios_eval=ratios)
        outs[ratios] = render_rays(cfg, params, mask, rays, is_train=False,
                                   white_bg=True)
    for ratios in ((0.5,), (0.01,), (0.01, 0.05, 0.5)):
        for a, b in zip(outs[()], outs[ratios]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_compacted_gradients_match_dense():
    """Gradients through the compact march must equal the dense path's."""
    from iffnerf_tpu.models.field import make_alpha_mask

    cfg_base = dict(grid_size=(12, 12, 12), density_n_comp=(2, 2, 2),
                    app_n_comp=(3, 3, 3), app_dim=6, shading_mode="MLP_Fea",
                    feature_c=16, view_pe=2, fea_pe=2, pos_pe=2,
                    fused_eval="on")
    params = init_field(jax.random.PRNGKey(6), FieldConfig(**cfg_base))
    vol = (RNG.uniform(0, 1, (7, 7, 7)) < 0.3).astype(np.float32)
    mask = make_alpha_mask(jnp.asarray(vol),
                           np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]]))
    rays = RNG.standard_normal((32, 7)).astype(np.float32)
    rays[:, :3] *= 3.0
    rays[:, 3:6] /= np.linalg.norm(rays[:, 3:6], axis=-1, keepdims=True)
    rays = jnp.asarray(rays)
    target = jnp.asarray(RNG.uniform(0, 1, (32, 3)).astype(np.float32))

    def loss(p, ratios):
        cfg = FieldConfig(**cfg_base, compact_ratios_eval=ratios)
        rgb, *_ = render_rays(cfg, p, mask, rays, is_train=False,
                              white_bg=True)
        return jnp.mean((rgb - target) ** 2)

    g_dense = jax.grad(lambda p: loss(p, ()))(params)
    g_comp = jax.grad(lambda p: loss(p, (0.5,)))(params)
    for a, b in zip(jax.tree.leaves(g_dense), jax.tree.leaves(g_comp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
