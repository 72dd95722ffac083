"""Parity tests: isocell distribution, Rodrigues rotation, pose solvers,
error metrics vs the reference pose_estimation modules."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.ref_loader import import_reference, load_ref_module

REF = import_reference()
pytestmark = pytest.mark.skipif(REF is None, reason="reference repo not mounted")

from iffnerf_tpu.pose import (  # noqa: E402
    compute_angular_error,
    compute_line_intersection_impl2,
    compute_translation_error,
    exclude_negatives,
    isocell_distribution,
    make_rotation_mat,
    rotate_isocell,
    solve_pose_from_topk,
)

RNG = np.random.default_rng(11)


def test_isocell_parity():
    ref_iso = load_ref_module("pose_estimation/isocell.py", "ref_isocell")
    for target in (27, 10, 100):
        ours = isocell_distribution(target, N0=3, isrand=-1)
        ref = ref_iso.isocell_distribution(
            target, torch.float32, "cpu", N0=3, isrand=-1
        ).numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.linalg.norm(ours, axis=-1), 1.0, atol=1e-5
        )


def test_rotate_isocell_parity():
    ref_iso = load_ref_module("pose_estimation/isocell.py", "ref_isocell")
    dirs = isocell_distribution(27)
    normals = RNG.standard_normal((8, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)

    ours = np.asarray(rotate_isocell(jnp.asarray(dirs), jnp.asarray(normals)))
    ref = ref_iso.rotate_isocell(
        torch.from_numpy(dirs), torch.from_numpy(normals)
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)
    # rotated +z axis should align with -normal
    rot_z = np.asarray(
        rotate_isocell(jnp.asarray([[0.0, 0.0, 1.0]]), jnp.asarray(normals))
    )[:, 0]
    np.testing.assert_allclose(rot_z, -normals, atol=1e-5)


def test_line_intersection_parity_and_recovery():
    ref_geo = load_ref_module(
        "pose_estimation/pose_geometry.py", "ref_pose_geometry"
    )
    center = np.array([0.3, -1.2, 2.0], dtype=np.float32)
    points = RNG.standard_normal((40, 3)).astype(np.float32)
    dirs = center - points
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    # slight noise
    dirs += 0.01 * RNG.standard_normal(dirs.shape).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    weights = RNG.uniform(0.5, 1.0, 40).astype(np.float32)

    ours = np.asarray(
        compute_line_intersection_impl2(
            jnp.asarray(points), jnp.asarray(dirs), jnp.asarray(weights)
        )
    )
    ref = ref_geo.compute_line_intersection_impl2(
        torch.from_numpy(points), torch.from_numpy(dirs),
        torch.from_numpy(weights),
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ours, center, atol=0.05)

    # singular case -> NaN (reference pose_geometry.py:82-83)
    par_dirs = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (5, 1))
    out = np.asarray(
        compute_line_intersection_impl2(
            jnp.asarray(points[:5]), jnp.asarray(par_dirs)
        )
    )
    assert np.isnan(out).all()


def test_make_rotation_and_exclude_negatives_parity():
    ref_geo = load_ref_module(
        "pose_estimation/pose_geometry.py", "ref_pose_geometry"
    )
    d = RNG.standard_normal(3).astype(np.float32)
    d /= np.linalg.norm(d)
    up = np.array([0.1, 0.2, 0.97], dtype=np.float32)
    ours = np.asarray(make_rotation_mat(jnp.asarray(d), jnp.asarray(up)))
    ref = ref_geo.make_rotation_mat(
        torch.from_numpy(d), torch.from_numpy(up)
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    cam = RNG.standard_normal(3).astype(np.float32)
    pts = RNG.standard_normal((20, 3)).astype(np.float32)
    dirs = RNG.standard_normal((20, 3)).astype(np.float32)
    ours_m = np.asarray(
        exclude_negatives(jnp.asarray(cam), jnp.asarray(pts), jnp.asarray(dirs))
    )
    ref_m = ref_geo.exclude_negatives(
        torch.from_numpy(cam), torch.from_numpy(pts), torch.from_numpy(dirs)
    ).numpy()
    np.testing.assert_array_equal(ours_m, ref_m)


def test_error_metric_parity():
    ref_err = load_ref_module("pose_estimation/errors.py", "ref_errors")
    q, _ = np.linalg.qr(RNG.standard_normal((3, 3)))
    q2, _ = np.linalg.qr(RNG.standard_normal((3, 3)))
    q = q.astype(np.float32) * np.sign(np.linalg.det(q)).astype(np.float32)
    q2 = q2.astype(np.float32) * np.sign(np.linalg.det(q2)).astype(np.float32)
    t1 = RNG.standard_normal(3).astype(np.float32)
    t2 = RNG.standard_normal(3).astype(np.float32)

    np.testing.assert_allclose(
        float(compute_translation_error(jnp.asarray(t1), jnp.asarray(t2))),
        float(ref_err.compute_translation_error(
            torch.from_numpy(t1), torch.from_numpy(t2))),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(compute_angular_error(jnp.asarray(q), jnp.asarray(q2))),
        float(ref_err.compute_angular_error(
            torch.from_numpy(q), torch.from_numpy(q2))),
        rtol=1e-3, atol=1e-3,
    )


def test_solve_pose_from_topk_recovers_camera():
    """Synthetic golden test (SURVEY.md §4): rays from surface points toward
    a known camera -> solved pose matches."""
    cam_pos = np.array([2.5, -1.0, 1.8], dtype=np.float32)
    up = np.array([0.0, 0.0, 1.0], dtype=np.float32)

    pts = RNG.uniform(-0.7, 0.7, (100, 3)).astype(np.float32)
    dirs = cam_pos - pts
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    # duplicate two origins: those rays must be dropped by the dedup
    pts[1] = pts[0]
    weights = RNG.uniform(0.5, 1.0, 100).astype(np.float32)

    c2w = np.asarray(
        solve_pose_from_topk(
            jnp.asarray(pts), jnp.asarray(dirs), jnp.asarray(weights),
            jnp.asarray(up),
        )
    )
    np.testing.assert_allclose(c2w[:3, 3], cam_pos, atol=1e-3)
    # camera -z (watch dir in opencv c2w is +z row? reference builds
    # w2c = make_rotation_mat(-watch, up); c2w[:3,:3] = inv -> camera z axis
    # column = -watch direction pointing away from the object.
    watch = -c2w[:3, :3][:, 2]
    mean_dir = dirs.mean(0) / np.linalg.norm(dirs.mean(0))
    assert watch @ mean_dir > 0.99


def test_alternate_line_intersection_solvers():
    """impl1 (cross-product LSQ), impl3 (pinv normal equations), impl4 (IRLS):
    parity with the reference where the formulations agree, plus camera-center
    recovery (reference pose_geometry.py:4-39,98-126,148-171)."""
    from iffnerf_tpu.pose import (
        compute_line_intersection,
        compute_line_intersection_impl3,
        compute_line_intersection_impl4,
    )

    ref_geo = load_ref_module(
        "pose_estimation/pose_geometry.py", "ref_pose_geometry"
    )
    rng = np.random.default_rng(24)
    center = np.array([-0.4, 0.9, 1.3], dtype=np.float32)
    points = rng.standard_normal((30, 3)).astype(np.float32)
    dirs = center - points
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs += 0.005 * rng.standard_normal(dirs.shape).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    weights = rng.uniform(0.5, 1.0, 30).astype(np.float32)

    # impl3: identical formulation (no row filtering) -> strict parity
    ours3 = np.asarray(
        compute_line_intersection_impl3(
            jnp.asarray(points), jnp.asarray(dirs), jnp.asarray(weights)
        )
    )
    ref3 = ref_geo.compute_line_intersection_impl3(
        torch.from_numpy(points), torch.from_numpy(dirs),
        torch.from_numpy(weights),
    ).numpy()
    np.testing.assert_allclose(ours3, ref3, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(ours3, center, atol=0.05)

    # impl1: the reference drops rows where ALL cross components < 1e-7
    # (no abs -- all-negative rows get dropped too); restrict the parity
    # comparison to inputs where no row trips that test, which this seed
    # must satisfy, then check parity + recovery.
    cross = np.cross(dirs[:-1], dirs[1:])
    assert not (cross < 1e-7).all(axis=-1).any(), "seed no longer valid"
    ours1 = np.asarray(
        compute_line_intersection(
            jnp.asarray(points), jnp.asarray(dirs), jnp.asarray(weights)
        )
    )
    ref1 = ref_geo.compute_line_intersection(
        torch.from_numpy(points), torch.from_numpy(dirs),
        torch.from_numpy(weights),
    ).numpy()
    np.testing.assert_allclose(ours1, ref1, rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(ours1, center, atol=0.05)

    # impl4 (IRLS): robust to an outlier ray that pulls plain LSQ away
    out_dirs = dirs.copy()
    out_dirs[7] = np.array([1.0, 0.0, 0.0], np.float32)
    ours4 = np.asarray(
        compute_line_intersection_impl4(
            jnp.asarray(points), jnp.asarray(out_dirs)
        )
    )
    np.testing.assert_allclose(ours4, center, atol=0.05)
