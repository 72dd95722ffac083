"""Offline analysis tools: histogram-correlation study metrics
(reference tools/display_histogram_correlation.py:20-100, broken upstream)
and the pose-JSON statistics aggregator."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.histogram_correlation import (  # noqa: E402
    build_hist,
    pairwise_coefficients,
)


def test_pairwise_coefficients_match_scipy():
    scipy_stats = pytest.importorskip("scipy.stats")
    rng = np.random.default_rng(0)
    a = rng.random((4, 50))
    b = rng.random((3, 50))

    pear = pairwise_coefficients(a, b, "pearson")
    spear = pairwise_coefficients(a, b, "spearman")
    for i in range(4):
        for j in range(3):
            np.testing.assert_allclose(
                pear[i, j], scipy_stats.pearsonr(a[i], b[j])[0], atol=1e-10
            )
            np.testing.assert_allclose(
                spear[i, j], scipy_stats.spearmanr(a[i], b[j])[0], atol=1e-10
            )

    for metric in ("chi_squared", "L2", "kl_divergence"):
        coef = pairwise_coefficients(a, b, metric)
        assert coef.shape == (4, 3) and np.isfinite(coef).all()
    with pytest.raises(ValueError):
        pairwise_coefficients(a, b, "nope")


def test_build_hist_identical_images_correlate():
    rng = np.random.default_rng(1)
    img = rng.random((2, 8, 8, 3)).astype(np.float32)
    hists = build_hist(img)
    assert hists.shape == (2, 255)
    same = pairwise_coefficients(hists[:1], hists[:1], "pearson")
    assert same[0, 0] > 0.999999
    # chi-squared distance of a histogram with itself is exactly zero
    chi = pairwise_coefficients(hists[:1], hists[:1], "chi_squared")
    np.testing.assert_allclose(chi[0, 0], 0.0, atol=1e-12)


def _rot_z(deg):
    th = np.radians(deg)
    c, s = np.cos(th), np.sin(th)
    m = np.eye(4)
    m[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    return m


def test_eval_statistics_aggregator(tmp_path):
    """compute_eval_statistics consumes the pose-eval JSON schema
    (gt_c2w/pred_c2w/total_optimization_time_in_ms/loss) and writes a CSV
    with threshold accuracies (reference tools/compute_eval_statistics.py
    :33-176)."""
    pytest.importorskip("pandas")
    from tools.compute_eval_statistics import (
        evaluate_poses,
        explore_and_compute_stats,
    )

    gt = _rot_z(0.0)
    records = [
        {"gt_c2w": gt.tolist(), "pred_c2w": _rot_z(2.0).tolist(),
         "total_optimization_time_in_ms": 10.0, "loss": 0.01},
        {"gt_c2w": gt.tolist(), "pred_c2w": _rot_z(20.0).tolist(),
         "total_optimization_time_in_ms": 12.0, "loss": 0.02},
    ]
    in_path = tmp_path / "pose_eval.json"
    in_path.write_text(json.dumps(records))

    stats = evaluate_poses(str(in_path))
    np.testing.assert_allclose(stats["mean_angular_error"], 11.0, atol=1e-4)
    np.testing.assert_allclose(stats["ang_acc@5."], 50.0)
    np.testing.assert_allclose(stats["ang_acc@30."], 100.0)
    np.testing.assert_allclose(stats["tr_acc@.1"], 100.0)

    out_csv = tmp_path / "stats.csv"
    df = explore_and_compute_stats(str(in_path), str(out_csv))
    assert out_csv.exists() and len(df) == 1
