#!/usr/bin/env python
"""Study how image-color-histogram similarity between train and test views
relates to camera distance (working replacement for the reference's
tools/display_histogram_correlation.py:20-100, which is broken upstream —
it imports a `build_hist` from a module that does not exist).

For every (train, test) image pair:
  - per-image 255-bin luminance histogram (density-normalized),
  - similarity under --comparison pearson|spearman|chi_squared|L2|kl_divergence,
  - Euclidean distance between the camera centers.
Writes a CSV of (distance, coefficient) pairs and, when matplotlib is
available, the reference's scatter plot as a PNG.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_hist(images: np.ndarray, n_bins: int = 255) -> np.ndarray:
    """[N, H*W, C] (or [N, H, W, C]) float images -> [N, n_bins] density
    histograms over all channels."""
    flat = images.reshape(images.shape[0], -1)
    top = max(float(flat.max()), 1e-8)
    edges = np.linspace(0.0, top, n_bins + 1)
    return np.stack(
        [np.histogram(img, bins=edges, density=True)[0] for img in flat]
    )


def _rankdata(x: np.ndarray) -> np.ndarray:
    """Average-tie ranks along the last axis (for Spearman)."""
    order = np.argsort(x, axis=-1)
    ranks = np.empty_like(order, dtype=np.float64)
    np.put_along_axis(
        ranks, order,
        np.broadcast_to(np.arange(x.shape[-1], dtype=np.float64), x.shape),
        axis=-1,
    )
    # average ties
    out = np.empty_like(ranks)
    for i, row in enumerate(x):
        _, inv, counts = np.unique(row, return_inverse=True,
                                   return_counts=True)
        sums = np.zeros(counts.shape[0])
        np.add.at(sums, inv, ranks[i])
        out[i] = sums[inv] / counts[inv]
    return out


def _pearson_rows(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = a - a.mean(-1, keepdims=True)
    b = b - b.mean(-1, keepdims=True)
    denom = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return np.einsum("ij,ij->i", a, b) / np.maximum(denom, 1e-12)


def pairwise_coefficients(train_hists: np.ndarray, test_hists: np.ndarray,
                          comparison: str) -> np.ndarray:
    """[N_train, bins] x [N_test, bins] -> [N_train, N_test] coefficients
    (same metric menu as the reference tool)."""
    n_tr, n_te = train_hists.shape[0], test_hists.shape[0]
    ti, si = np.meshgrid(np.arange(n_tr), np.arange(n_te), indexing="ij")
    a = train_hists[ti.ravel()]
    b = test_hists[si.ravel()]
    if comparison == "pearson":
        coef = _pearson_rows(a, b)
    elif comparison == "spearman":
        coef = _pearson_rows(_rankdata(a), _rankdata(b))
    elif comparison == "chi_squared":
        coef = 0.5 * np.sum(np.square(a - b) / np.maximum(a + b, 1e-12), -1)
    elif comparison == "L2":
        coef = np.sqrt(np.sum(np.square(a - b), -1))
    elif comparison == "kl_divergence":
        coef = np.sum(
            np.where(b > 0, b * (np.log(np.maximum(b, 1e-12))
                                 - np.log(np.maximum(a, 1e-12))), 0.0), -1)
    else:
        raise ValueError(f"Unknown comparison method: {comparison}")
    return coef.reshape(n_tr, n_te)


def compute_correlation(datadir: str, comparison: str = "chi_squared",
                        out_csv: str = "hist_correlation.csv",
                        out_png: str | None = None,
                        downsample: float = 1.0):
    from iffnerf_tpu.data import load_blender

    train = load_blender(datadir, split="train", downsample=downsample,
                         is_stack=True)
    test = load_blender(datadir, split="test", downsample=downsample,
                        is_stack=True)
    train_hists = build_hist(np.asarray(train.all_rgbs))
    test_hists = build_hist(np.asarray(test.all_rgbs))

    # camera centers are the translation column of the c2w poses
    tr_pos = np.asarray(train.poses)[:, :3, 3]
    te_pos = np.asarray(test.poses)[:, :3, 3]
    distances = np.linalg.norm(tr_pos[:, None] - te_pos[None], axis=-1)

    coef = pairwise_coefficients(train_hists, test_hists, comparison)

    with open(out_csv, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["train_idx", "test_idx", "distance", comparison])
        for i in range(coef.shape[0]):
            for j in range(coef.shape[1]):
                writer.writerow([i, j, distances[i, j], coef[i, j]])
    print(f"wrote {coef.size} pairs -> {out_csv}")

    if out_png:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            print("matplotlib not available; skipping plot")
            return distances, coef
        plt.scatter(distances.ravel(), coef.ravel(), s=4)
        plt.suptitle(f"Correlation results using the {comparison} metric")
        plt.xlabel("Geodetic distance")
        plt.ylabel("Correlation")
        if comparison in ("spearman", "pearson"):
            plt.ylim([0.5, 1.0])
        plt.savefig(out_png, dpi=120)
        print(f"wrote {out_png}")
    return distances, coef


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("datadir", help="NeRF-synthetic object dir")
    ap.add_argument("--comparison", default="chi_squared",
                    choices=["pearson", "spearman", "chi_squared", "L2",
                             "kl_divergence"])
    ap.add_argument("--out_csv", default="hist_correlation.csv")
    ap.add_argument("--out_png", default=None)
    ap.add_argument("--downsample", type=float, default=1.0)
    a = ap.parse_args()
    compute_correlation(a.datadir, a.comparison, a.out_csv, a.out_png,
                        a.downsample)
