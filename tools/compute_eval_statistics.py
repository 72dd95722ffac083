"""Pose-JSON aggregation: mean/std/95% CI of angular & translation errors,
threshold accuracies acc@{2.5°,5°,10°,30°} / acc@{0.1,0.2,0.5}, inference
time (reference tools/compute_eval_statistics.py:33-176; CSV instead of
Excel — no openpyxl needed).

Usage: python tools/compute_eval_statistics.py <dir_of_jsons|json> [out.csv]
"""

from __future__ import annotations

import json
import os
import sys
from math import sqrt

import numpy as np

ANGULAR_LEVELS = ("2.5", "5.", "10.", "30.")
TRANSLATION_LEVELS = (".1", ".2", ".5")


def compute_angular_error(rotation_gt, rotation_est):
    cos_angle = (np.trace(rotation_gt @ np.linalg.inv(rotation_est)) - 1) / 2
    return np.degrees(np.arccos(np.clip(cos_angle, -1, 1)))


def compute_confidence_interval(n, mean, std, confidence: float = 0.95):
    from scipy.stats import t

    t_crit = abs(t.ppf((1 - confidence) / 2, n - 1))
    half = std * t_crit / sqrt(n)
    return mean - half, mean + half


def evaluate_poses(filepath: str):
    with open(filepath) as fh:
        results = json.load(fh)

    angular_errors, translation_errors = [], []
    inference_times, photometric_errors = [], []
    ang_hits = {lv: [] for lv in ANGULAR_LEVELS}
    tr_hits = {lv: [] for lv in TRANSLATION_LEVELS}

    for result in results:
        gt_c2w = np.asarray(result["gt_c2w"])
        pred_c2w = np.asarray(result["pred_c2w"])
        ang = compute_angular_error(
            np.linalg.inv(gt_c2w)[:3, :3], np.linalg.inv(pred_c2w)[:3, :3]
        )
        tr = float(np.linalg.norm(gt_c2w[:3, 3] - pred_c2w[:3, 3]))
        angular_errors.append(float(ang))
        translation_errors.append(tr)
        for lv in ANGULAR_LEVELS:
            if ang < float(lv):
                ang_hits[lv].append(ang)
        for lv in TRANSLATION_LEVELS:
            if tr < float(lv):
                tr_hits[lv].append(tr)
        inference_times.append(result["total_optimization_time_in_ms"])
        photometric_errors.append(result["loss"])

    n = len(results)
    stats = {
        "n": n,
        "mean_angular_error": float(np.mean(angular_errors)),
        "std_angular_error": float(np.std(angular_errors, ddof=1)),
        "mean_translation_error": float(np.mean(translation_errors)),
        "std_translation_error": float(np.std(translation_errors, ddof=1)),
        "median_angular_error": float(np.median(angular_errors)),
        "median_translation_error": float(np.median(translation_errors)),
        "mean_inference_time_s": float(np.mean(inference_times)) / 1000.0,
        "mean_photometric_error": float(np.mean(photometric_errors)),
    }
    stats["angular_ci95"] = compute_confidence_interval(
        n, stats["mean_angular_error"], stats["std_angular_error"]
    )
    stats["translation_ci95"] = compute_confidence_interval(
        n, stats["mean_translation_error"], stats["std_translation_error"]
    )
    for lv in ANGULAR_LEVELS:
        stats[f"ang_acc@{lv}"] = 100.0 * len(ang_hits[lv]) / n
        stats[f"ang_err@{lv}"] = (
            float(np.mean(ang_hits[lv])) if ang_hits[lv] else float("nan")
        )
    for lv in TRANSLATION_LEVELS:
        stats[f"tr_acc@{lv}"] = 100.0 * len(tr_hits[lv]) / n
        stats[f"tr_err@{lv}"] = (
            float(np.mean(tr_hits[lv])) if tr_hits[lv] else float("nan")
        )
    return stats


def explore_and_compute_stats(dir_to_explore: str, out_path: str | None):
    import pandas as pd

    if os.path.isfile(dir_to_explore):
        files = [dir_to_explore]
    else:
        files = sorted(
            os.path.join(dir_to_explore, f)
            for f in os.listdir(dir_to_explore)
            if f.endswith(".json")
        )
    rows = []
    for f in files:
        try:
            stats = evaluate_poses(f)
        except (KeyError, ValueError, json.JSONDecodeError) as e:
            print(f"skipping {f}: {e}")
            continue
        stats["file"] = os.path.basename(f)
        rows.append(stats)
        print(f"{f}: ang {stats['mean_angular_error']:.2f}deg "
              f"tr {stats['mean_translation_error']:.3f} "
              f"acc@5deg {stats['ang_acc@5.']:.1f}%")
    df = pd.DataFrame(rows)
    if out_path:
        df.to_csv(out_path, index=False)
        print(f"wrote {out_path}")
    return df


if __name__ == "__main__":
    target = sys.argv[1] if len(sys.argv) > 1 else "."
    out = sys.argv[2] if len(sys.argv) > 2 else None
    explore_and_compute_stats(target, out)
