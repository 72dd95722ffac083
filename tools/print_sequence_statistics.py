"""Per-frame error dump to CSV + sequence means
(reference tools/print_sequence_statistics.py).

Usage: python tools/print_sequence_statistics.py <results.json> <out.csv>
"""

from __future__ import annotations

import json
import sys

import numpy as np


def evaluate_poses(filepath: str, csv_filepath: str):
    import pandas as pd

    with open(filepath) as fh:
        results = json.load(fh)

    rows = []
    for result in results:
        gt_c2w = np.asarray(result["gt_c2w"])
        pred_c2w = np.asarray(result["pred_c2w"])
        r_rel = np.linalg.inv(gt_c2w)[:3, :3].T @ np.linalg.inv(pred_c2w)[:3, :3]
        ang = float(np.degrees(
            np.arccos(np.clip((np.trace(r_rel) - 1) / 2, -1, 1))
        ))
        tr = float(np.linalg.norm(gt_c2w[:3, 3] - pred_c2w[:3, 3]))
        rows.append({
            "category_names": result["category_name"],
            "frame_ids": result["frame_id"],
            "sequence_ids": result["sequence_id"],
            "angular_errors": ang,
            "translation_errors": tr,
            "inference_times": result["total_optimization_time_in_ms"],
        })
    df = pd.DataFrame(rows)
    df.to_csv(csv_filepath)
    print("File:", filepath)
    print("Mean angular error:", df["angular_errors"].mean())
    print("Mean translation error:", df["translation_errors"].mean())
    print("Mean inference time in s:", df["inference_times"].mean() / 1000)
    return (df["angular_errors"].mean(), df["translation_errors"].mean(),
            df["inference_times"].mean() / 1000)


if __name__ == "__main__":
    evaluate_poses(sys.argv[1], sys.argv[2])
