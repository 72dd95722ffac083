"""Per-object medians/means over pose-result JSONs
(reference tools/per_object_results.py).

Usage: python tools/per_object_results.py <results.json> [out.csv]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compute_eval_statistics import compute_angular_error  # noqa: E402


def evaluate_poses_per_object(filepath: str, object_id_fields=None):
    object_id_fields = object_id_fields or ["sequence_id", "category_name"]
    with open(filepath) as fh:
        results = json.load(fh)

    buckets: dict = {}
    for result in results:
        oid = "_".join(str(result[f]) for f in object_id_fields)
        gt = np.asarray(result["gt_c2w"])
        pred = np.asarray(result["pred_c2w"])
        ang = compute_angular_error(
            np.linalg.inv(gt)[:3, :3], np.linalg.inv(pred)[:3, :3]
        )
        tr = float(np.linalg.norm(gt[:3, 3] - pred[:3, 3]))
        b = buckets.setdefault(
            oid, {"angular": [], "translation": [], "time_ms": []}
        )
        b["angular"].append(float(ang))
        b["translation"].append(tr)
        b["time_ms"].append(result["total_optimization_time_in_ms"])

    rows = []
    for oid, b in sorted(buckets.items()):
        rows.append({
            "object": oid,
            "n": len(b["angular"]),
            "mean_angular": float(np.mean(b["angular"])),
            "median_angular": float(np.median(b["angular"])),
            "mean_translation": float(np.mean(b["translation"])),
            "median_translation": float(np.median(b["translation"])),
            "mean_time_ms": float(np.mean(b["time_ms"])),
        })
    return rows


if __name__ == "__main__":
    rows = evaluate_poses_per_object(sys.argv[1])
    for r in rows:
        print(f"{r['object']}: median ang {r['median_angular']:.2f}deg "
              f"median tr {r['median_translation']:.4f} (n={r['n']})")
    if len(sys.argv) > 2:
        import pandas as pd

        pd.DataFrame(rows).to_csv(sys.argv[2], index=False)
        print(f"wrote {sys.argv[2]}")
