"""Combine repeated pose-eval rows for the same frame by averaging the
numeric fields (reference tools/statistic_mean.py, minus its breakpoint()).

Usage: python tools/statistic_mean.py <in.json> <out.json>
"""

from __future__ import annotations

import json
import statistics
import sys

ID_FIELDS = ("sequence_id", "category_name", "frame_id")


def combine_pose_eval_files(input_result_file: str, output_result_file: str):
    with open(input_result_file) as fh:
        input_results = json.load(fh)

    grouped: dict = {}
    for row in input_results:
        key = tuple(row[f] for f in ID_FIELDS)
        if key not in grouped:
            grouped[key] = {
                k: (v if k in ID_FIELDS else [v]) for k, v in row.items()
            }
        else:
            for k, v in row.items():
                if k in ID_FIELDS:
                    continue
                grouped[key][k].append(v)

    def reduce_value(values):
        if all(isinstance(v, (int, float)) for v in values):
            return statistics.mean(values)
        return values[0]

    output = [
        {k: (v if k in ID_FIELDS else reduce_value(v))
         for k, v in bucket.items()}
        for bucket in grouped.values()
    ]
    with open(output_result_file, "w") as fh:
        json.dump(output, fh)
    print(f"wrote {output_result_file} ({len(output)} rows)")
    return output


if __name__ == "__main__":
    combine_pose_eval_files(sys.argv[1], sys.argv[2])
