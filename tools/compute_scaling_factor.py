"""Dataset-vs-checkpoint scale sanity check
(reference tools/compute_scaling_factor.py): for each trained experiment,
compare the checkpoint's (possibly shrunk) AABB against the dataset's
scene bbox and report the scale ratio.

Usage: python tools/compute_scaling_factor.py --exp_patch ./log \
           --datadir ./data/nerf_synthetic --data_type blender
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iffnerf_tpu.data import dataset_dict  # noqa: E402
from iffnerf_tpu.pose.eval_utils import parse_exp_dir  # noqa: E402
from iffnerf_tpu.pose.model_utils import load_model  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp_patch", type=str, required=True)
    ap.add_argument("--datadir", type=str, required=True)
    ap.add_argument("--data_type", type=str, default="blender",
                    choices=["blender", "tankstemple", "mip360"])
    ap.add_argument("--downsample", type=float, default=1.0)
    args = ap.parse_args()

    suffix = "_VM" if args.data_type == "blender" else "_VMtt"
    loader = dataset_dict[args.data_type]
    for exp in parse_exp_dir(args.exp_patch, suffix).values():
        config, params, mask = load_model(exp["checkpoint_filepath"])
        data_path = os.path.join(args.datadir, exp["sequence_id"])
        if not os.path.isdir(data_path):
            data_path = args.datadir
        ds = loader(data_path, split="test", downsample=args.downsample,
                    is_stack=True)
        ckpt_size = config.aabb_np[1] - config.aabb_np[0]
        data_size = np.asarray(ds.scene_bbox[1] - ds.scene_bbox[0])
        print(
            f"{exp['sequence_id']}: ckpt aabb {ckpt_size.tolist()} vs "
            f"dataset bbox {data_size.tolist()} -> "
            f"ratio {(ckpt_size / data_size).tolist()}"
        )


if __name__ == "__main__":
    main()
