"""Pose-perturbation experiment over a result JSON (the reference's
tools/shit_file.py, given a usable name and a CLI): replace predictions
with GT poses perturbed by random axis rotations / translations, to study
how the error metrics respond.

Usage: python tools/pose_perturbation_study.py <in.json> <out.json> \
           [--rot_deg 5] [--trans 0.05] [--seed 0]
"""

from __future__ import annotations

import argparse
import copy
import json

import numpy as np


def rot_x(phi):
    c, s = np.cos(phi), np.sin(phi)
    return np.array([[1, 0, 0, 0], [0, c, s, 0], [0, -s, c, 0],
                     [0, 0, 0, 1]])


def rot_y(th):
    c, s = np.cos(th), np.sin(th)
    return np.array([[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0],
                     [0, 0, 0, 1]])


def rot_z(psi):
    c, s = np.cos(psi), np.sin(psi)
    return np.array([[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0],
                     [0, 0, 0, 1]])


def trans(t):
    m = np.eye(4)
    m[:3, 3] = t
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--rot_deg", type=float, default=5.0)
    ap.add_argument("--trans", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    with open(args.input) as fh:
        rows = json.load(fh)

    out = []
    for row in rows:
        row = copy.deepcopy(row)
        gt = np.asarray(row["gt_c2w"])
        angles = np.deg2rad(rng.uniform(-args.rot_deg, args.rot_deg, 3))
        offset = rng.uniform(-args.trans, args.trans, 3)
        perturbed = (
            trans(offset) @ rot_x(angles[0]) @ rot_y(angles[1])
            @ rot_z(angles[2]) @ gt
        )
        row["pred_c2w"] = perturbed.tolist()
        out.append(row)

    with open(args.output, "w") as fh:
        json.dump(out, fh)
    print(f"wrote {args.output} ({len(out)} rows, rot<= {args.rot_deg} deg, "
          f"trans <= {args.trans})")


if __name__ == "__main__":
    main()
