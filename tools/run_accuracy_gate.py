"""One-command pose-accuracy gate (VERDICT r3 #6).

Chains the full weights-available accuracy pipeline:

  1. DINOv2 ViT-S/14 conversion (tools/convert_dinov2.py) — skipped when
     ``--dinov2`` is already a converted ``.npz``;
  2. ID-module training + pose evaluation (train_eval_pose_est.py with
     ``--backbone_ckpt``), the reference driver flow
     (train_eval_pose_est.py:24-154);
  3. aggregation (tools/compute_eval_statistics.py:38-112 schema);
  4. threshold assertions on the aggregate medians.

This zero-egress image has no DINOv2 checkpoint (the reference pulls it
via torch.hub at runtime, pose_estimation/backbone.py:12), so accuracy
parity cannot be *executed* here — this script makes it ONE COMMAND the
day weights exist:

    python tools/run_accuracy_gate.py \
        --dinov2 dinov2_vits14.pth \
        --config configs/lego.txt --datadir data/nerf_synthetic \
        --exp_patch log --out_dir /tmp/gate

Expected range: the IFFNeRF paper (arXiv:2403.12682, Tab. I/II) reports
median errors on Synthetic-NeRF in the few-degree / few-centimeter
regime; the paper PDF is not vendored in the reference repo (BASELINE.md)
so no exact numbers are hardcoded — set ``--max_median_rot_deg`` /
``--max_median_trans`` from the paper table for the scene under test.
The defaults (30 deg / 0.5 units) are deliberately loose sanity bounds
that still catch a broken pipeline (random poses on a blender orbit
measure ~90 deg / ~3 units, tests/test_pose_pipeline.py scale).

Exit code 0 = gate passed; 1 = threshold violated; 2 = pipeline error.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REQUIRED_ROW_FIELDS = (
    "sequence_id", "category_name", "frame_id", "loss", "scores_loss",
    "recall", "total_optimization_time_in_ms", "pred_c2w", "gt_c2w",
)
REQUIRED_STAT_FIELDS = (
    "n", "mean_angular_error", "median_angular_error",
    "mean_translation_error", "median_translation_error",
    "ang_acc@5.", "tr_acc@.1", "mean_inference_time_s",
)


def convert_weights(dinov2: str, out_dir: str) -> str:
    """Step 1: produce the converted npz (no-op for an existing npz)."""
    if dinov2.endswith(".npz"):
        if not os.path.exists(dinov2):
            raise FileNotFoundError(dinov2)
        return dinov2
    out = os.path.join(out_dir, "dinov2_vits14.npz")
    cmd = [sys.executable, os.path.join(REPO, "tools", "convert_dinov2.py"),
           "--out", out]
    if os.path.exists(dinov2):
        cmd += ["--torch_ckpt", dinov2]
    else:
        cmd += ["--hf", dinov2]
    subprocess.run(cmd, check=True)
    return out


def run_pose_pipeline(args, backbone_ckpt: str | None) -> str:
    """Step 2: the reference-parity pose driver; returns the JSON path."""
    out_json = os.path.join(args.out_dir, "pose_results.json")
    cmd = [
        sys.executable, os.path.join(REPO, "train_eval_pose_est.py"),
        "--config", args.config,
        "--datadir", args.datadir,
        "--exp_patch", args.exp_patch,
        "--out_path", out_json,
        "--id_iters", str(args.id_iters),
        "--accum_steps", str(args.accum_steps),
        "--gen_points", str(args.gen_points),
    ]
    if backbone_ckpt:
        cmd += ["--backbone_ckpt", backbone_ckpt]
    else:
        cmd += ["--id_backbone_depth", str(args.id_backbone_depth)]
    if args.extra_args:
        cmd += args.extra_args
    subprocess.run(cmd, check=True)
    return out_json


def aggregate(out_json: str, out_dir: str) -> dict:
    """Step 3: reference-schema aggregation + schema assertions."""
    with open(out_json) as fh:
        rows = json.load(fh)
    if not rows:
        raise RuntimeError(
            f"{out_json} holds no result rows — check the exp dir naming "
            "(tensorf_<obj>_VM) and --limit_categories"
        )
    for field in REQUIRED_ROW_FIELDS:
        if field not in rows[0]:
            raise RuntimeError(f"result rows missing field {field!r}")

    from tools.compute_eval_statistics import evaluate_poses

    stats = evaluate_poses(out_json)
    for field in REQUIRED_STAT_FIELDS:
        if field not in stats:
            raise RuntimeError(f"aggregate stats missing field {field!r}")
    with open(os.path.join(out_dir, "gate_stats.json"), "w") as fh:
        json.dump(stats, fh, indent=2, default=list)
    return stats


def apply_gate(stats: dict, args) -> bool:
    checks = {
        "median_angular_error": (stats["median_angular_error"],
                                 args.max_median_rot_deg),
        "median_translation_error": (stats["median_translation_error"],
                                     args.max_median_trans),
    }
    if args.min_acc5 is not None:
        checks["ang_acc@5."] = (-stats["ang_acc@5."], -args.min_acc5)
    ok = True
    for name, (value, bound) in checks.items():
        passed = value <= bound
        ok = ok and passed
        print(f"gate {name}: {abs(value):.4g} "
              f"{'<=' if passed else '>'} {abs(bound):.4g} "
              f"[{'OK' if passed else 'FAIL'}]")
    return ok


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="convert -> train ID module -> evaluate -> assert")
    ap.add_argument("--dinov2", default=None,
                    help="torch checkpoint / HF name / converted npz of "
                         "DINOv2 ViT-S/14; omit (with --allow_random_init) "
                         "for a plumbing-only run")
    ap.add_argument("--allow_random_init", action="store_true",
                    help="run without pretrained weights (pipeline smoke "
                         "only — novel-view accuracy needs DINOv2, "
                         "BASELINE.md pose-validation table)")
    ap.add_argument("--config", required=True)
    ap.add_argument("--datadir", required=True)
    ap.add_argument("--exp_patch", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--id_iters", type=int, default=1500)
    ap.add_argument("--accum_steps", type=int, default=32)
    ap.add_argument("--gen_points", type=int, default=20000)
    ap.add_argument("--id_backbone_depth", type=int, default=12)
    ap.add_argument("--max_median_rot_deg", type=float, default=30.0)
    ap.add_argument("--max_median_trans", type=float, default=0.5)
    ap.add_argument("--min_acc5", type=float, default=None,
                    help="optional minimum ang_acc@5deg percentage")
    ap.add_argument("extra_args", nargs="*",
                    help="passed through to train_eval_pose_est.py")
    args = ap.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    try:
        if args.dinov2 is None:
            if not args.allow_random_init:
                ap.error("--dinov2 is required (or pass "
                         "--allow_random_init for a plumbing smoke run)")
            backbone = None
        else:
            backbone = convert_weights(args.dinov2, args.out_dir)
        out_json = run_pose_pipeline(args, backbone)
        stats = aggregate(out_json, args.out_dir)
    except (subprocess.CalledProcessError, RuntimeError, OSError) as e:
        print(f"accuracy gate pipeline error: {e}", file=sys.stderr)
        return 2
    ok = apply_gate(stats, args)
    print(json.dumps({
        "gate": "pose_accuracy",
        "passed": bool(ok),
        "median_angular_error_deg": stats["median_angular_error"],
        "median_translation_error": stats["median_translation_error"],
        "n_images": stats["n"],
        "pretrained_backbone": args.dinov2 is not None,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
