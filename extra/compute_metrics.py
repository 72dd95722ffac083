"""Standalone PSNR/SSIM(/LPIPS if available) over saved image pairs
(reference extra/compute_metrics.py, with its free-variable bugs fixed).

Usage: python extra/compute_metrics.py <renders_dir> <gt_dir>
Matches files by sorted order; images must be same-size PNG/JPG.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iffnerf_tpu.utils.metrics import mse2psnr, rgb_ssim, rgb_lpips


def load_dir(path: str):
    from PIL import Image

    files = sorted(
        f for f in os.listdir(path)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    return [
        np.asarray(Image.open(os.path.join(path, f)).convert("RGB"),
                   dtype=np.float32) / 255.0
        for f in files
    ]


def main(render_dir: str, gt_dir: str):
    renders = load_dir(render_dir)
    gts = load_dir(gt_dir)
    assert len(renders) == len(gts), "directory image counts differ"

    psnrs, ssims, lpips_a = [], [], []
    for r, g in zip(renders, gts):
        psnrs.append(mse2psnr(float(np.mean((r - g) ** 2))))
        ssims.append(rgb_ssim(r, g, 1.0))
        try:
            lpips_a.append(rgb_lpips(g, r, "alex"))
        except RuntimeError:
            pass
    print(f"PSNR: {np.mean(psnrs):.3f}")
    print(f"SSIM: {np.mean(ssims):.4f}")
    if lpips_a:
        print(f"LPIPS(alex): {np.mean(lpips_a):.4f}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
