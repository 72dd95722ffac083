"""Misc infrastructure: grid math, metrics, mesh export (reference utils.py)."""

from iffnerf_tpu.utils.misc import N_to_reso, cal_n_samples, n_voxel_schedule
from iffnerf_tpu.utils.metrics import mse2psnr, rgb_ssim, rgb_lpips
