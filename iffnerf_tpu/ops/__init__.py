from iffnerf_tpu.ops.grid_sample import (
    grid_sample_1d,
    grid_sample_2d,
    grid_sample_3d,
)
from iffnerf_tpu.ops.ray_march import raw2alpha, exclusive_transmittance
from iffnerf_tpu.ops.encoding import positional_encoding
from iffnerf_tpu.ops.sh import eval_sh_bases, eval_sh
from iffnerf_tpu.ops.ide import integrated_dir_enc_coeffs, integrated_dir_enc
from iffnerf_tpu.ops.image import linear_to_srgb, srgb_to_linear
from iffnerf_tpu.ops.interpolate import resize_bilinear_ac, resize_linear_ac
