"""IFFNeRF pose-estimation pipeline (reference pose_estimation/)."""

from iffnerf_tpu.pose.isocell import isocell_distribution, rotate_isocell
from iffnerf_tpu.pose.geometry import (
    compute_line_intersection_impl2,
    make_rotation_mat,
    exclude_negatives,
    compute_translation_error,
    compute_angular_error,
)
