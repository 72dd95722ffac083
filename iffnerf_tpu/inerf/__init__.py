"""iNeRF iterative pose-refinement baseline (reference inerf/)."""

from iffnerf_tpu.inerf.estimate import (
    estimate_pose_inerf,
    camera_transfer,
    soft_dice_loss,
    find_poi,
)
