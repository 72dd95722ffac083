"""IFFNeRF pose-estimation pipeline (reference pose_estimation/)."""

from iffnerf_tpu.pose.isocell import isocell_distribution, rotate_isocell
from iffnerf_tpu.pose.geometry import (
    compute_line_intersection,
    compute_line_intersection_impl2,
    compute_line_intersection_impl3,
    compute_line_intersection_impl4,
    make_rotation_mat,
    exclude_negatives,
    compute_translation_error,
    compute_angular_error,
)
from iffnerf_tpu.pose.sampling import (
    explore_field,
    iterative_surface_sampling_process,
    samples_points_normals,
    generate_all_possible_rays,
)
from iffnerf_tpu.pose.id_module import (
    IDConfig,
    init_id_module,
    ray_bank,
    run_attention,
    test_image,
    distance_based_score_loss,
)
from iffnerf_tpu.pose.solve import (
    estimate_pose_single,
    estimate_pose_single_banked,
    estimate_pose_single_sharded,
    solve_pose_from_topk,
)
from iffnerf_tpu.pose.trainer import train_id_module, make_id_train_step
from iffnerf_tpu.pose.test import test_pose_estimation
