"""Radiance-field model layer: tensor-factorized fields + shading heads.

TPU-first re-design of the reference model layer (models/tensorBase.py,
models/tensoRF.py, models/ref.py): pure-functional pytrees, static shapes,
dense masked compute instead of boolean-mask gathers.
"""

from iffnerf_tpu.models.field import (
    FieldConfig,
    init_field,
    compute_densityfeature,
    compute_appfeature,
    feature2density,
    normalize_coord,
    density_l1,
    tv_loss_density,
    tv_loss_app,
    vector_comp_diffs,
    upsample_volume_grid,
    shrink,
    AlphaMask,
    sample_alpha,
    get_dense_alpha,
    update_alpha_mask,
)
from iffnerf_tpu.models.shading import init_shading, apply_shading, compute_normals
from iffnerf_tpu.models.render import (
    render_rays,
    sample_ray,
    sample_ray_ndc,
    sample_point_color_fn,
    compute_alpha,
    filtering_rays_bbox,
)
