"""Tensor-factorized radiance fields (TensorVMSplit / TensorCP), TPU-first.

Re-design of the reference's model layer (models/tensoRF.py:151-443,
models/tensorBase.py:262-773) as pure functions over parameter pytrees:

  * A static, hashable ``FieldConfig`` carries every compile-time quantity —
    grid sizes, ranks, the AABB, derived step size / sample counts. Grid
    upsampling and AABB shrink change the config (a recompile event, by
    design: 5 upsamples + shrink = a handful of compiled phase programs).
  * Parameters are a flat dict pytree. Planes are stored ``[H, W, R]`` and
    lines ``[L, R]`` (channels on the lane axis) so bilinear gathers
    vectorize on the VPU and the rank reduction rides the MXU.
  * No boolean-mask gathers: callers compute features densely and mask.

Axis conventions follow the reference exactly (tensorBase.py:311-312):
``matMode = [[0,1],[0,2],[1,2]]``, ``vecMode = [2,1,0]`` — plane ``i`` is
indexed by (x=xyz[m0], y=xyz[m1]) and line ``i`` by xyz[vec].
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from iffnerf_tpu.nn import linear_init, linear_apply
from iffnerf_tpu.models.shading import init_shading
from iffnerf_tpu.ops.grid_sample import grid_sample_1d, grid_sample_2d, grid_sample_3d
from iffnerf_tpu.ops.interpolate import resize_bilinear_ac, resize_linear_ac
from iffnerf_tpu.ops.packed_sample import (
    pack_line,
    pack_plane,
    occupancy_grouped,
    pack_volume,
    pack_volume_bits,
    packed_bilerp,
    packed_lerp,
    packed_trilerp,
)

MAT_MODE = ((0, 1), (0, 2), (1, 2))
VEC_MODE = (2, 1, 0)


@dataclasses.dataclass(frozen=True)
class FieldConfig:
    """Static field description (reference TensorBase.__init__ kwargs +
    get_kwargs, tensorBase.py:263-422). Hashable -> usable as a jit static."""

    model_name: str = "TensorVMSplit"
    aabb: tuple = ((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5))
    grid_size: tuple = (128, 128, 128)
    density_n_comp: tuple = (16, 16, 16)
    app_n_comp: tuple = (48, 48, 48)
    app_dim: int = 27
    shading_mode: str = "MLP_PE"
    near_far: tuple = (2.0, 6.0)
    density_shift: float = -10.0
    alpha_mask_thres: float = 0.001
    distance_scale: float = 25.0
    ray_march_weight_thres: float = 0.0001
    pos_pe: int = 6
    view_pe: int = 6
    fea_pe: int = 6
    feature_c: int = 128
    step_ratio: float = 2.0
    fea2dense_act: str = "softplus"
    contraction_type: str = "aabb"
    step_size_bg: float = 0.1
    # "auto": footprint-packed fused gathers on TPU (6 rows/sample instead
    # of 36 — see ops/packed_sample.py), plain gathers on CPU where the
    # packing overhead loses; "on"/"off" force either path.
    fused_eval: str = "auto"
    # Evaluate features only for the valid samples, compacted into a buffer
    # of ``ratio * N`` slots (exact: a lax.cond falls back to dense
    # evaluation if more samples are valid than fit). Gathers are
    # row-rate-bound on TPU, so this cuts the dominant cost by the invalid
    # fraction. ``compact_ratio`` applies under an alpha mask (~5-20% valid).
    # ``compact_ratio_unmasked`` would apply before the first mask, but at
    # the ~60% AABB-validity typical there the compaction bookkeeping
    # (nonzero + sigma scatter + checkpoint recompute) costs more than it
    # saves (measured 621 vs 402 ms/step) — 0 keeps the dense path.
    compact_ratio: float = 0.25
    compact_ratio_unmasked: float = 0.0
    # Eval renders see the same masked validity (~8% on a lego-like shell)
    # but no autodiff, so a tighter buffer pays off: 0.125 measured 569 vs
    # 806 ms per 16k-ray chunk at 300^3 (1.42x faster full-image renders).
    # Falls back densely (correct, slower) if a fat mask exceeds the buffer.
    # (superseded by compact_ratios_eval; kept so old checkpoints'
    # self-describing kwargs still construct)
    compact_ratio_eval: float = 0.125
    # Eval renders dispatch on the valid-sample popcount across these
    # pre-compiled buffer sizes (fractions of N*S), picking the smallest
    # that fits (lax.switch in _compact_march) — the span-bucketed chunks
    # of render_chunked see occupancies from ~8% up to ~70%, so a single
    # worst-case k either overflows to dense or wastes k-proportional work.
    # Feature eval is ~58 ns/slot whether or not slots are filled (measured
    # extra/microbench_feature_eval.py), so intermediate steps pay for
    # themselves; the sorted chunks touch only 2-3 branches per image.
    compact_ratios_eval: tuple = (0.125, 0.1875, 0.25, 0.375, 0.5, 0.75)
    # Alpha-mask occupancy gate: >= 1 routes render_rays' per-sample mask
    # test through sample_alpha_gate with this many consecutive samples per
    # gathered bit row (0 keeps the 8-lane trilerp row). Set per phase via
    # gate_group_for — the value is only exact under that spacing bound.
    mask_gate_group: int = 0

    @property
    def use_fused_eval(self) -> bool:
        if self.model_name != "TensorVMSplit":
            return False
        if self.fused_eval == "auto":
            import jax

            return jax.default_backend() != "cpu"
        return self.fused_eval == "on"

    # --- derived statics (reference update_stepSize, tensorBase.py:354-375) ---

    @property
    def aabb_np(self) -> np.ndarray:
        return np.asarray(self.aabb, dtype=np.float32)

    @property
    def aabb_size(self) -> np.ndarray:
        return self.aabb_np[1] - self.aabb_np[0]

    @property
    def units(self) -> np.ndarray:
        gs = np.asarray(self.grid_size, dtype=np.float32)
        if self.contraction_type == "unisphere":
            gs = gs * 0.5
        return self.aabb_size / (gs - 1.0)

    @property
    def step_size(self) -> float:
        return float(np.mean(self.units) * self.step_ratio)

    @property
    def aabb_diag(self) -> float:
        return float(np.sqrt(np.sum(np.square(self.aabb_size))))

    @property
    def n_samples(self) -> int:
        return int(self.aabb_diag / self.step_size) + 1

    @property
    def n_samples_bg(self) -> int:
        if self.contraction_type == "unisphere":
            near, far = self.near_far
            return int((far - near) / self.step_size_bg)
        return 0

    def replace(self, **kw) -> "FieldConfig":
        return dataclasses.replace(self, **kw)


@struct.dataclass
class AlphaMask:
    """Binary occupancy grid (reference AlphaGridMask, tensorBase.py:50-83).

    ``volume`` is [D, H, W] (z, y, x-major), sampled trilinearly; ``aabb``
    is the [2, 3] box it was built over (may differ from the field's after
    shrink). ``packed`` is the optional [D*H*W, 8] uint8 footprint table
    (ops/packed_sample.py) that turns the 8-row trilinear gather into one
    gathered row on TPU."""

    volume: jnp.ndarray
    aabb: jnp.ndarray
    packed: jnp.ndarray | None = None
    # [D*H*W, L] uint32 neighborhood-bit rows: one gathered row answers the
    # trilerp > 0 occupancy gate for a GROUP of consecutive ray samples
    # (ops/packed_sample.py::occupancy_grouped) — the gate's gather count,
    # its entire TPU cost, divides by the group size.
    packed_bits: jnp.ndarray | None = None
    # static: unisphere contraction applies the Zip-NeRF power transform
    # instead of the AABB normalization (reference tensorBase.py:74-83)
    unisphere: bool = struct.field(pytree_node=False, default=False)
    # static: neighborhood window of packed_bits (0 = no bits table)
    bits_window: int = struct.field(pytree_node=False, default=0)


def make_alpha_mask(volume: jnp.ndarray, aabb,
                    contraction_type: str = "aabb",
                    bits_window: int = 4) -> AlphaMask:
    return AlphaMask(
        volume=volume,
        aabb=jnp.asarray(aabb),
        packed=pack_volume(volume, dtype=jnp.uint8),
        packed_bits=(
            pack_volume_bits(volume, bits_window) if bits_window else None
        ),
        unisphere=contraction_type == "unisphere",
        bits_window=bits_window,
    )


def sample_alpha(mask: AlphaMask, xyz: jnp.ndarray) -> jnp.ndarray:
    """Trilinear alpha-mask lookup at world coords xyz [..., 3] -> [...]."""
    if mask.unisphere:
        center = (mask.aabb[0] + mask.aabb[1]) / 2.0
        coords = power_transformation(xyz - center, alpha=-1.5)
    else:
        inv_size = 2.0 / (mask.aabb[1] - mask.aabb[0])
        coords = (xyz - mask.aabb[0]) * inv_size - 1.0
    if mask.packed is not None:
        d, h, w = mask.volume.shape
        return packed_trilerp(mask.packed, d, h, w, coords)
    return grid_sample_3d(mask.volume, coords)


def sample_alpha_gate(mask: AlphaMask, xyz: jnp.ndarray,
                      group: int = 1) -> jnp.ndarray:
    """Boolean occupancy gate ``sample_alpha(mask, xyz) > 0`` computed from
    the neighborhood-bit table, sharing one gathered row per ``group``
    consecutive samples along axis -2 of xyz [..., S, 3].

    Semantics: the reference only ever consumes the alpha-mask trilerp as a
    boolean (``alphas > 0``: AlphaGridMask.sample_alpha at
    tensorBase.py:66-72 gating the march at :832-846 and the ray filter at
    :739-741); for a binary volume under non-negative weights that boolean
    is exactly "some positive-weight footprint corner is occupied", which
    one neighborhood-bit row answers for a whole group of samples.

    Callers must satisfy occupancy_grouped's group-spread requirement for
    group > 1 — use gate_group_for to derive a safe group from the sampling
    step — and must not use it under unisphere contraction (the power
    transform bends the sample spacing)."""
    assert mask.packed_bits is not None and not mask.unisphere
    inv_size = 2.0 / (mask.aabb[1] - mask.aabb[0])
    coords = (xyz - mask.aabb[0]) * inv_size - 1.0
    d, h, w = mask.volume.shape
    return occupancy_grouped(
        mask.packed_bits, d, h, w, mask.bits_window, coords, group
    )


def gate_group_for(mask_shape, mask_aabb, step_size: float,
                   window: int, dir_bound: float = 1.0,
                   cap: int = 8) -> int:
    """Largest safe sample-group size for sample_alpha_gate.

    Consecutive samples of sample_ray's march are exactly ``step_size``
    apart in world space, so their per-axis pixel displacement is
    step_size * |dir_a| / unit_a <= step_size * dir_bound / min(units).
    A group of G samples then spans (G-1) * delta pixels; every bilinear
    footprint fits the window iff (G-1) * delta <= window - 2 (floors are
    nonexpansive: |floor x - floor y| <= ceil|x - y|). A 1e-3-pixel margin
    absorbs float rounding of xyz = o + d*z across consecutive samples.

    ``dir_bound`` is the caller-measured max |dir component| over its rays
    (blender-convention dirs have |d_z| = 1 and |d_x|,|d_y| = tan(fov/2)).
    Returns 1 when grouping buys nothing or the spacing is too coarse."""
    if window < 3:
        return 1
    shape = np.asarray(mask_shape, dtype=np.float64)       # (D, H, W): z,y,x
    aabb = np.asarray(mask_aabb, dtype=np.float64)
    units = (aabb[1] - aabb[0]) / np.maximum(shape[::-1] - 1.0, 1.0)  # x,y,z
    delta = float(step_size) * float(dir_bound) / float(units.min())
    if delta <= 0:
        return 1
    return max(1, min(cap, 1 + int((window - 2 - 1e-3) / delta)))


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _init_vm(key, n_comp: tuple, grid_size: tuple, scale: float):
    """Per-axis plane [g[m1], g[m0], R] + line [g[vec], R] gaussians
    (reference init_one_svd, tensoRF.py:160-170)."""
    planes, lines = [], []
    for i in range(3):
        key, k1, k2 = jax.random.split(key, 3)
        m0, m1 = MAT_MODE[i]
        planes.append(
            scale * jax.random.normal(k1, (grid_size[m1], grid_size[m0], n_comp[i]))
        )
        lines.append(scale * jax.random.normal(k2, (grid_size[VEC_MODE[i]], n_comp[i])))
    return tuple(planes), tuple(lines)


def _init_cp(key, n_comp: int, grid_size: tuple, scale: float):
    lines = []
    for i in range(3):
        key, k = jax.random.split(key)
        lines.append(scale * jax.random.normal(k, (grid_size[VEC_MODE[i]], n_comp)))
    return tuple(lines)


def init_field(key, config: FieldConfig):
    """Initialize all field parameters (reference init_svd_volume,
    tensoRF.py:155-158 / :323-326, plus the shading head)."""
    k_den, k_app, k_mat, k_shade = jax.random.split(key, 4)
    params = {}
    if config.model_name == "TensorVMSplit":
        params["density_plane"], params["density_line"] = _init_vm(
            k_den, config.density_n_comp, config.grid_size, 0.1
        )
        params["app_plane"], params["app_line"] = _init_vm(
            k_app, config.app_n_comp, config.grid_size, 0.1
        )
        in_dim = sum(config.app_n_comp)
    elif config.model_name == "TensorCP":
        params["density_line"] = _init_cp(
            k_den, config.density_n_comp[0], config.grid_size, 0.2
        )
        params["app_line"] = _init_cp(
            k_app, config.app_n_comp[0], config.grid_size, 0.2
        )
        in_dim = config.app_n_comp[0]
    else:
        raise ValueError(f"unknown model_name {config.model_name}")
    params["basis_mat"] = linear_init(k_mat, in_dim, config.app_dim, bias=False)
    params["shading"] = init_shading(
        k_shade, config.shading_mode, config.app_dim,
        config.view_pe, config.pos_pe, config.fea_pe, config.feature_c,
    )
    return params


# ---------------------------------------------------------------------------
# Coordinate normalization & density activation
# ---------------------------------------------------------------------------


def power_transformation(centered_xyz: jnp.ndarray, alpha: float = -1.5):
    """Zip-NeRF power contraction (reference utils.py:139-147)."""
    x_abs = jnp.abs(centered_xyz)
    negate_alpha = math.fabs(alpha - 1)
    return (
        jnp.sign(centered_xyz)
        * (negate_alpha / alpha)
        * (jnp.power(x_abs / negate_alpha + 1.0, alpha) - 1.0)
    )


def normalize_coord(config: FieldConfig, xyz: jnp.ndarray) -> jnp.ndarray:
    """World -> [-1, 1] grid coords (reference tensorBase.py:389-397)."""
    aabb = jnp.asarray(config.aabb_np)
    if config.contraction_type == "unisphere":
        center = (aabb[0] + aabb[1]) / 2.0
        return power_transformation(xyz - center, alpha=-1.5)
    inv_size = 2.0 / (aabb[1] - aabb[0])
    return (xyz - aabb[0]) * inv_size - 1.0


def feature2density(config: FieldConfig, features: jnp.ndarray) -> jnp.ndarray:
    """Density activation (reference tensorBase.py:750-754)."""
    if config.fea2dense_act == "softplus":
        return jax.nn.softplus(features + config.density_shift)
    if config.fea2dense_act == "relu":
        return jax.nn.relu(features)
    raise ValueError(config.fea2dense_act)


# ---------------------------------------------------------------------------
# Feature evaluation (the hot path)
# ---------------------------------------------------------------------------


def compute_densityfeature(config: FieldConfig, params, xyz: jnp.ndarray):
    """sigma feature at normalized coords xyz [..., 3] -> [...]
    (reference tensoRF.py:216-235 VM / :344-359 CP)."""
    if config.model_name == "TensorVMSplit":
        sigma = None
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            plane_feat = grid_sample_2d(
                params["density_plane"][i],
                jnp.stack([xyz[..., m0], xyz[..., m1]], axis=-1),
            )
            line_feat = grid_sample_1d(
                params["density_line"][i], xyz[..., VEC_MODE[i]]
            )
            contrib = jnp.sum(plane_feat * line_feat, axis=-1)
            sigma = contrib if sigma is None else sigma + contrib
        return sigma
    # CP: elementwise product of the three line features, summed over rank.
    prod = None
    for i in range(3):
        line_feat = grid_sample_1d(params["density_line"][i], xyz[..., VEC_MODE[i]])
        prod = line_feat if prod is None else prod * line_feat
    return jnp.sum(prod, axis=-1)


FUSED_EVAL_CHUNK = 1 << 20  # samples per lax.map slice (bounds HBM temps)


def compute_features_fused(config: FieldConfig, params, xyz: jnp.ndarray):
    """Density + appearance features in one pass with ONE gathered row per
    plane and per line (density/app channels concatenated before footprint
    packing; ops/packed_sample.py). Numerically identical to
    compute_densityfeature + compute_appfeature but ~6x fewer gathered rows
    — the TPU hot-path replacement for the reference's six F.grid_sample
    calls (tensoRF.py:216-256).

    Large inputs are evaluated in ``FUSED_EVAL_CHUNK``-sample lax.map slices:
    the gathered-row temporaries are [n, 4*(Cd+Ca)] (~1 KB/sample at lego
    ranks), which otherwise peaks at several GB at the 300^3 phase.

    Returns (sigma_feature [...], app_feature [..., app_dim])."""
    assert config.model_name == "TensorVMSplit"

    packed_planes, packed_lines, dims = [], [], []
    for i in range(3):
        cd = config.density_n_comp[i]
        ca = config.app_n_comp[i]
        plane_cat = jnp.concatenate(
            [params["density_plane"][i], params["app_plane"][i]], axis=-1
        )
        line_cat = jnp.concatenate(
            [params["density_line"][i], params["app_line"][i]], axis=-1
        )
        packed_planes.append(pack_plane(plane_cat))
        packed_lines.append(pack_line(line_cat))
        dims.append((plane_cat.shape[0], plane_cat.shape[1],
                     line_cat.shape[0], cd, ca))

    def eval_block(pts):
        sigma = None
        app_parts = []
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            h, w, l, cd, ca = dims[i]
            feats = packed_bilerp(
                packed_planes[i], h, w, cd + ca,
                jnp.stack([pts[..., m0], pts[..., m1]], axis=-1),
            )
            lfeats = packed_lerp(packed_lines[i], l, cd + ca,
                                 pts[..., VEC_MODE[i]])
            prod = feats * lfeats
            contrib = jnp.sum(prod[..., :cd], axis=-1)
            sigma = contrib if sigma is None else sigma + contrib
            app_parts.append(prod[..., cd:])
        app = linear_apply(params["basis_mat"],
                           jnp.concatenate(app_parts, -1))
        return sigma, app

    shape = xyz.shape[:-1]
    flat = xyz.reshape(-1, 3)
    n = flat.shape[0]
    if n <= FUSED_EVAL_CHUNK:
        sigma, app = eval_block(flat)
    else:
        # balanced slices: ceil-divide into equal slices near the target
        # size instead of fixed 1M slices — fixed slices quantize the work
        # to a slice multiple (k=1.06M padded to 2M cost 199 ms vs the
        # ~105 ms its samples need; measured extra/decompose_eval.py)
        n_chunks = -(-n // FUSED_EVAL_CHUNK)
        slice_n = -(-n // n_chunks)
        slice_n = ((slice_n + 127) // 128) * 128
        padded = jnp.pad(flat, ((0, n_chunks * slice_n - n), (0, 0)))
        sigma, app = jax.lax.map(
            eval_block, padded.reshape(n_chunks, slice_n, 3)
        )
        sigma = sigma.reshape(-1)[:n]
        app = app.reshape(-1, config.app_dim)[:n]
    return sigma.reshape(shape), app.reshape(shape + (config.app_dim,))


def compute_appfeature(config: FieldConfig, params, xyz: jnp.ndarray):
    """Appearance feature at normalized coords xyz [..., 3] -> [..., app_dim]
    (reference tensoRF.py:237-256 VM / :361-375 CP)."""
    if config.model_name == "TensorVMSplit":
        feats = []
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            plane_feat = grid_sample_2d(
                params["app_plane"][i],
                jnp.stack([xyz[..., m0], xyz[..., m1]], axis=-1),
            )
            line_feat = grid_sample_1d(params["app_line"][i], xyz[..., VEC_MODE[i]])
            feats.append(plane_feat * line_feat)
        feat = jnp.concatenate(feats, axis=-1)
    else:
        feat = None
        for i in range(3):
            line_feat = grid_sample_1d(params["app_line"][i], xyz[..., VEC_MODE[i]])
            feat = line_feat if feat is None else feat * line_feat
    return linear_apply(params["basis_mat"], feat)


# ---------------------------------------------------------------------------
# Regularizers (reference tensoRF.py:182-214, :427-443; utils.py:120-137)
# ---------------------------------------------------------------------------


def _tv_plane(plane: jnp.ndarray) -> jnp.ndarray:
    """TVLoss on one [H, W, R] plane; matches reference TVLoss(weight=1) on
    the equivalent [1, R, H, W] tensor (utils.py:120-136)."""
    h, w, r = plane.shape
    h_tv = jnp.sum(jnp.square(plane[1:] - plane[:-1]))
    w_tv = jnp.sum(jnp.square(plane[:, 1:] - plane[:, :-1]))
    count_h = r * (h - 1) * w
    count_w = r * h * (w - 1)
    return 2.0 * (h_tv / count_h + w_tv / count_w)


def tv_loss_density(config: FieldConfig, params) -> jnp.ndarray:
    if config.model_name == "TensorVMSplit":
        return sum(_tv_plane(p) for p in params["density_plane"]) * 1e-2
    # CP (tensoRF.py:433-437): TV over lines; the reference's TVLoss on a
    # [1, R, L, 1] tensor contributes only the h (length) term.
    total = 0.0
    for line in params["density_line"]:
        l, r = line.shape
        total = total + 2.0 * jnp.sum(jnp.square(line[1:] - line[:-1])) / (r * (l - 1))
    return total * 1e-3


def tv_loss_app(config: FieldConfig, params) -> jnp.ndarray:
    if config.model_name == "TensorVMSplit":
        return sum(_tv_plane(p) for p in params["app_plane"]) * 1e-2
    total = 0.0
    for line in params["app_line"]:
        l, r = line.shape
        total = total + 2.0 * jnp.sum(jnp.square(line[1:] - line[:-1])) / (r * (l - 1))
    return total * 1e-3


def density_l1(config: FieldConfig, params) -> jnp.ndarray:
    """L1 sparsity on density factors (tensoRF.py:197-202, :427-431)."""
    total = 0.0
    if config.model_name == "TensorVMSplit":
        for i in range(3):
            total = total + jnp.mean(jnp.abs(params["density_plane"][i])) + jnp.mean(
                jnp.abs(params["density_line"][i])
            )
    else:
        for i in range(3):
            total = total + jnp.mean(jnp.abs(params["density_line"][i]))
    return total


def _vector_diffs(lines) -> jnp.ndarray:
    """Mean |off-diagonal| of the line-component Gram matrices
    (reference vectorDiffs, tensoRF.py:182-192)."""
    total = 0.0
    for line in lines:
        l, r = line.shape
        gram = line.T @ line  # [R, R]
        off = gram.reshape(-1)[1:].reshape(r - 1, r + 1)[:, :-1]
        total = total + jnp.mean(jnp.abs(off))
    return total


def vector_comp_diffs(config: FieldConfig, params) -> jnp.ndarray:
    return _vector_diffs(params["density_line"]) + _vector_diffs(params["app_line"])


# ---------------------------------------------------------------------------
# Phase machinery: upsample / shrink / alpha-mask update (host-side events)
# ---------------------------------------------------------------------------


def upsample_volume_grid(config: FieldConfig, params, res_target):
    """Bilinear grid upsample (reference tensoRF.py:258-278, :377-395).
    Returns (new_config, new_params) — a recompile boundary."""
    res_target = tuple(int(r) for r in res_target)
    new_params = dict(params)

    def up_vm(planes, lines):
        new_p, new_l = [], []
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            new_p.append(
                resize_bilinear_ac(planes[i], res_target[m1], res_target[m0])
            )
            new_l.append(resize_linear_ac(lines[i], res_target[VEC_MODE[i]], axis=0))
        return tuple(new_p), tuple(new_l)

    if config.model_name == "TensorVMSplit":
        new_params["density_plane"], new_params["density_line"] = up_vm(
            params["density_plane"], params["density_line"]
        )
        new_params["app_plane"], new_params["app_line"] = up_vm(
            params["app_plane"], params["app_line"]
        )
    else:
        new_params["density_line"] = tuple(
            resize_linear_ac(params["density_line"][i], res_target[VEC_MODE[i]], 0)
            for i in range(3)
        )
        new_params["app_line"] = tuple(
            resize_linear_ac(params["app_line"][i], res_target[VEC_MODE[i]], 0)
            for i in range(3)
        )
    return config.replace(grid_size=res_target), new_params


def shrink(config: FieldConfig, params, new_aabb, mask_grid_size):
    """Crop the factor grids to a tightened AABB (reference tensoRF.py:280-316).
    ``new_aabb`` is a [2,3] numpy array; ``mask_grid_size`` the alpha-mask
    grid size (to decide whether the aabb needs unit-snapping correction)."""
    new_aabb = np.asarray(new_aabb, dtype=np.float32)
    units = config.units
    aabb = config.aabb_np
    grid_size = np.asarray(config.grid_size, dtype=np.int64)

    t_l = np.round(np.round((new_aabb[0] - aabb[0]) / units)).astype(np.int64)
    b_r = np.round((new_aabb[1] - aabb[0]) / units).astype(np.int64) + 1
    b_r = np.minimum(b_r, grid_size)

    new_params = dict(params)
    dens_lines, app_lines = [], []
    dens_planes, app_planes = [], []
    for i in range(3):
        v = VEC_MODE[i]
        dens_lines.append(params["density_line"][i][t_l[v]:b_r[v]])
        app_lines.append(params["app_line"][i][t_l[v]:b_r[v]])
        if config.model_name == "TensorVMSplit":
            m0, m1 = MAT_MODE[i]
            dens_planes.append(
                params["density_plane"][i][t_l[m1]:b_r[m1], t_l[m0]:b_r[m0]]
            )
            app_planes.append(
                params["app_plane"][i][t_l[m1]:b_r[m1], t_l[m0]:b_r[m0]]
            )
    new_params["density_line"] = tuple(dens_lines)
    new_params["app_line"] = tuple(app_lines)
    if config.model_name == "TensorVMSplit":
        new_params["density_plane"] = tuple(dens_planes)
        new_params["app_plane"] = tuple(app_planes)

    if not np.array_equal(np.asarray(mask_grid_size), grid_size):
        t_l_r = t_l / (grid_size - 1)
        b_r_r = (b_r - 1) / (grid_size - 1)
        corrected = np.stack(
            [
                (1 - t_l_r) * aabb[0] + t_l_r * aabb[1],
                (1 - b_r_r) * aabb[0] + b_r_r * aabb[1],
            ]
        ).astype(np.float32)
        new_aabb = corrected

    new_size = tuple(int(x) for x in (b_r - t_l))
    new_config = config.replace(
        aabb=tuple(map(tuple, new_aabb.tolist())), grid_size=new_size
    )
    return new_config, new_params


def get_dense_alpha(config: FieldConfig, params, mask: AlphaMask | None,
                    grid_size=None):
    """Alpha on a dense lattice over the AABB (reference tensorBase.py:643-665).

    Returns (alpha [gx, gy, gz], dense_xyz [gx, gy, gz, 3]). The reference's
    per-slice python loop becomes one vectorized evaluation."""
    from iffnerf_tpu.models.render import compute_alpha  # local: avoid cycle

    grid_size = tuple(grid_size or config.grid_size)
    aabb = jnp.asarray(config.aabb_np)
    axes = [jnp.linspace(0.0, 1.0, g) for g in grid_size]
    samples = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)
    dense_xyz = aabb[0] * (1 - samples) + aabb[1] * samples

    alpha = compute_alpha(
        config, params, mask, dense_xyz.reshape(-1, 3), config.step_size
    ).reshape(grid_size)
    return alpha, dense_xyz


def update_alpha_mask(config: FieldConfig, params, mask: AlphaMask | None,
                      grid_size=(200, 200, 200)):
    """Rebuild the occupancy mask and tighten the AABB
    (reference updateAlphaMask, tensorBase.py:667-696).

    Returns (new_mask, new_aabb_np, occupancy_fraction)."""
    grid_size = tuple(int(g) for g in grid_size)
    alpha, dense_xyz = get_dense_alpha(config, params, mask, grid_size)

    # x-major -> z-major volume, 3^3 max-pool, threshold (tensorBase.py:670-679)
    vol = jnp.clip(alpha, 0.0, 1.0).transpose(2, 1, 0)
    vol = jax.lax.reduce_window(
        vol, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME"
    )
    vol = (vol >= config.alpha_mask_thres).astype(jnp.float32)

    new_mask = make_alpha_mask(vol, config.aabb_np, config.contraction_type)

    # AABB from occupied voxels (host-side reduction; tensorBase.py:685-690).
    vol_np = np.asarray(vol)
    xyz_np = np.asarray(dense_xyz.transpose(2, 1, 0, 3))
    valid = xyz_np[vol_np > 0.5]
    if valid.size == 0:
        new_aabb = config.aabb_np
    else:
        new_aabb = np.stack([valid.min(0), valid.max(0)])
    occupancy = float(vol_np.sum() / vol_np.size)
    return new_mask, new_aabb, occupancy


def power_transformation_inv(center_metric: jnp.ndarray,
                             alpha: float = -1.5) -> jnp.ndarray:
    """Inverse of the Zip-NeRF power contraction
    (reference utils.py:150-163)."""
    negate_alpha = math.fabs(alpha - 1)
    return (
        jnp.sign(center_metric)
        * (jnp.power(
            (alpha * jnp.abs(center_metric) + negate_alpha) / negate_alpha,
            1.0 / alpha,
        ) - 1.0)
        * negate_alpha
    )
