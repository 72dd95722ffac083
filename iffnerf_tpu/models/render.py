"""Volume-rendering forward pass — dense, static-shape, jit-first.

Re-design of the reference's ``TensorBase.forward`` and ray samplers
(models/tensorBase.py:460-536, :623-638, :698-917). The reference's
boolean-mask gathers become ``where``-masked dense compute: every sample's
density/appearance is evaluated and invalid ones are zeroed — on TPU this
keeps shapes static and the MXU busy, and XLA fuses the masking into the
surrounding elementwise work.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from iffnerf_tpu.models.field import (
    AlphaMask,
    FieldConfig,
    compute_appfeature,
    compute_densityfeature,
    compute_features_fused,
    feature2density,
    normalize_coord,
    sample_alpha,
    sample_alpha_gate,
)
from iffnerf_tpu.models.shading import apply_shading
from iffnerf_tpu.ops.ray_march import raw2alpha

# sample-compaction index extraction runs at this block granularity
# (see _compact_march): nonzero over n/8 block flags instead of n samples
_BLOCK = 8


def _aabb_t_range(aabb, rays_o, rays_d):
    """Entry/exit t of each ray w.r.t. the AABB (slab test)."""
    vec = jnp.where(rays_d == 0, 1e-6, rays_d)
    rate_a = (aabb[1] - rays_o) / vec
    rate_b = (aabb[0] - rays_o) / vec
    t_min = jnp.max(jnp.minimum(rate_a, rate_b), axis=-1)
    t_max = jnp.min(jnp.maximum(rate_a, rate_b), axis=-1)
    return t_min, t_max


def sample_ray(config: FieldConfig, rays_o, rays_d, *, key=None,
               is_train: bool = True, n_samples: int = -1):
    """Jittered equidistant samples from the AABB entry point
    (reference sample_ray, tensorBase.py:494-536).

    Returns (xyz [N, S, 3], z_vals [N, S], valid [N, S])."""
    n = n_samples if n_samples > 0 else config.n_samples
    near, far = config.near_far
    aabb = jnp.asarray(config.aabb_np)

    t_min, _ = _aabb_t_range(aabb, rays_o, rays_d)
    t_min = jnp.clip(t_min, near, far)

    total = n + config.n_samples_bg
    rng = jnp.arange(total, dtype=rays_o.dtype)[None, :]
    if is_train:
        assert key is not None, "training sampling needs a PRNG key"
        rng = rng + jax.random.uniform(key, (rays_o.shape[0], 1), rays_o.dtype)

    if config.contraction_type == "unisphere":
        steps = jnp.concatenate(
            [
                jnp.full((n + 1,), config.step_size, rays_o.dtype),
                jnp.full((config.n_samples_bg,), config.step_size_bg, rays_o.dtype),
            ]
        )[:total]
        step = steps[None, :] * rng
    else:
        step = config.step_size * rng

    z_vals = t_min[:, None] + step
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    valid = ~jnp.any((aabb[0] > xyz) | (xyz > aabb[1]), axis=-1)
    return xyz, z_vals, valid


def sample_ray_ndc(config: FieldConfig, rays_o, rays_d, *, key=None,
                   is_train: bool = True, n_samples: int = -1):
    """Linear-in-depth NDC sampling (reference tensorBase.py:460-471)."""
    n = n_samples if n_samples > 0 else config.n_samples
    near, far = config.near_far
    aabb = jnp.asarray(config.aabb_np)
    interpx = jnp.linspace(near, far, n, dtype=rays_o.dtype)[None, :]
    if is_train:
        assert key is not None
        interpx = interpx + jax.random.uniform(
            key, (rays_o.shape[0], n), rays_o.dtype
        ) * ((far - near) / n)
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * interpx[..., None]
    valid = ~jnp.any((aabb[0] > xyz) | (xyz > aabb[1]), axis=-1)
    return xyz, interpx, valid


def sample_point_color_fn(config: FieldConfig, rays_o, rays_d, *,
                          n_samples: int = 20, **_):
    """Samples centered on the ray origin (a surface point): ±N/2 steps
    (reference sample_point_color, tensorBase.py:623-638)."""
    before = n_samples // 2
    after = n_samples - before
    aabb = jnp.asarray(config.aabb_np)
    rng = jnp.arange(-before, after, dtype=rays_o.dtype)[None, :]
    step = config.step_size * rng
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * step[..., None]
    valid = ~jnp.any((aabb[0] > xyz) | (xyz > aabb[1]), axis=-1)
    return xyz, step, valid


def compute_alpha(config: FieldConfig, params, mask: AlphaMask | None,
                  xyz: jnp.ndarray, length) -> jnp.ndarray:
    """Opacity of points xyz [..., 3] over a step ``length``
    (reference compute_alpha, tensorBase.py:756-773)."""
    ok = jnp.ones(xyz.shape[:-1], dtype=bool)
    if mask is not None:
        ok = sample_alpha(mask, xyz) > 0
    coords = normalize_coord(config, xyz)
    sigma = feature2density(config, compute_densityfeature(config, params, coords))
    sigma = jnp.where(ok, sigma, 0.0)
    return 1.0 - jnp.exp(-sigma * length)


def _compact_march(config: FieldConfig, params, coords, ray_valid, dists,
                   ratios):
    """The volumetric march restricted to alpha-mask-valid samples.

    Valid sample indices (sorted, from jnp.nonzero with a static
    ``compact_ratio * N`` buffer) index a compacted feature evaluation; the
    per-ray appearance accumulation is then done IN COMPACTED SPACE with a
    cumulative sum + per-ray boundary differences (indices are sorted, so a
    ray's slots are contiguous) — TPU row-scatters cost ~10x a gather, so
    nothing wider than a scalar is ever scattered. Only sigma is scattered
    back densely (a cheap scalar scatter) because the transmittance cumprod
    (raw2alpha) wants the dense [N, S] layout.

    ``ratios`` is a (static) tuple of buffer sizes as fractions of the total
    sample count. The valid-count popcount selects the SMALLEST buffer that
    fits via ``lax.switch`` — feature-evaluation work scales with actual
    occupancy instead of a single worst-case k — falling back to the dense
    path above the largest.

    Exact by construction: invalid samples contribute zeros exactly as the
    dense path's where-masking does (reference tensorBase.py:839-851), and
    every branch computes the same masked math on the same valid samples.

    Returns (sigma [N,S], alpha [N,S], weight [N,S], acc [N],
    cum_app [N, app_dim], rays_any [N])."""
    n_rays, s = ray_valid.shape
    coords_f = coords.reshape(-1, 3)
    valid_f = ray_valid.reshape(-1)
    n = valid_f.shape[0]
    ks = []
    for ratio in sorted(ratios):
        k = max(((int(n * ratio) + 127) // 128) * 128, 128)
        if k < n and (not ks or k > ks[-1]):
            ks.append(k)
    app_dim = config.app_dim
    thres = config.ray_march_weight_thres

    # Index extraction at _BLOCK-sample granularity: jnp.nonzero is a
    # cumsum+scatter over its whole input — 158 ms on 17M samples on v5e,
    # 8x cheaper over 2.1M block flags. Valid samples form contiguous runs
    # along rays (typical run ~90 samples at lego scale), so selecting whole
    # blocks wastes few buffer slots, and the in-block invalid samples are
    # masked below exactly like the dense path's where-masking — exactness
    # is unchanged.
    n_blocks = n // _BLOCK
    use_blocks = n % _BLOCK == 0 and all(k % _BLOCK == 0 for k in ks)
    if use_blocks and ks:
        blk_any = jnp.any(valid_f.reshape(n_blocks, _BLOCK), axis=-1)
        count = jnp.sum(blk_any)
        limits = [k // _BLOCK for k in ks]
    else:
        count = jnp.sum(valid_f)
        limits = ks

    def finish_dense(sigma_feature, app_features):
        sigma = jnp.where(
            valid_f.reshape(n_rays, s),
            feature2density(config, sigma_feature.reshape(n_rays, s)), 0.0,
        )
        alpha, weight, _ = raw2alpha(sigma, dists * config.distance_scale)
        app_mask = weight > thres
        app = jnp.where(
            app_mask[..., None], app_features.reshape(n_rays, s, app_dim), 0.0
        )
        cum_app = jnp.einsum("nsa,ns->na", app, weight)
        return (sigma, alpha, weight, jnp.sum(weight, -1), cum_app,
                jnp.any(app_mask, -1))

    def dense(_):
        sig_f, app_f = compute_features_fused(config, params, coords_f)
        return finish_dense(sig_f, app_f)

    def make_compact(k):
        def compact(_):
            # MEASURED NEGATIVE RESULT (kept opt-in for reproduction):
            # gathering/scattering at whole-_BLOCK row granularity — 8x
            # fewer rows for the same bytes, bit-identical values — LOSES
            # on v5e: 228.9 vs 194.3 ms full masked step, 94.0 vs 88.0 ms
            # forward (same-session A/B, 300^3/0.109375 rung, 2026-08-19).
            # XLA already coalesces the small per-sample rows; the wider
            # [nb, 8*3] rows add layout copies and a costlier scatter
            # transpose. IFFNERF_BLOCK_ROWS=1 re-enables for A/B (read at
            # trace time).
            block_rows = (
                use_blocks
                and os.environ.get("IFFNERF_BLOCK_ROWS", "0") == "1"
            )
            if use_blocks:
                nb = k // _BLOCK
                (bidx,) = jnp.nonzero(blk_any, size=nb, fill_value=n_blocks)
                # make fill entries distinct ascending so the expanded sample
                # indices stay strictly sorted and unique (scatter promises)
                fill = bidx >= n_blocks
                base = jnp.where(
                    fill, n_blocks + jnp.arange(nb, dtype=bidx.dtype), bidx
                )
                idx = (
                    base[:, None] * _BLOCK
                    + jnp.arange(_BLOCK, dtype=bidx.dtype)[None, :]
                ).reshape(-1)
                base_safe = jnp.minimum(base, n_blocks - 1)
                if block_rows:
                    in_buf = (
                        (~fill)[:, None]
                        & jnp.take(valid_f.reshape(n_blocks, _BLOCK),
                                   base_safe, axis=0)
                    ).reshape(-1)
                    cc = jnp.take(
                        coords_f.reshape(n_blocks, _BLOCK * 3), base_safe,
                        axis=0,
                    ).reshape(-1, 3)
                else:
                    safe_idx = jnp.minimum(idx, n - 1)
                    in_buf = (idx < n) & jnp.take(valid_f, safe_idx)
                    cc = jnp.take(coords_f, safe_idx, axis=0)
            else:
                (idx,) = jnp.nonzero(valid_f, size=k, fill_value=n)
                in_buf = idx < n
                safe_idx = jnp.minimum(idx, n - 1)
                cc = jnp.take(coords_f, safe_idx, axis=0)
            sig_k, app_k = compute_features_fused(config, params, cc)

            # dense sigma via scatter (out-of-range rows dropped)
            if block_rows:
                sig_dense = (
                    jnp.zeros((n_blocks, _BLOCK), sig_k.dtype)
                    .at[base]
                    .set(jnp.where(in_buf, sig_k, 0.0).reshape(nb, _BLOCK),
                         mode="drop", unique_indices=True,
                         indices_are_sorted=True)
                    .reshape(n)
                )
            elif use_blocks:
                sig_dense = jnp.zeros((n,), sig_k.dtype).at[idx].set(
                    jnp.where(in_buf, sig_k, 0.0), mode="drop",
                    unique_indices=True, indices_are_sorted=True,
                )
            else:
                sig_dense = jnp.zeros((n + 1,), sig_k.dtype).at[
                    jnp.where(in_buf, idx, n)
                ].set(sig_k, mode="drop", unique_indices=True,
                      indices_are_sorted=True)[:n]
            sigma = jnp.where(
                valid_f.reshape(n_rays, s),
                feature2density(config, sig_dense.reshape(n_rays, s)), 0.0,
            )
            alpha, weight, _ = raw2alpha(sigma, dists * config.distance_scale)

            # back to compacted space: per-slot weight + threshold mask
            if block_rows:
                w_k = jnp.take(
                    weight.reshape(n_blocks, _BLOCK), base_safe, axis=0
                ).reshape(-1) * in_buf
            else:
                w_k = jnp.take(weight.reshape(-1), safe_idx) * in_buf
            m_k = (w_k > thres).astype(app_k.dtype)
            contrib = app_k * (w_k * m_k)[:, None]          # [k, A]

            # sorted-segment sums via cumsum + per-ray boundary gathers
            csum = jnp.concatenate(
                [jnp.zeros((1, app_dim), contrib.dtype),
                 jnp.cumsum(contrib, axis=0)], axis=0,
            )                                               # [k+1, A]
            mcount = jnp.concatenate(
                [jnp.zeros((1,), m_k.dtype), jnp.cumsum(m_k)], axis=0
            )
            bounds = jnp.searchsorted(
                idx, jnp.arange(n_rays + 1, dtype=idx.dtype) * s
            )                                               # [N+1]
            cum_app = jnp.take(csum, bounds[1:], axis=0) - jnp.take(
                csum, bounds[:-1], axis=0
            )
            rays_any = (
                jnp.take(mcount, bounds[1:]) - jnp.take(mcount, bounds[:-1])
            ) > 0
            return (sigma, alpha, weight, jnp.sum(weight, -1), cum_app,
                    rays_any)

        return compact

    if not ks:
        return dense(None)
    # checkpoint: without it autodiff saves each branch's broadcast temps as
    # residuals, which TPU tile-padding can inflate ~128x -> OOM
    branches = [jax.checkpoint(make_compact(k)) for k in ks]
    branches.append(jax.checkpoint(dense))
    which = sum((count > lim).astype(jnp.int32) for lim in limits)
    return jax.lax.switch(which, branches, None)


def render_rays(
    config: FieldConfig,
    params,
    mask: AlphaMask | None,
    rays_chunk: jnp.ndarray,
    *,
    key=None,
    white_bg: bool = False,
    bg_color=None,
    is_train: bool = False,
    ndc_ray: bool = False,
    sample_mode: str = "aabb",
    n_samples: int = -1,
):
    """Full volumetric forward (reference TensorBase.forward,
    tensorBase.py:775-917). Behavioral parity notes:

      * appearance features are volumetrically accumulated FIRST and the
        shading head runs once per ray on the accumulated feature (:888-896);
      * appearance only where ``weight > rayMarch_weight_thres`` (:851);
      * depth = sum(w*z) + (1-acc) * rays_chunk[..., -1] (:906-908);
      * rgb composited as rgb*acc + bg*(1-acc), clipped (:903-904).

    rays_chunk is [N, 6|7] (ori, dir, optional mip radius).

    Returns (rgb [N,3], depth [N], acc [N], alpha [N,S], z_vals [N,S],
    dists [N,S]).
    """
    rays_o = rays_chunk[:, :3]
    viewdirs = rays_chunk[:, 3:6]

    if sample_mode == "point_color":
        xyz, z_vals, ray_valid = sample_point_color_fn(
            config, rays_o, viewdirs, n_samples=(n_samples if n_samples > 0 else 20)
        )
    elif ndc_ray or sample_mode == "ndc":
        xyz, z_vals, ray_valid = sample_ray_ndc(
            config, rays_o, viewdirs, key=key, is_train=is_train,
            n_samples=n_samples,
        )
    else:
        xyz, z_vals, ray_valid = sample_ray(
            config, rays_o, viewdirs, key=key, is_train=is_train,
            n_samples=n_samples,
        )

    dists = jnp.concatenate(
        [z_vals[:, 1:] - z_vals[:, :-1], jnp.zeros_like(z_vals[:, :1])], axis=-1
    )
    if ndc_ray or sample_mode == "ndc":
        rays_norm = jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
        dists = dists * rays_norm
        viewdirs = viewdirs / rays_norm

    if mask is not None:
        # Grouped bit-row gate when the caller proved the sample spacing
        # (gate_group_for): one gathered row per mask_gate_group samples
        # instead of one 8-lane trilerp row per sample — exact, and the
        # gate's gather count IS its TPU cost. NDC rescales dists only
        # (sampling stays the aabb/ndc grid with constant spacing), but the
        # caller's dir_bound must cover the unnormalized dirs it passes.
        use_gate = (
            config.mask_gate_group >= 1
            and mask.packed_bits is not None
            and not mask.unisphere
            and sample_mode in ("aabb", "point_color")
            and not ndc_ray
        )
        if use_gate:
            ray_valid = ray_valid & sample_alpha_gate(
                mask, xyz, config.mask_gate_group
            )
        else:
            ray_valid = ray_valid & (sample_alpha(mask, xyz) > 0)

    coords = normalize_coord(config, xyz)
    if mask is not None:
        ratios = ((config.compact_ratio,) if is_train
                  else tuple(config.compact_ratios_eval))
    else:
        ratios = (config.compact_ratio_unmasked,)
    ratios = tuple(r for r in ratios if r > 0)
    if config.use_fused_eval and ratios:
        (sigma, alpha, weight, acc_map, cum_app_features,
         rays_to_consider) = _compact_march(
            config, params, coords, ray_valid, dists, ratios
        )
    else:
        if config.use_fused_eval:
            # fused one-row-per-plane gather path (compute_features_fused)
            sigma_feature, app_features = compute_features_fused(
                config, params, coords
            )
        else:
            sigma_feature = compute_densityfeature(config, params, coords)
            app_features = compute_appfeature(config, params, coords)
        sigma = jnp.where(
            ray_valid, feature2density(config, sigma_feature), 0.0
        )

        alpha, weight, _ = raw2alpha(sigma, dists * config.distance_scale)

        app_mask = weight > config.ray_march_weight_thres
        app_features = jnp.where(app_mask[..., None], app_features, 0.0)

        acc_map = jnp.sum(weight, axis=-1)
        cum_app_features = jnp.sum(weight[..., None] * app_features, axis=-2)
        rays_to_consider = jnp.any(app_mask, axis=-1)

    rgb, _ = apply_shading(
        params["shading"], config.shading_mode, None, viewdirs,
        cum_app_features, view_pe=config.view_pe, pos_pe=config.pos_pe,
        fea_pe=config.fea_pe,
    )
    rgb_map = jnp.where(rays_to_consider[..., None], rgb, 0.0)

    if bg_color is None:
        bg_color = 1.0 if white_bg else 0.0
    rgb_map = rgb_map * acc_map[..., None] + bg_color * (1.0 - acc_map[..., None])
    rgb_map = jnp.clip(rgb_map, 0.0, 1.0)

    depth_map = jax.lax.stop_gradient(
        jnp.sum(weight * z_vals, axis=-1)
        + (1.0 - acc_map) * rays_chunk[..., -1]
    )
    return rgb_map, depth_map, acc_map, alpha, z_vals, dists


def ray_span_steps(config: FieldConfig, rays: jnp.ndarray,
                   n_samples: int) -> jnp.ndarray:
    """Per-ray upper bound on the number of leading samples of
    ``sample_ray``'s march that can be AABB-valid (0 = certain miss).

    Drives the eval renderer's active-ray compaction (render_chunked):
    sample i of ray r is valid iff z_i = t_enter + i*step lies in the slab
    interval [t_min, t_max], so ceil((t_max - t_enter)/step) bounds the last
    valid index. +3 slack covers float rounding at the slab boundaries AND
    guarantees the final sample of a truncated march (whose dist is the
    zero pad) is invalid — truncation is then exact w.r.t. the full-length
    march. The bound is only ever required to be an UPPER bound; extra
    samples are masked identically to the full march."""
    aabb = jnp.asarray(config.aabb_np)
    near, far = config.near_far
    t_min, t_max = _aabb_t_range(aabb, rays[:, :3], rays[:, 3:6])
    t_enter = jnp.clip(t_min, near, far)
    step = config.step_size
    steps = jnp.ceil((t_max - t_enter) / step).astype(jnp.int32) + 3
    hit = t_max >= t_enter - step
    return jnp.where(hit, jnp.clip(steps, 1, n_samples), 0)


def filtering_rays_bbox(config: FieldConfig, rays: jnp.ndarray) -> jnp.ndarray:
    """Per-ray AABB hit mask (reference filtering_rays bbox_only branch,
    tensorBase.py:718-728). Pure -> callers chunk/shard as they like."""
    aabb = jnp.asarray(config.aabb_np)
    t_min, t_max = _aabb_t_range(aabb, rays[..., :3], rays[..., 3:6])
    return t_max > t_min


def sample_ray_infinity(config: FieldConfig, rays_o, rays_d, *, key=None,
                        is_train: bool = True, n_samples: int = -1):
    """Inverse-depth sampling to infinity (reference tensorBase.py:473-492)."""
    n = n_samples if n_samples > 0 else config.n_samples
    near, far = config.near_far
    aabb = jnp.asarray(config.aabb_np)
    interpx = jnp.linspace(1.0 / near, 1e-7, n, dtype=rays_o.dtype)[None, :]
    if is_train:
        assert key is not None
        interpx = jnp.clip(
            interpx + jax.random.uniform(key, (rays_o.shape[0], n),
                                         rays_o.dtype) / n,
            1e-8, 1.0,
        )
    t = 1.0 / (1.0 - interpx)
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]
    valid = ~jnp.any((aabb[0] > xyz) | (xyz > aabb[1]), axis=-1)
    return xyz, interpx, valid
