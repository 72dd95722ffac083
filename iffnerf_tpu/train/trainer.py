"""TensoRF reconstruction loop (reference train.py:126-504), TPU-first.

Structure: the hot loop is a single jit-compiled train step (forward +
losses + optax update) over static-shape ray batches gathered on-device;
phase events (alpha-mask update + shrink, ray re-filtering, log-spaced grid
upsampling with optimizer re-init) run on the host between steps and are
deliberate recompile boundaries (SURVEY.md §7).

Optimizer parity (train.py:193-202,348-349): Adam(betas=(0.9, 0.99)) with
per-group LRs — 0.02 for the spatial factor grids, 1e-3 for basis matrix +
shading MLP — each decaying by ``lr_decay_target_ratio ** (1/decay_iters)``
every step, re-initialized at upsample events.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax

from iffnerf_tpu.models.field import (
    FieldConfig,
    density_l1,
    gate_group_for,
    init_field,
    sample_alpha_gate,
    shrink,
    tv_loss_app,
    tv_loss_density,
    update_alpha_mask,
    upsample_volume_grid,
    vector_comp_diffs,
)
from iffnerf_tpu.models.render import render_rays, sample_alpha, sample_ray
from iffnerf_tpu.utils.misc import N_to_reso, cal_n_samples, n_voxel_schedule


class SimpleSampler:
    """Random-permutation batch sampler with epoch reshuffle
    (reference train.py:23-35)."""

    def __init__(self, total: int, batch: int, seed: int = 20211202):
        self.total = total
        self.batch = batch
        self.curr = total
        self.ids = None
        self.rng = np.random.default_rng(seed)

    def nextids(self) -> np.ndarray:
        self.curr += self.batch
        if self.ids is None or self.curr + self.batch > self.total:
            self.ids = self.rng.permutation(self.total)
            self.curr = 0
        return self.ids[self.curr:self.curr + self.batch]


# candidate static compaction-buffer sizes (fractions of a batch's samples)
# for the occupancy probe below; the train step compiles with ONE of these
# 1/64 rungs at the low-occupancy end (trained scenes sit at ~5-12%
# valid, and C/D feature-eval cost is k-proportional — a coarser rung
# wastes its whole gap; at lego's 0.083 occupancy the 7/64 rung buys
# 12.5% of k vs the old 0.125 pick), 1/16 rungs above. Each phase still
# compiles exactly one program; ladder density costs nothing.
_COMPACT_LADDER = (0.046875, 0.0625, 0.078125, 0.09375, 0.109375, 0.125,
                   0.15625, 0.1875, 0.21875, 0.25, 0.3125, 0.375, 0.4375,
                   0.5)
# above this valid fraction the compaction bookkeeping exceeds its savings
# (measured on v5e at ~60% validity, BASELINE.md) -> march densely instead
_COMPACT_CAP = 0.55


def probe_compact_ratio(config: FieldConfig, mask, allrays, key, *,
                        n_samples: int, batch_size: int,
                        cap: float = _COMPACT_CAP,
                        n_batches: int = 4, margin: float = 1.3):
    """Measure the alpha-mask-valid sample fraction over a few training-size
    ray batches and return (smallest ladder ratio covering the observed max
    with ``margin``, observed max) — or (None, max) when nothing below
    ``cap`` fits. Runs at phase boundaries, which are recompile events
    anyway, so sizing the buffer per phase costs no extra compiles.
    Exactness never depends on the choice: a batch that overflows the
    static buffer takes _compact_march's dense fallback branch."""
    pool = allrays.shape[0]
    bs = min(batch_size, pool)

    @jax.jit
    def frac(rays, k):
        xyz, _, valid = sample_ray(config, rays[:, :3], rays[:, 3:6],
                                   key=k, is_train=True, n_samples=n_samples)
        valid = valid & (sample_alpha(mask, xyz) > 0)
        return jnp.mean(valid.astype(jnp.float32))

    rng = np.random.default_rng(
        int(jax.random.randint(key, (), 0, 2 ** 31 - 1))
    )
    worst = 0.0
    for i in range(n_batches):
        # with-replacement draw: duplicates are harmless for an occupancy
        # estimate, and choice(replace=False) permutes the whole pool
        idx = rng.integers(0, pool, bs)
        k = jax.random.fold_in(key, i)
        worst = max(worst, float(frac(jnp.asarray(allrays[idx]), k)))
    for r in _COMPACT_LADDER:
        if r >= worst * margin:
            return (r, worst) if r < cap else (None, worst)
    return None, worst


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    tx: Any


def _param_labels(params):
    return {
        k: ("network" if k in ("basis_mat", "shading") else "spatial")
        for k in params
    }


def make_optimizer(params, lr_spatial: float, lr_network: float,
                   lr_factor: float):
    tx = optax.multi_transform(
        {
            "spatial": optax.adam(
                optax.exponential_decay(lr_spatial, 1, lr_factor),
                b1=0.9, b2=0.99,
            ),
            "network": optax.adam(
                optax.exponential_decay(lr_network, 1, lr_factor),
                b1=0.9, b2=0.99,
            ),
        },
        _param_labels(params),
    )
    return TrainState(params=params, opt_state=tx.init(params), tx=tx)


def _shard_batch(mesh, *arrs):
    """Constrain batch arrays to the data-mesh ray axis inside jit (no-op
    without a mesh). GSPMD then shards the whole per-ray computation and
    inserts the psum for the replicated-parameter gradients (SURVEY.md §5)."""
    if mesh is None:
        return arrs if len(arrs) > 1 else arrs[0]
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data"))
    out = tuple(jax.lax.with_sharding_constraint(a, sh) for a in arrs)
    return out if len(out) > 1 else out[0]


def make_train_step(config: FieldConfig, tx, *, has_mask: bool,
                    n_samples: int, ndc_ray: bool, ortho_weight: float,
                    use_l1: bool, use_tv_density: bool, use_tv_app: bool,
                    rgb_channels: int, mesh=None):
    """Build the jitted train step. Dynamic per-step inputs: gathered ray
    batch indices, PRNG key, bg color, and the decaying loss weights.
    With ``mesh``, the gathered batch is sharded along the mesh's ray axis
    (parameters replicated) — the multi-device product path."""

    def loss_fn(params, mask, rays, rgbs, key, bg_color, weights):
        rgb_map, depth, acc, alpha, z_vals, dists = render_rays(
            config, params, mask, rays, key=key, is_train=True,
            bg_color=bg_color, ndc_ray=ndc_ray, n_samples=n_samples,
        )
        if rgb_channels > 3:
            # RGBA -> blended target (reference train.py:277-281)
            rgbs = jnp.clip(
                rgbs[..., :3] * rgbs[..., -1:] + bg_color * (1 - rgbs[..., -1:]),
                0.0, 1.0,
            )
        mse = jnp.mean((rgb_map - rgbs) ** 2)
        total = mse
        if ortho_weight > 0:
            total = total + ortho_weight * vector_comp_diffs(config, params)
        if use_l1:
            total = total + weights["l1"] * density_l1(config, params)
        if use_tv_density:
            total = total + weights["tv_d"] * tv_loss_density(config, params)
        if use_tv_app:
            total = total + weights["tv_a"] * tv_loss_app(config, params)
        # exp(|alpha|) surrogate distortion term (reference train.py:328-329;
        # the imported eff_distloss is unused there)
        total = total + 0.1 * jnp.mean(jnp.exp(jnp.abs(alpha)))
        return total, mse

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, mask, all_rays, all_rgbs, idx, key, bg_color,
             weights):
        rays = jnp.take(all_rays, idx, axis=0)
        rgbs = jnp.take(all_rgbs, idx, axis=0)
        rays, rgbs = _shard_batch(mesh, rays, rgbs)
        (total, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, mask, rays, rgbs, key, bg_color, weights
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, mse

    if not has_mask:
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step_nomask(params, opt_state, all_rays, all_rgbs, idx, key,
                        bg_color, weights):
            rays = jnp.take(all_rays, idx, axis=0)
            rgbs = jnp.take(all_rgbs, idx, axis=0)
            rays, rgbs = _shard_batch(mesh, rays, rgbs)
            (total, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, None, rays, rgbs, key, bg_color, weights
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, mse

        return step_nomask
    return step


def make_train_scan(config: FieldConfig, tx, *, has_mask: bool,
                    n_samples: int, ndc_ray: bool, ortho_weight: float,
                    use_l1: bool, use_tv_density: bool, use_tv_app: bool,
                    rgb_channels: int, batch_size: int, steps_per_call: int,
                    lr_factor: float, bg_mode: str, mesh=None,
                    pool_n: int | None = None):
    """Device-resident multi-step training: ``steps_per_call`` optimizer
    steps as ONE ``lax.scan`` inside one jit — zero host round trips between
    steps (the TPU-native answer to the reference's per-iteration
    ``.to(device)`` staging, train.py:262-349).

    Deviations from the single-step path, by design: batch indices are drawn
    with replacement via jax.random (the host path keeps the reference's
    epoch-permutation sampler), and the TV weights decay inside the carry.

    Returns run(params, opt_state[, mask], all_rays, all_rgbs, key, weights)
    -> (params, opt_state, weights, mse_trace [steps])."""

    def loss_fn(params, mask, rays, rgbs, key, bg_color, weights):
        rgb_map, depth, acc, alpha, z_vals, dists = render_rays(
            config, params, mask, rays, key=key, is_train=True,
            bg_color=bg_color, ndc_ray=ndc_ray, n_samples=n_samples,
        )
        if rgb_channels > 3:
            rgbs = jnp.clip(
                rgbs[..., :3] * rgbs[..., -1:] + bg_color * (1 - rgbs[..., -1:]),
                0.0, 1.0,
            )
        mse = jnp.mean((rgb_map - rgbs) ** 2)
        total = mse
        if ortho_weight > 0:
            total = total + ortho_weight * vector_comp_diffs(config, params)
        if use_l1:
            total = total + weights["l1"] * density_l1(config, params)
        if use_tv_density:
            total = total + weights["tv_d"] * tv_loss_density(config, params)
        if use_tv_app:
            total = total + weights["tv_a"] * tv_loss_app(config, params)
        total = total + 0.1 * jnp.mean(jnp.exp(jnp.abs(alpha)))
        return total, mse

    def scan_body(mask, all_rays, all_rgbs, carry, _):
        params, opt_state, weights, key = carry
        key, k_idx, k_step, k_bg = jax.random.split(key, 4)
        # pool_n < all_rays.shape[0] when the device pool is padded to a
        # mesh-size multiple: never draw the padding rows
        idx = jax.random.randint(
            k_idx, (batch_size,), 0, pool_n or all_rays.shape[0]
        )
        rays = jnp.take(all_rays, idx, axis=0)
        rgbs = jnp.take(all_rgbs, idx, axis=0)
        rays, rgbs = _shard_batch(mesh, rays, rgbs)
        if bg_mode == "random":
            bg = jax.random.uniform(k_bg, (3,))
        elif bg_mode == "white":
            bg = jnp.ones(3)
        else:
            bg = jnp.zeros(3)
        weights = {
            "l1": weights["l1"],
            "tv_d": weights["tv_d"] * lr_factor,
            "tv_a": weights["tv_a"] * lr_factor,
        }
        (_, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, mask, rays, rgbs, k_step, bg, weights
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, weights, key), mse

    if has_mask:
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def run(params, opt_state, mask, all_rays, all_rgbs, key, weights):
            body = functools.partial(scan_body, mask, all_rays, all_rgbs)
            (params, opt_state, weights, _), mses = jax.lax.scan(
                body, (params, opt_state, weights, key),
                jnp.arange(steps_per_call),
            )
            return params, opt_state, weights, mses
    else:
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def run(params, opt_state, all_rays, all_rgbs, key, weights):
            body = functools.partial(scan_body, None, all_rays, all_rgbs)
            (params, opt_state, weights, _), mses = jax.lax.scan(
                body, (params, opt_state, weights, key),
                jnp.arange(steps_per_call),
            )
            return params, opt_state, weights, mses

    return run


def filtering_rays_host(config: FieldConfig, all_rays: np.ndarray,
                        all_rgbs: np.ndarray, mask=None,
                        n_samples: int = 256, chunk: int = 51200,
                        bbox_only: bool = False):
    """Train-ray prefilter (reference filtering_rays, tensorBase.py:698-748):
    keep rays that hit the AABB (bbox_only) or that touch an occupied
    alpha-mask voxel. Runs chunked on device, returns filtered host arrays."""
    aabb = np.asarray(config.aabb_np)
    keep_chunks = []
    n = all_rays.shape[0]
    for i in range(0, n, chunk):
        rays = all_rays[i:i + chunk]
        rays_o, rays_d = rays[..., :3], rays[..., 3:6]
        if bbox_only:
            vec = np.where(rays_d == 0, 1e-6, rays_d)
            rate_a = (aabb[1] - rays_o) / vec
            rate_b = (aabb[0] - rays_o) / vec
            t_min = np.minimum(rate_a, rate_b).max(-1)
            t_max = np.maximum(rate_a, rate_b).min(-1)
            keep = t_max > t_min
        else:
            xyz, _, _ = sample_ray(
                config, jnp.asarray(rays_o), jnp.asarray(rays_d),
                is_train=False, n_samples=n_samples,
            )
            if (config.mask_gate_group >= 1 and mask.packed_bits is not None
                    and not mask.unisphere):
                hit = sample_alpha_gate(mask, xyz, config.mask_gate_group)
            else:
                hit = sample_alpha(mask, xyz) > 0
            keep = np.asarray(jnp.any(hit, axis=-1))
        keep_chunks.append(keep)
    keep = np.concatenate(keep_chunks)
    ratio = keep.sum() / n
    print(f"Ray filtering done! mask ratio: {ratio:.4f}")
    return all_rays[keep], all_rgbs[keep]


def field_config_from_args(args, aabb, grid_size, near_far) -> FieldConfig:
    n_sigma = args.n_lamb_sigma or [16, 16, 16]
    n_sh = args.n_lamb_sh or [48, 48, 48]
    if len(n_sigma) == 1:
        n_sigma = n_sigma * 3
    if len(n_sh) == 1:
        n_sh = n_sh * 3
    return FieldConfig(
        model_name=args.model_name,
        aabb=tuple(map(tuple, np.asarray(aabb, dtype=np.float32).tolist())),
        grid_size=tuple(int(g) for g in grid_size),
        density_n_comp=tuple(n_sigma),
        app_n_comp=tuple(n_sh),
        app_dim=args.data_dim_color,
        shading_mode=args.shadingMode,
        near_far=tuple(float(x) for x in near_far),
        density_shift=args.density_shift,
        alpha_mask_thres=args.alpha_mask_thre,
        distance_scale=args.distance_scale,
        ray_march_weight_thres=args.rm_weight_mask_thre,
        pos_pe=args.pos_pe,
        view_pe=args.view_pe,
        fea_pe=args.fea_pe,
        feature_c=args.featureC,
        step_ratio=args.step_ratio,
        fea2dense_act=args.fea2denseAct,
        contraction_type=args.contraction_type,
    )


def make_summary_writer(logfolder: str):
    """TensorBoard writer (reference train.py:157); no-op fallback when
    tensorboard isn't importable."""
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(logfolder)
    except ImportError:
        class _Null:
            def add_scalar(self, *a, **k):
                pass

            def close(self):
                pass

        return _Null()


def reconstruction(args, seed: int = 20211202, log_fn=print):
    """Full training driver (reference reconstruction, train.py:126-504).
    Returns (config, params, mask, logfolder)."""
    from iffnerf_tpu.data import dataset_dict
    from iffnerf_tpu.render import evaluation
    from iffnerf_tpu.checkpoint import save_field, load_field

    loader = dataset_dict[args.dataset_name]
    train_dataset = loader(args.datadir, split="train",
                           downsample=args.downsample_train, is_stack=False)
    test_dataset = loader(args.datadir, split="test",
                          downsample=args.downsample_train, is_stack=True)
    white_bg = train_dataset.white_bg
    near_far = train_dataset.near_far
    ndc_ray = bool(args.ndc_ray)

    logfolder = os.path.join(args.basedir, args.expname or "exp")
    if getattr(args, "add_timestamp", 0):
        import datetime

        logfolder += datetime.datetime.now().strftime("-%Y%m%d-%H%M%S")
    os.makedirs(logfolder, exist_ok=True)
    os.makedirs(f"{logfolder}/imgs_vis", exist_ok=True)

    aabb = train_dataset.scene_bbox
    reso_cur = N_to_reso(args.N_voxel_init, aabb)
    n_samples = min(args.nSamples, cal_n_samples(reso_cur, args.step_ratio))

    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)

    mask = None
    if args.ckpt is not None:
        config, params, mask = load_field(args.ckpt)
    else:
        config = field_config_from_args(args, aabb, reso_cur, near_far)
        params = init_field(init_key, config)

    lr_decay_iters = (
        args.lr_decay_iters if args.lr_decay_iters > 0 else args.n_iters
    )
    lr_factor = args.lr_decay_target_ratio ** (1.0 / lr_decay_iters)

    upsample_list = list(args.upsamp_list or [2000, 3000, 4000, 5500, 7000])
    update_mask_list = list(args.update_AlphaMask_list or [2000, 4000])
    n_voxel_list = n_voxel_schedule(
        args.N_voxel_init, args.N_voxel_final, len(upsample_list)
    )

    allrays = np.asarray(train_dataset.all_rays)
    allrgbs = np.asarray(train_dataset.all_rgbs)
    if not ndc_ray:
        allrays, allrgbs = filtering_rays_host(
            config, allrays, allrgbs, bbox_only=True
        )

    batch_size = (
        args.train_batch_size if args.train_batch_size > 0 else args.batch_size
    )
    sampler = SimpleSampler(allrays.shape[0], batch_size, seed=seed)

    bg_mode = "white" if white_bg else "black"
    l1_weight = args.L1_weight_inital
    tv_d, tv_a = args.TV_weight_density, args.TV_weight_app
    rgb_channels = allrgbs.shape[-1]

    # occupancy-adaptive compaction: size the masked step's static buffer to
    # the measured valid fraction at each phase boundary (--adaptive_compact)
    adaptive_compact = bool(int(getattr(args, "adaptive_compact", 1) or 0))

    # multi-device data mesh (SURVEY.md §5): shard the ray axis of the train
    # batch and the eval chunks over every visible device, parameters
    # replicated — `python train.py --config ...` on a pod slice trains on
    # all chips with single-device numerics (loss psum inserted by GSPMD)
    mesh_flag = int(getattr(args, "data_mesh", -1)
                    if getattr(args, "data_mesh", None) is not None else -1)
    mesh = None
    if mesh_flag != 0 and jax.device_count() > 1:
        from iffnerf_tpu.parallel import make_mesh

        mesh = make_mesh()
        log_fn(f"data mesh: {mesh.size} devices on axis 'data'")

    def replicated(tree):
        """Pin a parameter/mask pytree to every mesh device (no-op without
        a mesh). Re-run after phase events that rebuild arrays on one
        device (shrink, upsample, mask update)."""
        if mesh is None or tree is None:
            return tree
        from iffnerf_tpu.parallel import replicate_arrays

        return replicate_arrays(mesh, tree)

    def stage_pool(r, g):
        """Device-resident ray/rgb pool: sharded along 'data' (padded to a
        mesh multiple — padding rows are never indexed: the sampler and the
        scan's randint draw from the unpadded count)."""
        r, g = jnp.asarray(r), jnp.asarray(g)
        if mesh is not None:
            from iffnerf_tpu.parallel import pad_to_multiple, shard_rays

            r, _ = pad_to_multiple(r, mesh.size)
            g, _ = pad_to_multiple(g, mesh.size)
            r, g = shard_rays(mesh, r), shard_rays(mesh, g)
        return r, g

    def maybe_adapt_compact():
        nonlocal config, key
        if not (adaptive_compact and mask is not None and not ndc_ray
                and config.contraction_type == "aabb"):
            return
        key, probe_key = jax.random.split(key)
        new_ratio, frac = probe_compact_ratio(
            config, mask, allrays, probe_key, n_samples=n_samples,
            batch_size=batch_size,
        )
        # no ladder buffer below the break-even cap covers the occupancy:
        # march densely — constant fallback would only pay bookkeeping
        config = dataclasses.replace(
            config, compact_ratio=new_ratio if new_ratio is not None else 0.0
        )
        log_fn(f"compaction probe: valid fraction {frac:.3f} -> "
               f"compact_ratio {config.compact_ratio}")

    # max |dir component| over the training rays bounds the per-axis pixel
    # displacement between consecutive samples — it licenses the grouped
    # alpha-mask occupancy gate (gate_group_for). Computed over the pre-
    # refilter pool, so it stays valid for every later ray subset; floored
    # at 1.0 because mask_gate_group persists via the checkpoint's
    # self-describing kwargs into consumers with unit-normalized dirs
    # (|component| <= 1), e.g. the pose pipeline's point_color sampling.
    dir_bound = max(
        float(np.abs(allrays[:, 3:6]).max()) if len(allrays) else 1.0, 1.0
    )

    def maybe_enable_gate():
        """Re-derive the occupancy-gate group whenever the mask or the step
        size changes (mask build, shrink, upsample, resume). One gathered
        bit row then gates mask_gate_group consecutive samples in the train
        step and the refilter — exact under the spacing bound, and the
        gate's gather count is its entire TPU cost."""
        nonlocal config
        if (mask is None or ndc_ray or config.contraction_type != "aabb"
                or mask.packed_bits is None):
            return
        g = gate_group_for(mask.volume.shape, np.asarray(mask.aabb),
                           config.step_size, mask.bits_window,
                           dir_bound=dir_bound)
        config = dataclasses.replace(config, mask_gate_group=g)
        log_fn(f"mask occupancy gate: {g} samples per gathered bit row")

    # mid-schedule resume (--resume_iter N with --ckpt <expname>_phase.npz):
    # restart at a phase boundary; Adam moments begin fresh at the decayed
    # LR, exactly like the reference's own phase re-inits (train.py:401-415)
    start_it = int(getattr(args, "resume_iter", 0) or 0)
    lr_decay0 = 1.0
    if start_it > 0:
        if args.ckpt is None:
            raise ValueError("--resume_iter requires --ckpt "
                             "(the auto-saved phase checkpoint)")
        for _ in range(sum(1 for u in upsample_list if u <= start_it)):
            if n_voxel_list:
                n_voxel_list.pop(0)
        if update_mask_list and start_it >= update_mask_list[0]:
            l1_weight = args.L1_weight_rest
        tv_d *= lr_factor ** start_it
        tv_a *= lr_factor ** start_it
        reso_cur = list(config.grid_size)
        n_samples = min(args.nSamples,
                        cal_n_samples(config.grid_size, args.step_ratio))
        if (mask is not None and not ndc_ray and len(update_mask_list) > 1
                and start_it >= update_mask_list[1]):
            allrays, allrgbs = filtering_rays_host(
                config, allrays, allrgbs, mask=mask
            )
            sampler = SimpleSampler(allrays.shape[0], batch_size,
                                    seed=seed + start_it)
        if args.lr_upsample_reset:
            # an uninterrupted run resets the LR at every upsample boundary
            # (reference train.py:401-415), so a mid-phase resume must decay
            # only from the LAST boundary at or before start_it — decaying
            # from 0 would resume at e.g. ~0.54x instead of ~0.93x of lr_init
            last_reset = max([0] + [u for u in upsample_list
                                    if u <= start_it])
            lr_decay0 = lr_factor ** (start_it - last_reset)
        else:
            lr_decay0 = lr_factor ** start_it
        maybe_adapt_compact()
        log_fn(f"resuming at it {start_it} (grid {config.grid_size}, "
               f"{n_samples} samples, lr decay {lr_decay0:.4f})")

    maybe_enable_gate()

    state = make_optimizer(params, args.lr_init * lr_decay0,
                           args.lr_basis * lr_decay0, lr_factor)

    def build_step():
        return make_train_step(
            config, state.tx, has_mask=mask is not None, n_samples=n_samples,
            ndc_ray=ndc_ray, ortho_weight=args.Ortho_weight,
            use_l1=(args.L1_weight_inital > 0 or args.L1_weight_rest > 0),
            use_tv_density=args.TV_weight_density > 0,
            use_tv_app=args.TV_weight_app > 0,
            rgb_channels=rgb_channels, mesh=mesh,
        )

    step_fn = build_step()
    rays_dev, rgbs_dev = stage_pool(allrays, allrgbs)
    params = replicated(state.params)
    mask = replicated(mask)
    opt_state = replicated(state.opt_state)

    # device-resident multi-step mode (--train_scan 1): lax.scan chunks
    # between host events instead of one dispatch per iteration
    train_scan = bool(int(getattr(args, "train_scan", 0) or 0))
    scan_cache: dict = {}

    def build_scan(steps):
        if steps not in scan_cache:
            scan_cache[steps] = make_train_scan(
                config, state.tx, has_mask=mask is not None,
                n_samples=n_samples, ndc_ray=ndc_ray,
                ortho_weight=args.Ortho_weight,
                use_l1=(args.L1_weight_inital > 0 or args.L1_weight_rest > 0),
                use_tv_density=args.TV_weight_density > 0,
                use_tv_app=args.TV_weight_app > 0,
                rgb_channels=rgb_channels, batch_size=batch_size,
                steps_per_call=steps, lr_factor=lr_factor, bg_mode=bg_mode,
                mesh=mesh, pool_n=allrays.shape[0],
            )
        return scan_cache[steps]

    _ckpt_every = int(getattr(args, "ckpt_every", 0) or 0)
    boundaries = sorted(
        set(update_mask_list) | set(upsample_list)
        | set(range(args.progress_refresh_rate, args.n_iters + 1,
                    args.progress_refresh_rate))
        | (set(range(args.vis_every, args.n_iters + 1, args.vis_every))
           if args.N_vis != 0 else set())
        # scan stop points must land on ckpt_every multiples or the
        # periodic checkpoint test below never fires in scan mode
        | (set(range(_ckpt_every, args.n_iters + 1, _ckpt_every))
           if _ckpt_every > 0 else set())
        | {args.n_iters}
    )

    writer = make_summary_writer(logfolder)
    psnrs, psnrs_test = [], [0.0]
    t_start = time.perf_counter()
    # per-phase timing (phases = segments between alpha-mask/upsample
    # events; reference prints only the total, train.py:416-426)
    phase_log = []
    phase_state = {"it0": start_it, "t0": t_start}

    def mark_phase(event: str):
        now = time.perf_counter()
        iters = it + 1 - phase_state["it0"]
        if iters > 0:
            phase_log.append(
                (phase_state["it0"], it + 1, config.grid_size, iters,
                 now - phase_state["t0"], event)
            )
        phase_state["it0"] = it + 1
        phase_state["t0"] = now

    def save_phase_ckpt():
        """Crash insurance at phase boundaries: restart with
        --ckpt <expname>_phase.npz --resume_iter <it from phase_ckpt.json>."""
        import json

        save_field(f"{logfolder}/{args.expname or 'exp'}_phase.npz",
                   config, params, mask)
        with open(f"{logfolder}/phase_ckpt.json", "w") as f:
            json.dump({"it": it + 1, "compact_ratio": config.compact_ratio},
                      f)

    it = start_it - 1
    while it + 1 < args.n_iters:
        if train_scan:
            next_stop = min(b for b in boundaries if b > it + 1)
            steps = next_stop - (it + 1)
            key, scan_key = jax.random.split(key)
            weights = {
                "l1": jnp.float32(l1_weight),
                "tv_d": jnp.float32(tv_d),
                "tv_a": jnp.float32(tv_a),
            }
            run = build_scan(steps)
            try:
                if mask is not None:
                    params, opt_state, weights, mses = run(
                        params, opt_state, mask, rays_dev, rgbs_dev,
                        scan_key, weights,
                    )
                else:
                    params, opt_state, weights, mses = run(
                        params, opt_state, rays_dev, rgbs_dev, scan_key,
                        weights,
                    )
            except jax.errors.JaxRuntimeError as e:
                # e.g. a remote-compile helper OOM-kill. A compile failure
                # leaves the donated params/opt_state untouched (donation
                # only happens at execution), so fall back to the per-step
                # program — smaller, and often the only difference needed.
                # An EXECUTION-time failure consumed the donated buffers:
                # nothing to fall back with — re-raise (restart from the
                # auto-saved phase checkpoint with --resume_iter).
                if any(
                    getattr(x, "is_deleted", lambda: False)()
                    for x in jax.tree.leaves((params, opt_state))
                ):
                    raise
                log_fn(f"scan program failed ({type(e).__name__}: "
                       f"{str(e).splitlines()[0][:120]}); "
                       "falling back to per-step mode")
                scan_cache.clear()
                train_scan = False
                continue
            tv_d = tv_d * lr_factor ** steps
            tv_a = tv_a * lr_factor ** steps
            mse = mses[-1]
            it += steps
        else:
            it += 1
            idx = jnp.asarray(sampler.nextids())
            key, step_key, bg_key = jax.random.split(key, 3)
            if bg_mode == "random":
                bg_color = jax.random.uniform(bg_key, (3,))
            else:
                bg_color = jnp.ones(3) if bg_mode == "white" else jnp.zeros(3)
            tv_d, tv_a = tv_d * lr_factor, tv_a * lr_factor
            weights = {
                "l1": jnp.float32(l1_weight),
                "tv_d": jnp.float32(tv_d),
                "tv_a": jnp.float32(tv_a),
            }
            if mask is not None:
                params, opt_state, mse = step_fn(
                    params, opt_state, mask, rays_dev, rgbs_dev, idx,
                    step_key, bg_color, weights,
                )
            else:
                params, opt_state, mse = step_fn(
                    params, opt_state, rays_dev, rgbs_dev, idx, step_key,
                    bg_color, weights,
                )

        if (it + 1) % args.progress_refresh_rate == 0:
            m = float(mse)
            psnr = -10.0 * np.log(m) / np.log(10.0)
            psnrs.append(psnr)
            writer.add_scalar("train/PSNR", psnr, global_step=it)
            writer.add_scalar("train/mse", m, global_step=it)
            log_fn(
                f"it {it + 1:05d} train_psnr {np.mean(psnrs):.2f} "
                f"test_psnr {np.mean(psnrs_test):.2f} mse {m:.6f}"
            )
            psnrs = []

        if args.N_vis != 0 and (it + 1) % args.vis_every == 0:
            psnrs_test = evaluation(
                test_dataset, config, params, mask,
                f"{logfolder}/imgs_vis", N_vis=args.N_vis,
                prtx=f"{it + 1:06d}_", n_samples=n_samples,
                white_bg=white_bg, ndc_ray=ndc_ray,
                compute_extra_metrics=False, mesh=mesh,
            )
            writer.add_scalar("test/psnr", float(np.mean(psnrs_test)),
                              global_step=it)

        ckpt_every = int(getattr(args, "ckpt_every", 0) or 0)
        if (ckpt_every > 0 and (it + 1) % ckpt_every == 0
                and it + 1 < args.n_iters):
            save_phase_ckpt()

        if it + 1 in update_mask_list:
            mark_phase("alpha-mask update"
                       + (" + shrink" if it + 1 == update_mask_list[0]
                          else ""))
            reso_mask = reso_cur
            if reso_cur[0] * reso_cur[1] * reso_cur[2] > 256 ** 3:
                reso_mask = [256, 256, 256]
            mask, new_aabb, _ = update_alpha_mask(
                config, params, mask, tuple(reso_mask)
            )
            mask = replicated(mask)
            if it + 1 == update_mask_list[0]:
                config, params = shrink(config, params, new_aabb,
                                        mask.volume.shape[::-1])
                params = replicated(params)
                l1_weight = args.L1_weight_rest
                n_samples = min(args.nSamples,
                                cal_n_samples(config.grid_size,
                                              args.step_ratio))
                # Shrink changes grid shapes -> Adam moments must be rebuilt.
                # (The reference re-creates its optimizer at the coincident
                # upsample event, train.py:401-415.) Resume at the decayed LR.
                decay = lr_factor ** (it + 1)
                state = make_optimizer(params, args.lr_init * decay,
                                       args.lr_basis * decay, lr_factor)
                opt_state = replicated(state.opt_state)
            maybe_enable_gate()
            if (not ndc_ray and len(update_mask_list) > 1
                    and it + 1 == update_mask_list[1]):
                allrays, allrgbs = filtering_rays_host(
                    config, allrays, allrgbs, mask=mask
                )
                sampler = SimpleSampler(allrays.shape[0], batch_size,
                                        seed=seed + it)
                rays_dev, rgbs_dev = stage_pool(allrays, allrgbs)
            maybe_adapt_compact()
            step_fn = build_step()
            scan_cache.clear()
            save_phase_ckpt()

        if it + 1 in upsample_list:
            mark_phase("upsample")
            n_voxels = n_voxel_list.pop(0)
            reso_cur = N_to_reso(n_voxels, config.aabb_np)
            n_samples = min(args.nSamples,
                            cal_n_samples(reso_cur, args.step_ratio))
            config, params = upsample_volume_grid(config, params, reso_cur)
            params = replicated(params)
            maybe_enable_gate()
            if args.lr_upsample_reset:
                lr_scale = 1.0
            else:
                lr_scale = args.lr_decay_target_ratio ** (it / args.n_iters)
            state = make_optimizer(params, args.lr_init * lr_scale,
                                   args.lr_basis * lr_scale, lr_factor)
            opt_state = replicated(state.opt_state)
            # sample count grew with the grid: re-size the compaction buffer
            maybe_adapt_compact()
            step_fn = build_step()
            scan_cache.clear()
            save_phase_ckpt()

    mark_phase("end")
    total_s = time.perf_counter() - t_start
    for it0, it1, grid, iters, secs, event in phase_log:
        log_fn(
            f"phase it {it0:05d}-{it1:05d} grid {grid} "
            f"{iters} iters {secs:.1f}s ({1000 * secs / iters:.2f} ms/it) "
            f"-> {event}"
        )
    log_fn(f"total training time: {total_s:.1f}s "
           f"({1000 * total_s / max(args.n_iters, 1):.2f} ms/it)")

    writer.close()
    save_field(f"{logfolder}/{args.expname or 'exp'}.npz", config, params,
               mask)

    if args.render_train or args.render_test or args.render_path:
        _final_renders(args, config, params, mask, logfolder, test_dataset,
                       white_bg, ndc_ray, n_samples, mesh=mesh)
    return config, params, mask, logfolder


def _final_renders(args, config, params, mask, logfolder, test_dataset,
                   white_bg, ndc_ray, n_samples, mesh=None):
    """Final train/test/path renders (reference train.py:431-497)."""
    from iffnerf_tpu.data import dataset_dict
    from iffnerf_tpu.render import evaluation, evaluation_path

    if args.render_train:
        train_ds = dataset_dict[args.dataset_name](
            args.datadir, split="train", downsample=args.downsample_train,
            is_stack=True,
        )
        psnrs = evaluation(
            train_ds, config, params, mask, f"{logfolder}/imgs_train_all",
            N_vis=-1, n_samples=n_samples, white_bg=white_bg,
            ndc_ray=ndc_ray, mesh=mesh,
        )
        print(f"======> {args.expname} train all psnr: {np.mean(psnrs)} <===")
    if args.render_test:
        psnrs = evaluation(
            test_dataset, config, params, mask, f"{logfolder}/imgs_test_all",
            N_vis=-1, n_samples=n_samples, white_bg=white_bg,
            ndc_ray=ndc_ray, mesh=mesh,
        )
        print(f"======> {args.expname} test all psnr: {np.mean(psnrs)} <====")
    if args.render_path and test_dataset.render_path is not None:
        evaluation_path(
            config, params, mask, test_dataset.render_path, test_dataset,
            f"{logfolder}/imgs_path_all", n_samples=n_samples,
            white_bg=white_bg, ndc_ray=ndc_ray, mesh=mesh,
        )
