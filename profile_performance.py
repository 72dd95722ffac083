"""FLOPs / latency profiler for the render forward and training step
(reference profile_performance.py:47-191 — torch.profiler + CUDA events
become XLA cost analysis + jax.profiler traces + amortized wall timing).

Usage:
    python profile_performance.py --config configs/lego.txt [--trace DIR]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iffnerf_tpu.runtime import setup as _runtime_setup

_runtime_setup()

from iffnerf_tpu.config import config_parser


def flops_to_string(flops: float) -> str:
    """(reference utils.py:237-251)"""
    for unit, div in (("TFLOPs", 1e12), ("GFLOPs", 1e9), ("MFLOPs", 1e6)):
        if flops >= div:
            return f"{flops / div:.2f} {unit}"
    return f"{flops:.0f} FLOPs"


# TPU v5e (v5 lite) single-chip peaks. bf16 is the MXU native rate; f32
# matmuls lower to multi-pass bf16 so the realistic f32 ceiling is ~half.
V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = 98e12
V5E_HBM_GBS = 820.0


def mfu_string(flops: float, ms: float, bytes_accessed: float | None = None
               ) -> str:
    """Achieved TFLOP/s and %-of-peak (MFU) for a measured program, plus
    HBM-bandwidth utilization when XLA reports bytes accessed — the side
    that's saturated tells you whether the program is compute- or
    memory-bound (reference profile_performance.py:130-191 reports
    FLOPs-vs-latency; this adds the hardware ceilings)."""
    if not np.isfinite(flops) or ms <= 0:
        return "MFU n/a"
    tflops = flops / (ms * 1e-3) / 1e12
    s = (f"{tflops:.1f} TFLOP/s = {tflops * 1e12 / V5E_PEAK_BF16 * 100:.1f}%"
         f" of bf16 peak / {tflops * 1e12 / V5E_PEAK_F32 * 100:.1f}% of f32")
    if bytes_accessed and np.isfinite(bytes_accessed):
        gbs = bytes_accessed / (ms * 1e-3) / 1e9
        s += (f"; {gbs:.0f} GB/s = {gbs / V5E_HBM_GBS * 100:.0f}% of HBM"
              f" ({bytes_accessed / max(flops, 1):.2f} B/FLOP)")
    return s


def amortized_ms(fn, reps: int = 20) -> float:
    """Median wall time per call; amortizes host<->device round trips by
    timing ``reps`` dispatches between two fetches."""
    import jax

    fn()  # warm
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        # force a true sync through the transfer path
        np.asarray(jax.tree.leaves(out)[0])
        ts.append((time.perf_counter() - t0) / reps * 1000.0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    def _extra(p):
        p.add_argument("--trace", type=str, default=None)
        p.add_argument("--pose", type=int, default=1,
                       help="also profile the jitted pose program")

    args = config_parser(known_only=True, extra_parser_hook=_extra)

    from iffnerf_tpu.models import FieldConfig, init_field
    from iffnerf_tpu.models.render import render_rays
    from iffnerf_tpu.train.trainer import (
        field_config_from_args,
        make_optimizer,
        make_train_step,
    )
    from iffnerf_tpu.utils.misc import N_to_reso, cal_n_samples

    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
    reso = N_to_reso(args.N_voxel_init, aabb)
    n_samples = min(args.nSamples, cal_n_samples(reso, args.step_ratio))
    config = field_config_from_args(args, aabb, reso, (2.0, 6.0))
    key = jax.random.PRNGKey(0)
    params = init_field(key, config)

    n = args.batch_size
    k1, k2 = jax.random.split(key)
    rays_o = jax.random.uniform(k1, (n, 3), minval=-3, maxval=3)
    d = jax.random.normal(k2, (n, 3))
    rays = jnp.concatenate(
        [rays_o, d / jnp.linalg.norm(d, axis=-1, keepdims=True),
         0.01 * jnp.ones((n, 1))], axis=-1,
    )
    rgbs = jax.random.uniform(k1, (n, 4))

    # ---- forward ----
    fwd = jax.jit(
        lambda p, r: render_rays(config, p, None, r, is_train=False,
                                 white_bg=True, n_samples=n_samples)[0]
    )
    lowered = fwd.lower(params, rays)
    fwd_cost = lowered.compile().cost_analysis()
    fwd_flops = fwd_cost.get("flops", float("nan"))
    fwd_ms = amortized_ms(lambda: fwd(params, rays))
    print(f"forward:  {flops_to_string(fwd_flops)}  {fwd_ms:.3f} ms "
          f"({n} rays x {n_samples} samples)")
    print(f"          {mfu_string(fwd_flops, fwd_ms, fwd_cost.get('bytes accessed'))}")

    # ---- forward + backward (full train step) ----
    state = make_optimizer(params, args.lr_init, args.lr_basis, 0.9999)
    step_fn = make_train_step(
        config, state.tx, has_mask=False, n_samples=n_samples, ndc_ray=False,
        ortho_weight=0.0, use_l1=True, use_tv_density=False,
        use_tv_app=False, rgb_channels=4,
    )
    idx = jnp.arange(n, dtype=jnp.int32)
    weights = {"l1": jnp.float32(8e-5), "tv_d": jnp.float32(0),
               "tv_a": jnp.float32(0)}

    def run_step(p, o):
        return step_fn(p, o, rays, rgbs, idx, jax.random.PRNGKey(1),
                       jnp.ones(3), weights)

    # donate_argnums consumes its inputs -> hand the step copies so `params`
    # stays alive for the scan section below
    p = jax.tree.map(jnp.array, params)
    o = state.opt_state
    p, o, _ = run_step(p, o)  # warm/compile

    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(10):
            p, o, mse = run_step(p, o)
        float(mse)
        ts.append((time.perf_counter() - t0) / 10 * 1000.0)
    step_ms = float(np.median(ts))
    try:
        step_cost = step_fn.lower(
            jax.tree.map(jnp.array, params), state.opt_state, rays, rgbs,
            idx, jax.random.PRNGKey(1), jnp.ones(3), weights,
        ).compile().cost_analysis()
    except Exception:  # pragma: no cover - older jax cost-analysis quirks
        step_cost = {}
    step_flops = step_cost.get("flops", float("nan"))
    print(f"train step (fwd+bwd+adam): {step_ms:.3f} ms  "
          f"{flops_to_string(step_flops)}")
    print(f"          {mfu_string(step_flops, step_ms, step_cost.get('bytes accessed'))}")

    # ---- device-resident scan (no host round trips between steps) ----
    from iffnerf_tpu.train.trainer import make_train_scan

    scan_steps = 50
    run_scan = make_train_scan(
        config, state.tx, has_mask=False, n_samples=n_samples, ndc_ray=False,
        ortho_weight=0.0, use_l1=True, use_tv_density=False,
        use_tv_app=False, rgb_channels=4, batch_size=n,
        steps_per_call=scan_steps, lr_factor=0.9999, bg_mode="white",
    )
    w0 = {"l1": jnp.float32(8e-5), "tv_d": jnp.float32(0),
          "tv_a": jnp.float32(0)}
    # donate_argnums consumes its inputs -> hand the scan copies
    p2 = jax.tree.map(jnp.array, params)
    o2 = make_optimizer(params, args.lr_init, args.lr_basis, 0.9999).opt_state
    p2, o2, w1, mses = run_scan(p2, o2, rays, rgbs, jax.random.PRNGKey(2), w0)
    float(mses[-1])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        p2, o2, w1, mses = run_scan(p2, o2, rays, rgbs,
                                    jax.random.PRNGKey(3), w1)
        float(mses[-1])
        ts.append((time.perf_counter() - t0) / scan_steps * 1000.0)
    print(f"train step (scan x{scan_steps}, device-resident): "
          f"{float(np.median(ts)):.3f} ms/it")

    # ---- jitted pose program (bench.py's production configuration) ----
    if args.pose:
        import functools

        from iffnerf_tpu.pose import IDConfig, init_id_module
        from iffnerf_tpu.pose.id_module import run_attention
        from iffnerf_tpu.pose.solve import (
            _scores_maybe_fused,
            solve_pose_from_topk,
        )

        n_rays, k_top = 20000 * 27, 100
        # IFFNERF_FUSED_POSE=1 profiles the fused Pallas scoring kernel
        # (ops/fused_ray_attention.py) instead of the XLA chain
        fused = bool(int(os.environ.get("IFFNERF_FUSED_POSE", "0") or 0))
        cfg = IDConfig(compute_dtype="bfloat16", fused_scoring=fused)
        pkey = jax.random.PRNGKey(7)
        pparams = init_id_module(pkey, cfg)
        ks = jax.random.split(pkey, 4)
        img = jax.random.uniform(ks[0], (800, 800, 3))
        mask = jnp.ones((800, 800), bool)
        r_o = jax.random.uniform(ks[1], (n_rays, 3), minval=-1, maxval=1)
        rd = jax.random.normal(ks[2], (n_rays, 3))
        r_d = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        r_rgb = jax.random.uniform(ks[3], (n_rays, 3))
        up = jnp.asarray([0.0, 0.0, 1.0])

        @jax.jit
        def pose_once(pp, img, mask, ro, rd, rr):
            if fused:
                scores = _scores_maybe_fused(pp, cfg, img, mask, ro, rd, rr)
            else:
                scores, _, _, _ = run_attention(pp, cfg, img, mask, ro, rd,
                                                rr)
            w_k, i_k = jax.lax.top_k(scores, k_top)
            return solve_pose_from_topk(ro[i_k], rd[i_k], w_k, up)

        pose_args = (pparams, img, mask, r_o, r_d, r_rgb)
        pose_cost = pose_once.lower(*pose_args).compile().cost_analysis()
        pose_flops = pose_cost.get("flops", float("nan"))
        pose_ms = amortized_ms(lambda: pose_once(*pose_args))
        tag = "fused Pallas scoring" if fused else "XLA scoring"
        print(f"pose program (540k rays, bf16, {tag}): {pose_ms:.3f} ms  "
              f"{flops_to_string(pose_flops)}")
        print(f"          {mfu_string(pose_flops, pose_ms, pose_cost.get('bytes accessed'))}")

        # ---- the PRODUCTION banked per-image program (bench.py default):
        # image-independent ray keys precomputed once per object, per-image
        # cost = ViT + (fused) bank scoring + exact blocked top-k + solve
        from iffnerf_tpu.ops.topk import exact_topk
        from iffnerf_tpu.pose.id_module import (
            image_queries,
            ray_bank,
            score_rays,
        )

        bank = ray_bank(pparams, cfg, r_o, r_d, r_rgb)
        jax.block_until_ready(bank)

        import dataclasses

        def make_banked(c):
            @jax.jit
            def pose_banked(pp, img, mask, bank, ro, rd):
                q, pv, _ = image_queries(pp, c, img, mask)
                scores, _ = score_rays(pp, c, q, pv, None, None, None,
                                       bank=bank)
                w_k, i_k = exact_topk(scores, k_top)
                return solve_pose_from_topk(ro[i_k], rd[i_k], w_k, up)

            return pose_banked

        bargs = (pparams, img, mask, bank, r_o, r_d)
        # XLA cost analysis can't see inside a Pallas custom call: take
        # FLOPs/bytes from the mathematically identical XLA-path lowering
        # (the fused kernel recomputes the logits pass twice, so its true
        # FLOPs/bank-bytes are ~2x the reported single-pass figures)
        bcost = make_banked(
            dataclasses.replace(cfg, fused_bank=False)
        ).lower(*bargs).compile().cost_analysis()
        bflops = bcost.get("flops", float("nan"))
        banked_fn = make_banked(cfg)
        bms = amortized_ms(lambda: banked_fn(*bargs))
        bank_gb = bank.size * bank.dtype.itemsize / 1e9
        print(f"pose program BANKED ({bank.shape[0]} rays, bank "
              f"{bank_gb * 1e3:.0f} MB {bank.dtype}, fused_bank="
              f"{cfg.fused_bank}): {bms:.3f} ms  {flops_to_string(bflops)}"
              " [FLOPs/bytes from the XLA-path lowering; the fused kernel"
              " does ~2x both]")
        print(f"          {mfu_string(bflops, bms, bcost.get('bytes accessed'))}")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(5):
                p, o, mse = run_step(p, o)
            float(mse)
        print(f"profiler trace written to {args.trace}")


if __name__ == "__main__":
    main()
