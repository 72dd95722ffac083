"""Round benchmark: single-image 6DoF pose-estimation latency (the
north-star metric, BASELINE.md: < 20 ms on TPU v5e-1 at reference scale).

Measures the full jit-compiled estimate — DINOv2 ViT-S/14 over a 224x224
crop, 540k candidate-ray scoring (QK attention), top-100, duplicate drop,
closed-form LSQ intersection, look-at — the reference's test.py:84-194 path
(SURVEY.md §3.6). Weights are random (latency is weight-independent).

Timing note: this environment reaches the TPU through a network relay whose
host<->device round trip is ~25 ms and whose ``block_until_ready`` does not
actually block, so the estimate runs K times inside ONE compiled program
(inputs perturbed per iteration so XLA can't CSE) and the measured wall
time has the independently-measured round-trip subtracted before dividing
by K.

Prints ONE JSON line; ``vs_baseline`` is the speedup vs the 20 ms driver
target (>1 = better than target).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _fail(stage: str, exc: BaseException) -> "NoReturn":
    """Emit ONE parseable JSON line on infra failure (backend down, relay
    wedged) so the driver can distinguish an outage from a regression."""
    print(json.dumps({
        "metric": "single_image_pose_latency",
        "value": None,
        "unit": "ms",
        "vs_baseline": None,
        "error": f"{stage}: {type(exc).__name__}: {exc}"[:500],
    }))
    sys.exit(1)


try:
    from iffnerf_tpu.runtime import setup as _runtime_setup

    _runtime_setup()
except BaseException as e:  # noqa: BLE001 - jax raises non-Exception errors
    if isinstance(e, (KeyboardInterrupt, SystemExit)):
        raise
    _fail("backend init", e)


def _median_time(fn, reps: int = 5) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from iffnerf_tpu.pose import IDConfig, init_id_module
    from iffnerf_tpu.pose.id_module import run_attention
    from iffnerf_tpu.pose.solve import _scores_maybe_fused, solve_pose_from_topk

    n_rays = 20000 * 27  # reference scale: 20k surface points x 27 isocell
    k_top = 100
    K = 16  # estimates per compiled program
    # IFFNERF_FUSED_POSE=1 routes scoring through the fused Pallas
    # ray-MLP+attention kernel (ops/fused_ray_attention.py) for the A/B.
    # IFFNERF_POSE_BANKED=1 measures the repeated-query latency against a
    # precomputed per-object ray bank (id_module.ray_bank) — the production
    # shape of the pose server, and what pose/test.py now runs.
    fused = bool(int(os.environ.get("IFFNERF_FUSED_POSE", "0") or 0))
    banked = bool(int(os.environ.get("IFFNERF_POSE_BANKED", "1") or 0))
    cfg = IDConfig(compute_dtype="bfloat16",  # inference path: bf16 matmuls
                   fused_scoring=fused)
    key = jax.random.PRNGKey(0)
    params = init_id_module(key, cfg)

    ks = jax.random.split(key, 6)
    img = jax.random.uniform(ks[0], (800, 800, 3))
    mask = jnp.ones((800, 800), bool)
    rays_ori = jax.random.uniform(ks[1], (n_rays, 3), minval=-1, maxval=1)
    dirs = jax.random.normal(ks[2], (n_rays, 3))
    rays_dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_rgb = jax.random.uniform(ks[3], (n_rays, 3))
    model_up = jnp.asarray([0.0, 0.0, 1.0])

    bank = None
    if banked:
        from iffnerf_tpu.pose.id_module import ray_bank

        bank = ray_bank(params, cfg, rays_ori, rays_dirs, rays_rgb)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run_k(params, img, mask, rays_ori, rays_dirs, rays_rgb, bank,
              reps: int):
        def body(i, acc):
            img_i = img + 1e-6 * i  # defeat CSE across iterations
            if banked:
                from iffnerf_tpu.pose.id_module import image_queries, score_rays

                q, patch_valid, _ = image_queries(params, cfg, img_i, mask)
                scores, _ = score_rays(params, cfg, q, patch_valid, None,
                                       None, None, bank=bank)
            elif fused:
                scores = _scores_maybe_fused(
                    params, cfg, img_i, mask, rays_ori, rays_dirs, rays_rgb
                )
            else:
                scores, _, _, _ = run_attention(
                    params, cfg, img_i, mask, rays_ori, rays_dirs, rays_rgb
                )
            from iffnerf_tpu.ops.topk import exact_topk

            weights_k, idx = exact_topk(scores, k_top)
            c2w = solve_pose_from_topk(
                rays_ori[idx], rays_dirs[idx], weights_k, model_up
            )
            return acc + jnp.sum(c2w)
        return jax.lax.fori_loop(0, reps, body, 0.0)

    # round-trip floor: an (almost) empty program with the same fetch
    @jax.jit
    def empty(x):
        return x + 1.0

    float(empty(jnp.float32(0)))
    rt = _median_time(lambda: float(empty(jnp.float32(0))), reps=10)

    args = (params, img, mask, rays_ori, rays_dirs, rays_rgb, bank)
    float(run_k(*args, reps=K))  # compile
    total = _median_time(lambda: float(run_k(*args, reps=K)), reps=5)

    ms = max(total - rt, 0.0) / K * 1000.0

    print(json.dumps({
        "metric": "single_image_pose_latency",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(20.0 / max(ms, 1e-9), 3),
        "mode": ("banked" if banked else
                 "fused" if fused else "unbanked"),
    }))


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001
        if isinstance(e, (KeyboardInterrupt, SystemExit)):
            raise
        _fail("bench run", e)
