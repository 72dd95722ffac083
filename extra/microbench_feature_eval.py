"""Micro-benchmarks for round-2 eval-render levers (run alone on TPU):

  1. compute_features_fused per-slot cost with f32 vs bf16 packed tables
  2. block-flag popcount formulations (the 29 ms/chunk stage)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iffnerf_tpu.runtime import setup as _runtime_setup

_runtime_setup()

import jax
import jax.numpy as jnp

from iffnerf_tpu.models import FieldConfig, init_field


_RTT = None


def _pull(out):
    """Force completion by reading one scalar: block_until_ready is
    unreliable through the axon relay (returns before execution)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf))


def rtt():
    global _RTT
    if _RTT is None:
        x = jnp.ones((8,))
        _pull(x)
        t0 = time.perf_counter()
        for _ in range(10):
            _pull(x + 1.0)
        _RTT = (time.perf_counter() - t0) / 10
        print(f"{'scalar pull round-trip':46s} {_RTT * 1e3:8.1f} ms")
    return _RTT


def timeit(fn, *args, n=5, label=""):
    base = rtt()
    out = fn(*args)
    _pull(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _pull(out)  # same-stream ordering: all n executions completed
    dt = ((time.perf_counter() - t0) - base) / n * 1e3
    print(f"{label:46s} {dt:8.1f} ms")
    return out


def main():
    cfg = FieldConfig(
        grid_size=(300, 300, 300), density_n_comp=(16, 16, 16),
        app_n_comp=(48, 48, 48), app_dim=27, shading_mode="Ref",
        step_ratio=0.5, view_pe=2, fea_pe=2,
    )
    params = init_field(jax.random.PRNGKey(0), cfg)
    k = 1 << 21
    coords = jax.random.uniform(jax.random.PRNGKey(1), (k, 3),
                                minval=-1, maxval=1)

    from iffnerf_tpu.models.field import compute_features_fused

    @jax.jit
    def feat_f32(params, coords):
        return compute_features_fused(cfg, params, coords)

    timeit(feat_f32, params, coords,
           label=f"features f32 k={k/1e6:.2f}M")

    bf16_keys = ("density_plane", "density_line", "app_plane", "app_line")
    params_bf16 = {
        kk: (tuple(p.astype(jnp.bfloat16) for p in v)
             if kk in bf16_keys else v)
        for kk, v in params.items()
    }

    @jax.jit
    def feat_bf16(params, coords):
        return compute_features_fused(cfg, params, coords)

    timeit(feat_bf16, params_bf16, coords,
           label=f"features bf16 tables k={k/1e6:.2f}M")

    # ---- popcount formulations over a [16384*519] validity vector ----
    n = 16384 * 519
    valid = jax.random.uniform(jax.random.PRNGKey(2), (n,)) < 0.25

    @jax.jit
    def pop_any(v):
        blk = jnp.any(v.reshape(-1, 8), axis=-1)
        return blk, jnp.sum(blk)

    timeit(pop_any, valid, label="popcount: any over [n/8, 8]")

    @jax.jit
    def pop_max2d(v):
        m = v.reshape(-1, 128 * 8)          # lane-major layout
        blk = jnp.max(m.astype(jnp.float32)
                      .reshape(-1, 128, 8), axis=-1) > 0
        return blk.reshape(-1), jnp.sum(blk)

    timeit(pop_max2d, valid, label="popcount: f32 max [*, 128, 8]")

    @jax.jit
    def pop_matmul(v):
        f = v.reshape(-1, 8).astype(jnp.float32)
        s = f @ jnp.ones((8, 1), jnp.float32)
        blk = s[:, 0] > 0
        return blk, jnp.sum(blk)

    timeit(pop_matmul, valid, label="popcount: matmul reduce")

    @jax.jit
    def pop_strided(v):
        blk = v[0::8]
        for i in range(1, 8):
            blk = blk | v[i::8]
        return blk, jnp.sum(blk)

    timeit(pop_strided, valid, label="popcount: strided or")


if __name__ == "__main__":
    main()
