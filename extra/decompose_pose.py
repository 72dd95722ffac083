"""Stage decomposition of the single-image pose program (TPU, run alone).

Times, with the relay-safe in-graph fori_loop pattern:
  a. ray_mlp_inputs        — PE expansion of 540k rays (image-independent)
  b. ray MLP + k-projection — image-independent ray features
  c. image_queries          — ViT-S/14 + patch PE + mask select (per image)
  d. logits + softmax score — K @ Q^T and the column-softmax row sum
  e. full estimate          — everything + top-k + solve

The a+b stages depend only on the candidate-ray set, which is FIXED per
object at test time (reference test.py:84 receives the same rays for every
frame of an object) — they are precomputable, which bounds the banked
per-image latency at roughly c+d+solve.
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

from iffnerf_tpu.pose import IDConfig, init_id_module
from iffnerf_tpu.pose.id_module import (
    image_queries,
    ray_mlp_inputs,
    run_attention,
    score_rays,
)
from iffnerf_tpu.pose.solve import solve_pose_from_topk


def _pull(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def rtt():
    x = jnp.ones((8,))
    _pull(x)
    t0 = time.perf_counter()
    for _ in range(10):
        _pull(x + 1.0)
    return (time.perf_counter() - t0) / 10


def bench(label, make_body, reps=16, base=0.0, consts=(), timed=3):
    # large closures (e.g. the 414 MB ray bank) must flow as ARGUMENTS:
    # closed-over arrays become jaxpr constants and the remote-compile
    # request then exceeds the relay's body-size limit (HTTP 413)
    @jax.jit
    def looped(*consts):
        def body(i, carry):
            return carry + make_body(i, *consts)

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    _pull(looped(*consts))
    ts = []
    for _ in range(timed):
        t0 = time.perf_counter()
        _pull(looped(*consts))
        ts.append(time.perf_counter() - t0)
    dt = (float(np.median(ts)) - base) / reps * 1e3
    print(f"{label:52s} {dt:8.3f} ms  (reps={reps})")
    return dt


def main():
    n_rays = 20000 * 27
    cfg = IDConfig(compute_dtype="bfloat16")
    key = jax.random.PRNGKey(0)
    params = init_id_module(key, cfg)
    ks = jax.random.split(key, 6)
    img = jax.random.uniform(ks[0], (800, 800, 3))
    mask = jnp.ones((800, 800), bool)
    r_o = jax.random.uniform(ks[1], (n_rays, 3), minval=-1, maxval=1)
    rd = jax.random.normal(ks[2], (n_rays, 3))
    r_d = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    r_rgb = jax.random.uniform(ks[3], (n_rays, 3))
    up = jnp.asarray([0.0, 0.0, 1.0])

    base = rtt()
    print(f"scalar pull rtt {base * 1e3:.1f} ms")

    def nudge(x, i):
        # a REAL per-iteration perturbation: "+ i * 0.0" gets constant-
        # folded by current XLA and the whole loop body CSEs into one
        # iteration (negative times after rtt subtraction)
        return x + jnp.float32(i) * 1e-12

    banked_only = "--banked-only" in sys.argv

    # a. PE expansion
    banked_only or bench("a. ray_mlp_inputs (PE, image-independent)",
          lambda i: jnp.sum(
              ray_mlp_inputs(cfg, nudge(r_o, i), r_d, r_rgb)
              .astype(jnp.float32)[:, 0]
          ), base=base)

    # b. a + ray MLP + k_proj (the full image-independent ray side)
    from iffnerf_tpu.pose.id_module import ray_features

    banked_only or bench("b. ray features (PE + MLP + k_proj, img-indep)",
          lambda i: jnp.sum(
              ray_features(params, cfg, nudge(r_o, i), r_d, r_rgb)
              .astype(jnp.float32)[:, 0]
          ), base=base)

    # c. image side (per image)
    banked_only or bench("c. image_queries (ViT + patch PE + select)",
          lambda i: jnp.sum(
              image_queries(params, cfg, nudge(img, i), mask)[0]
              .astype(jnp.float32)
          ), base=base)

    # d. full scoring
    banked_only or bench("d. run_attention (a+b+c + logits + softmax)",
          lambda i: jnp.sum(run_attention(
              params, cfg, nudge(img, i), mask, r_o, r_d, r_rgb)[0]),
          base=base)

    # e. full estimate
    def full(i):
        scores, _, _, _ = run_attention(
            params, cfg, nudge(img, i), mask, r_o, r_d, r_rgb
        )
        w_k, i_k = jax.lax.top_k(scores, 100)
        return jnp.sum(solve_pose_from_topk(r_o[i_k], r_d[i_k], w_k, up))

    banked_only or bench("e. full estimate (d + top-k + solve)", full, base=base)

    # ---- banked path (round-4: where does the 4.1 ms go?) ----
    from iffnerf_tpu.pose.id_module import ray_bank, score_rays as _score

    bank = ray_bank(params, cfg, r_o, r_d, r_rgb)
    q0, patch_valid, _ = image_queries(params, cfg, img, mask)
    jax.block_until_ready((bank, q0))

    # f. banked per-image estimate (what bench.py measures)
    def banked_full(i, bank):
        q, pv, _ = image_queries(params, cfg, nudge(img, i), mask)
        scores, _ = _score(params, cfg, q, pv, None, None, None, bank=bank)
        w_k, i_k = jax.lax.top_k(scores, 100)
        return jnp.sum(solve_pose_from_topk(r_o[i_k], r_d[i_k], w_k, up))

    bench("f. banked estimate (ViT + score + topk + solve)", banked_full,
          base=base, consts=(bank,), reps=256)

    # g. banked scoring epilogue only (q fixed): logits + softmax + colsum
    bench("g. banked score_rays only (logits+softmax+sum)",
          lambda i, bank: jnp.sum(_score(params, cfg, nudge(q0, i),
                                         patch_valid, None, None, None,
                                         bank=bank)[0]),
          base=base, consts=(bank,), reps=256)

    # g2. banked scoring via the two-pass Pallas kernel (fused_bank)
    import dataclasses as _dc

    cfg_fused = _dc.replace(cfg, fused_bank=True)
    bench("g2. banked score, fused Pallas two-pass kernel",
          lambda i, bank: jnp.sum(_score(params, cfg_fused, nudge(q0, i),
                                         patch_valid, None, None, None,
                                         bank=bank)[0]),
          base=base, consts=(bank,), reps=256)

    # f2. banked estimate with the fused kernel (candidate default)
    def banked_full_fused(i, bank):
        q, pv, _ = image_queries(params, cfg_fused, nudge(img, i), mask)
        scores, _ = _score(params, cfg_fused, q, pv, None, None, None,
                           bank=bank)
        w_k, i_k = jax.lax.top_k(scores, 100)
        return jnp.sum(solve_pose_from_topk(r_o[i_k], r_d[i_k], w_k, up))

    bench("f2. banked estimate, fused kernel", banked_full_fused,
          base=base, consts=(bank,), reps=256)

    # h. the bare [R,D]@[D,P] logits matmul, output reduced in-epilogue
    # (no [P,R] HBM write): the MXU+bank-read floor of stage g
    def matmul_only(i, bank):
        l = jnp.dot(nudge(q0, i), bank.T,
                    preferred_element_type=jnp.float32)
        return jnp.sum(l)

    bench("h. logits matmul, fused-reduce (MXU floor)", matmul_only,
          base=base, consts=(bank,), reps=256)

    # i. top-k + solve on precomputed scores
    scores0, _ = _score(params, cfg, q0, patch_valid, None, None, None,
                        bank=bank)
    jax.block_until_ready(scores0)

    def topk_solve(i):
        w_k, i_k = jax.lax.top_k(nudge(scores0, i), 100)
        return jnp.sum(solve_pose_from_topk(r_o[i_k], r_d[i_k], w_k, up))

    bench("i. top-k(540k) + closed-form solve", topk_solve, base=base,
          reps=256)


if __name__ == "__main__":
    main()
