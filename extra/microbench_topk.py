"""Top-k formulations over the 540k-ray score vector (TPU, run alone).

jax.lax.top_k over the full vector lowers to a (partial) sort whose cost
grows superlinearly in n; the pose estimate only needs the global top-100,
which is EXACTLY recoverable from per-block top-100s (any global top-100
element is a top-100 element of its block). Candidates:

  t1. lax.top_k(540k, 100)                  — current
  t2. two-stage: [B, n/B] row-wise top_k(100) -> merge top_k over B*100
  t3. jax.lax.approx_max_k (recall<1; listed for the record, NOT exact)
"""

import sys
import time
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iffnerf_tpu.runtime import setup as _runtime_setup

_runtime_setup()

import jax
import jax.numpy as jnp

N = 20000 * 27
K = 100


def _pull(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def rtt():
    x = jnp.ones((8,))
    _pull(x)
    t0 = time.perf_counter()
    for _ in range(10):
        _pull(x + 1.0)
    return (time.perf_counter() - t0) / 10


def bench(label, make_body, reps=256, base=0.0, timed=3):
    @jax.jit
    def looped():
        def body(i, carry):
            return carry + make_body(i)

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    _pull(looped())
    ts = []
    for _ in range(timed):
        t0 = time.perf_counter()
        _pull(looped())
        ts.append(time.perf_counter() - t0)
    dt = (float(np.median(ts)) - base) / reps * 1e3
    print(f"{label:52s} {dt:8.3f} ms")
    return dt


def two_stage_topk(scores, k, blocks):
    n = scores.shape[0]
    per = n // blocks
    vals, loc = jax.lax.top_k(scores.reshape(blocks, per), k)  # [B,k]
    gidx = loc + (jnp.arange(blocks, dtype=loc.dtype) * per)[:, None]
    w, sel = jax.lax.top_k(vals.reshape(-1), k)
    return w, gidx.reshape(-1)[sel]


def main():
    key = jax.random.PRNGKey(0)
    scores = jax.random.uniform(key, (N,), jnp.float32)
    jax.block_until_ready(scores)

    # exactness check first (host)
    w1, i1 = jax.lax.top_k(scores, K)
    for blocks in (54, 108, 270, 540):
        w2, i2 = two_stage_topk(scores, K, blocks)
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    print("two-stage exactness: OK (54/108/270/540 blocks)")

    base = rtt()
    print(f"scalar pull rtt {base * 1e3:.1f} ms")

    def nudge(i):
        return scores + jnp.float32(i) * 1e-12

    bench("t1. lax.top_k(540k, 100)",
          lambda i: jnp.sum(jax.lax.top_k(nudge(i), K)[0]), base=base)
    for blocks in (54, 108, 270, 540):
        bench(f"t2. two-stage top_k, {blocks} blocks",
              lambda i, b=blocks: jnp.sum(two_stage_topk(nudge(i), K, b)[0]),
              base=base)
    bench("t3. approx_max_k (recall .95, NOT exact)",
          lambda i: jnp.sum(jax.lax.approx_max_k(nudge(i), K)[0]), base=base)


if __name__ == "__main__":
    main()
