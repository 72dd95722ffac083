"""Microbench: 1-D cumsum formulations over ~530k int32 flags on TPU.

Motivation: the 300^3 masked train step's compact-march index extraction
(models/render.py::_compact_march) pays ~24 ms/step for jnp.nonzero over the
530k block flags, and the round-5 E-stage decomposition
(extra/decompose_train_step.py --stages E) attributes nearly all of it to the
1-D cumsum XLA emits for nonzero (cumsum+drop-scatter = 25.5 ms vs nonzero's
27.7; the scatter is ~2 ms). XLA lowers a long 1-D cumsum to a log-depth pass
chain that runs lane-starved on the VPU. Candidates:

  a. jnp.cumsum on the flat [n] vector (status quo inside nonzero)
  b. two-level reshape: [R, C] row sums -> tiny exclusive cumsum over R ->
     inner cumsum along axis 1 (vectorized over rows)
  c. matmul cumsum: inner scan as flags[R, C] @ triu(ones(C, C)) on the MXU
     (f32 accumulate; flags are 0/1 so exact), outer level as in (b)
  d. (c) recursively for the outer level too

Each is validated elementwise against (a) before timing.

Reference axis: tensoRF's masked filtering uses torch nonzero
(reference tensorBase.py:839-851); this is our TPU-native replacement cost.
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(out[:1])  # force-complete data pull (BASELINE method)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(out[:1])
    return (time.perf_counter() - t0) / reps * 1e3


def cumsum_flat(f):
    return jnp.cumsum(f.astype(jnp.int32))


def make_two_level(n, c):
    r = n // c

    def two_level(f):
        x = f.astype(jnp.int32).reshape(r, c)
        inner = jnp.cumsum(x, axis=1)
        row = inner[:, -1]
        off = jnp.cumsum(row) - row
        return (inner + off[:, None]).reshape(n)

    return two_level


def make_matmul(n, c, outer_matmul=False):
    r = n // c
    tri_c = jnp.triu(jnp.ones((c, c), jnp.float32)).T  # lower-tri: inclusive

    def mm(f):
        x = f.astype(jnp.float32).reshape(r, c)
        inner = jnp.dot(x, tri_c)  # [r, c] inclusive row cumsum, exact (<2^24)
        row = inner[:, -1]
        if outer_matmul:
            # pad r to a multiple of 128 and scan rows the same way
            rc = 128
            rp = ((r + rc - 1) // rc) * rc
            row_p = jnp.zeros((rp,), jnp.float32).at[:r].set(row)
            tri_r = jnp.triu(jnp.ones((rc, rc), jnp.float32)).T
            inner2 = jnp.dot(row_p.reshape(rp // rc, rc), tri_c[:rc, :rc]
                             if rc == c else tri_r)
            row2 = inner2[:, -1]
            off2 = jnp.cumsum(row2) - row2
            off = (inner2 + off2[:, None]).reshape(rp)[:r] - row
        else:
            off = jnp.cumsum(row) - row
        return (inner + off[:, None]).reshape(n).astype(jnp.int32)

    return mm


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=530432)  # 4243456/8 rounded to C
    p.add_argument("--density", type=float, default=0.085)
    p.add_argument("--reps", type=int, default=30)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    candidates = {}
    for c in (128, 256, 512, 1024):
        n = (args.n // c) * c
        candidates[f"b. two-level reshape C={c}"] = (n, make_two_level(n, c))
        candidates[f"c. matmul inner C={c}"] = (n, make_matmul(n, c))
        candidates[f"d. matmul inner+outer C={c}"] = (
            n, make_matmul(n, c, outer_matmul=True))

    n0 = args.n
    f0 = jnp.asarray(rng.random(n0) < args.density)
    flat = jax.jit(cumsum_flat)
    ref_ms = _time(flat, f0, reps=args.reps)
    print(f"a. flat jnp.cumsum [{n0}]                  {ref_ms:8.3f} ms")

    for name, (n, fn) in candidates.items():
        f = f0[:n]
        jf = jax.jit(fn)
        got = np.asarray(jf(f))
        want = np.asarray(jax.jit(cumsum_flat)(f))
        ok = bool((got == want).all())
        ms = _time(jf, f, reps=args.reps)
        print(f"{name:<42} {ms:8.3f} ms  exact={ok}")


if __name__ == "__main__":
    main()
