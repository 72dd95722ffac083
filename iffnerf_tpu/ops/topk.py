"""Exact top-k via per-block top-k + merge.

``jax.lax.top_k`` over a long vector lowers to a partial sort whose cost
grows superlinearly in n; the pose estimate needs the global top-100 of
540k ray scores (reference identification_module.py:193-209). Every global
top-k element is a top-k element of its block, so a block-wise top-k
followed by a top-k over the ``n_blocks * k`` survivors is EXACT — and
measured 8.2x faster at the 540k/100 production shape on TPU v5e
(0.085 vs 0.699 ms, extra/microbench_topk.py; 270 x 2000-row blocks).

Tie semantics match ``lax.top_k`` (lower index wins): blocks are laid out
index-major, per-block ranks preserve index order within a block, and the
merge scans block-major — so equal values resolve to the lower global
index in both formulations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exact_topk(scores: jnp.ndarray, k: int, block: int = 2048):
    """Drop-in ``jax.lax.top_k(scores, k)`` for 1-D ``scores``, exact
    including tie order. Pads to a block multiple with -inf (never
    selected while k <= n). Falls back to the flat top_k when the vector
    is too short for blocking to pay."""
    n = scores.shape[0]
    b = max(block, k)
    if n <= 4 * b:
        return jax.lax.top_k(scores, k)
    nb = -(-n // b)
    pad = nb * b - n
    s = (jnp.pad(scores, (0, pad), constant_values=-jnp.inf) if pad
         else scores)
    vals, loc = jax.lax.top_k(s.reshape(nb, b), k)      # [nb, k]
    gidx = loc + (jnp.arange(nb, dtype=loc.dtype) * b)[:, None]
    w, sel = jax.lax.top_k(vals.reshape(-1), k)
    return w, jnp.take(gidx.reshape(-1), sel)
