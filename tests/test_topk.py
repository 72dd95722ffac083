"""exact_topk (ops/topk.py) must be a drop-in for jax.lax.top_k: same
values, same indices, same tie order, across padded/unpadded and fallback
shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iffnerf_tpu.ops.topk import exact_topk


@pytest.mark.parametrize("n,k,block", [
    (540000, 100, 2048),   # production shape (pads 540000 -> 264*2048)
    (540000, 100, 2000),   # exact divisor, no pad
    (67500, 100, 2048),    # 8-way shard of the production vector
    (20000, 7, 512),
    (999, 5, 64),          # short-vector fallback path
    (4096, 4096 // 4, 512),
])
def test_matches_lax_topk(n, k, block):
    scores = jax.random.uniform(jax.random.PRNGKey(n + k), (n,), jnp.float32)
    w_ref, i_ref = jax.lax.top_k(scores, k)
    w, i = exact_topk(scores, k, block=block)
    np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w))
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i))


def test_tie_order_matches():
    """Equal values must resolve to the LOWER index, exactly like
    lax.top_k — including ties within a block and across blocks."""
    n, k, block = 40960, 64, 512
    rng = np.random.default_rng(3)
    base = rng.integers(0, 50, n).astype(np.float32)  # heavy ties
    scores = jnp.asarray(base)
    w_ref, i_ref = jax.lax.top_k(scores, k)
    w, i = exact_topk(scores, k, block=block)
    np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w))
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i))


def test_top_elements_in_padded_tail_region():
    """The winners can live in the final (padded) block; -inf padding must
    never displace them."""
    n, k, block = 10000, 8, 512  # 10000 = 19*512 + 272 -> padded tail
    scores = np.zeros(n, np.float32)
    winners = np.arange(n - k, n)  # all in the short tail block
    scores[winners] = np.arange(k) + 1.0
    w, i = exact_topk(jnp.asarray(scores), k, block=block)
    assert set(np.asarray(i).tolist()) == set(winners.tolist())
    assert float(jnp.min(w)) == 1.0


def test_jit_and_grad_free_shapes():
    f = jax.jit(lambda s: exact_topk(s, 100)[0])
    out = f(jnp.arange(540000, dtype=jnp.float32))
    assert out.shape == (100,)
    np.testing.assert_array_equal(
        np.asarray(out), np.arange(539999, 539899, -1, dtype=np.float32)
    )
