"""The opt-in sorted-scatter backward (IFFNERF_SORTED_SCATTER) must be a
pure reformulation: identical primals, grads equal to XLA's derived
backward up to f32 summation order (the scatter-adds accumulate in a
different order once the indices are sorted)."""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iffnerf_tpu.ops import packed_sample as ps


@pytest.fixture
def sorted_grad_on(monkeypatch):
    monkeypatch.setattr(ps, "SORTED_SCATTER_GRAD", True)


@contextlib.contextmanager
def sorted_grad_off():
    """Temporarily restore the default XLA-derived backward (the oracle)."""
    orig = ps.SORTED_SCATTER_GRAD
    ps.SORTED_SCATTER_GRAD = False
    try:
        yield
    finally:
        ps.SORTED_SCATTER_GRAD = orig


def _bilerp_loss(packed, coords, g, h, w, c):
    out = ps.packed_bilerp(packed, h, w, c, coords)
    return jnp.vdot(out, g)


def _lerp_loss(packed, coords, g, l, c):
    out = ps.packed_lerp(packed, l, c, coords)
    return jnp.vdot(out, g)


def test_bilerp_sorted_grad_matches_autodiff(sorted_grad_on):
    h, w, c = 19, 23, 6
    n = 4096
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    packed = jax.random.normal(k1, (h * w, 4 * c))
    # include out-of-grid coords (zeros-padding corner cases)
    coords = jax.random.uniform(k2, (n, 2), minval=-1.3, maxval=1.3)
    g = jax.random.normal(k3, (n, c))

    val_new = _bilerp_loss(packed, coords, g, h, w, c)
    gp_new, gc_new = jax.grad(_bilerp_loss, argnums=(0, 1))(
        packed, coords, g, h, w, c
    )

    with sorted_grad_off():
        val_ref = _bilerp_loss(packed, coords, g, h, w, c)
        gp_ref, gc_ref = jax.grad(_bilerp_loss, argnums=(0, 1))(
            packed, coords, g, h, w, c
        )

    assert float(jnp.abs(val_new - val_ref)) == 0.0
    np.testing.assert_allclose(gc_new, gc_ref, rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(gp_new, gp_ref, rtol=2e-5, atol=2e-5)


def test_lerp_sorted_grad_matches_autodiff(sorted_grad_on):
    l, c = 31, 6
    n = 8192  # every line row hit ~260x: the heavy-duplication case
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    packed = jax.random.normal(k1, (l, 2 * c))
    coords = jax.random.uniform(k2, (n,), minval=-1.2, maxval=1.2)
    g = jax.random.normal(k3, (n, c))

    gp_new, gc_new = jax.grad(_lerp_loss, argnums=(0, 1))(
        packed, coords, g, l, c
    )
    with sorted_grad_off():
        gp_ref, gc_ref = jax.grad(_lerp_loss, argnums=(0, 1))(
            packed, coords, g, l, c
        )

    np.testing.assert_allclose(gc_new, gc_ref, rtol=2e-6, atol=2e-6)
    # ~260 accumulands/row in a different order: scale tolerance with that
    np.testing.assert_allclose(gp_new, gp_ref, rtol=1e-4, atol=1e-4)


def test_sorted_grad_through_fused_features(sorted_grad_on):
    """End-to-end through compute_features_fused (what training runs)."""
    from iffnerf_tpu.models import FieldConfig, init_field
    from iffnerf_tpu.models.field import compute_features_fused

    config = FieldConfig(
        grid_size=(17, 19, 23),
        density_n_comp=(4, 4, 4),
        app_n_comp=(6, 6, 6),
    )
    params = init_field(jax.random.PRNGKey(2), config)
    xyz = jax.random.uniform(
        jax.random.PRNGKey(3), (2048, 3), minval=-1, maxval=1
    )

    def loss(p):
        sigma, app = compute_features_fused(config, p, xyz)
        return jnp.sum(sigma**2) + jnp.sum(app**2)

    g_new = jax.grad(loss)(params)
    with sorted_grad_off():
        g_ref = jax.grad(loss)(params)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-5),
        g_new, g_ref,
    )
