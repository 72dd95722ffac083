"""The line-table one-hot-matmul backward (IFFNERF_LINE_MM_GRAD, default
ON on TPU) must be a pure reformulation: identical primals, grads equal
to XLA's derived scatter-add up to f32 summation order (the MXU
contraction accumulates the ~k/L updates per row in a different order)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _lerp_loss(packed, coords, g, l, c):
    from iffnerf_tpu.ops.packed_sample import packed_lerp

    out = packed_lerp(packed, l, c, coords)
    return jnp.vdot(out, g)


@pytest.mark.parametrize("l,c,n", [(31, 6, 8192), (300, 4, 4096)])
def test_lerp_mm_grad_matches_autodiff(monkeypatch, l, c, n):
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    packed = jax.random.normal(k1, (l, 2 * c))
    # include out-of-grid coords (zeros-padding corner cases)
    coords = jax.random.uniform(k2, (n,), minval=-1.2, maxval=1.2)
    g = jax.random.normal(k3, (n, c))

    monkeypatch.setenv("IFFNERF_LINE_MM_GRAD", "1")
    val_new = _lerp_loss(packed, coords, g, l, c)
    gp_new, gc_new = jax.grad(_lerp_loss, argnums=(0, 1))(
        packed, coords, g, l, c
    )
    monkeypatch.setenv("IFFNERF_LINE_MM_GRAD", "0")
    val_ref = _lerp_loss(packed, coords, g, l, c)
    gp_ref, gc_ref = jax.grad(_lerp_loss, argnums=(0, 1))(
        packed, coords, g, l, c
    )

    assert float(jnp.abs(val_new - val_ref)) == 0.0  # identical primal
    np.testing.assert_allclose(gc_new, gc_ref, rtol=2e-6, atol=2e-6)
    # ~n/l accumulands/row in a different order
    np.testing.assert_allclose(gp_new, gp_ref, rtol=1e-4, atol=1e-4)


def test_mm_grad_through_fused_features(monkeypatch):
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

    monkeypatch.setenv("IFFNERF_LINE_MM_GRAD", "1")
    g_new = jax.grad(loss)(params)
    monkeypatch.setenv("IFFNERF_LINE_MM_GRAD", "0")
    g_ref = jax.grad(loss)(params)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-5),
        g_new, g_ref,
    )
