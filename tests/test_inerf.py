"""Parity tests for the iNeRF baseline pieces (pose exponential map,
soft-Dice) vs the reference inerf/ modules."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.ref_loader import import_reference, load_ref_module

REF = import_reference()
pytestmark = pytest.mark.skipif(REF is None, reason="reference repo not mounted")

from iffnerf_tpu.inerf import camera_transfer, soft_dice_loss  # noqa: E402

RNG = np.random.default_rng(21)


def test_camera_transfer_parity():
    ref_inerf = load_ref_module("inerf/inerf.py", "ref_inerf")
    start = np.eye(4, dtype=np.float32)
    start[:3, 3] = [1.0, -2.0, 0.5]

    ct = ref_inerf.CameraTransfer(torch.from_numpy(start))
    w = RNG.standard_normal(3).astype(np.float32) * 0.3
    v = RNG.standard_normal(3).astype(np.float32) * 0.3
    theta = np.float32(0.7)
    with torch.no_grad():
        ct.w.copy_(torch.from_numpy(w))
        ct.v.copy_(torch.from_numpy(v))
        ct.theta.copy_(torch.tensor(theta))
    ref_pose = ct().detach().numpy()

    ours = np.asarray(
        camera_transfer(jnp.asarray(w), jnp.asarray(v), jnp.asarray(theta),
                        jnp.asarray(start))
    )
    np.testing.assert_allclose(ours, ref_pose, rtol=1e-4, atol=1e-5)


def test_soft_dice_parity():
    ref_dice = load_ref_module("inerf/dice_loss.py", "ref_dice")
    logits = RNG.standard_normal((1024, 1)).astype(np.float32)
    labels = (RNG.uniform(0, 1, (1024, 1)) > 0.5).astype(np.float32)

    ref = ref_dice.SoftDiceLossV2()(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).detach().numpy()
    ours = float(soft_dice_loss(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(ours, float(ref), rtol=1e-4, atol=1e-5)
