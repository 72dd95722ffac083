"""Frozen-field loading for the pose pipeline
(reference pose_estimation/model_utils.py:4-33)."""

from __future__ import annotations


def load_model(checkpoint_path: str):
    """Load a TensoRF field from our ``.npz`` or a reference ``.th``
    checkpoint. Returns (config, params, mask); parameters are frozen by
    construction (pure pytrees — nothing holds optimizer state)."""
    from iffnerf_tpu.checkpoint import load_field, load_torch_checkpoint

    if checkpoint_path.endswith(".th"):
        return load_torch_checkpoint(checkpoint_path)
    return load_field(checkpoint_path)
