"""Closed-form pose geometry: weighted least-squares ray intersection,
look-at rotation, pose error metrics
(reference pose_estimation/pose_geometry.py:42-204, errors.py:3-9).

All functions are jnp + jit-safe: the reference's NaN early-returns become
``where`` guards so the whole pose solve can live inside one XLA program
(SURVEY.md §7 "one jit-compiled pose graph").
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_line_intersection_impl2(points: jnp.ndarray,
                                    directions: jnp.ndarray,
                                    weights: jnp.ndarray | None = None):
    """Weighted LSQ intersection of N 3-D lines: R = Σ wᵢ (I − dᵢdᵢᵀ),
    q = Σ wᵢ (I − dᵢdᵢᵀ) pᵢ, solve R p = q; singular R -> NaN
    (reference pose_geometry.py:42-95)."""
    eye = jnp.eye(directions.shape[-1], dtype=points.dtype)
    projs = eye - directions[:, :, None] * directions[:, None, :]

    w = weights[:, None, None] if weights is not None else 1.0
    r_mat = jnp.sum(projs * w, axis=0)
    q = jnp.sum((projs @ points[:, :, None]) * w, axis=0)

    solution = jnp.linalg.solve(r_mat, q)[:, 0]
    singular = jnp.linalg.det(r_mat) < 1e-7
    return jnp.where(singular, jnp.nan, solution)


def make_rotation_mat(direction: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """Look-at rotation with rows [x; y; direction]
    (reference pose_geometry.py:175-196)."""
    xaxis = jnp.cross(up, direction)
    xaxis = xaxis / jnp.linalg.norm(xaxis, axis=-1, keepdims=True)
    yaxis = jnp.cross(direction, xaxis)
    yaxis = yaxis / jnp.linalg.norm(yaxis, axis=-1, keepdims=True)
    return jnp.stack([xaxis, yaxis, direction], axis=-2)


def exclude_negatives(camera_optical_center: jnp.ndarray,
                      sample_points: jnp.ndarray,
                      dirs: jnp.ndarray) -> jnp.ndarray:
    """True where a ray points toward the camera center
    (reference pose_geometry.py:199-204)."""
    v = camera_optical_center[None] - sample_points
    return jnp.sum(v * dirs, axis=-1) > 0


def compute_translation_error(t1: jnp.ndarray, t2: jnp.ndarray):
    """(reference errors.py:3-4)"""
    return jnp.linalg.norm(t1 - t2)


def compute_angular_error(rotation_gt: jnp.ndarray,
                          rotation_est: jnp.ndarray):
    """Geodesic angle in degrees via the trace formula
    (reference errors.py:7-9)."""
    cos_angle = (
        jnp.trace(rotation_gt @ jnp.linalg.inv(rotation_est)) - 1.0
    ) / 2.0
    return jnp.degrees(jnp.arccos(jnp.clip(cos_angle, -1.0, 1.0)))
