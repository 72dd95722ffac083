"""Closed-form pose geometry: weighted least-squares ray intersection,
look-at rotation, pose error metrics
(reference pose_estimation/pose_geometry.py:42-204, errors.py:3-9).

All functions are jnp + jit-safe: the reference's NaN early-returns become
``where`` guards so the whole pose solve can live inside one XLA program
(SURVEY.md §7 "one jit-compiled pose graph").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cross_product_system(points, directions, weights=None):
    """Shared A/b construction for the cross-product solvers
    (reference pose_geometry.py:4-21,148-166): each consecutive ray pair
    contributes the row cross(dᵢ, dᵢ₊₁) with rhs pᵢ₊₁·row.

    The reference then drops "parallel" rows by boolean indexing; under XLA
    we keep static shapes and zero those rows instead — zero rows leave the
    least-squares normal equations AᵀA, Aᵀb unchanged, so this is exact.
    (The reference's parallel test omits abs() and so also drops rows with
    large negative components; we implement the intended |cross| < 1e-7.)
    """
    cross = jnp.cross(directions[:-1], directions[1:])
    a_mat = cross
    b = jnp.sum(points[1:] * cross, axis=-1)
    if weights is not None:
        a_mat = a_mat * weights[1:, None]
        b = b * weights[1:]
    keep = ~jnp.all(jnp.abs(cross) < 1e-7, axis=-1)
    return a_mat * keep[:, None], b * keep


def det3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 determinant (scalar triple product of the rows).

    ``jnp.linalg.solve``/``inv`` on a 3x3 lower to general LU custom
    calls; the cross-product closed forms are fusable elementwise ops
    instead — equal to LU in exact arithmetic, ~1e-7 relative fp
    difference for the well-conditioned systems the singularity guards
    admit. Honest perf note: swapping them into the pose solve measured
    NEUTRAL on v5e (stage i 0.67 -> 0.70 ms, relay noise band) — the
    solve is bound by its ~54 back-to-back tiny-kernel launches
    (~0.24 ms total, /tmp probe round 5), not by any single op. Kept for
    the simpler lowering (12 fewer custom calls in the estimate)."""
    return jnp.sum(m[0] * jnp.cross(m[1], m[2]))


def inv3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 inverse: M^-T rows are the cross products of M's
    rows over det (see det3 for why not jnp.linalg.inv)."""
    c0 = jnp.cross(m[1], m[2])
    c1 = jnp.cross(m[2], m[0])
    c2 = jnp.cross(m[0], m[1])
    det = jnp.sum(m[0] * c0)
    return jnp.stack([c0, c1, c2], axis=-1) / det


def solve3(m: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 linear solve (see det3 for why not
    jnp.linalg.solve). ``b`` is [3] or [3, k]."""
    return inv3(m) @ b


def compute_line_intersection(points: jnp.ndarray,
                              directions: jnp.ndarray,
                              weights: jnp.ndarray | None = None):
    """Cross-product LSQ intersection (reference pose_geometry.py:4-39):
    A = cross(dᵢ, dᵢ₊₁), b = pᵢ₊₁·Aᵢ, lstsq(A, b). The reference replaces a
    NaN solution with ones; kept for behavioral parity."""
    a_mat, b = _cross_product_system(points, directions, weights)
    solution = jnp.linalg.lstsq(a_mat, b)[0]
    return jnp.where(jnp.any(jnp.isnan(solution)),
                     jnp.ones_like(solution), solution)


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

    solution = solve3(r_mat, q)[:, 0]
    singular = det3(r_mat) < 1e-7
    return jnp.where(singular, jnp.nan, solution)


def compute_line_intersection_impl3(points: jnp.ndarray,
                                    directions: jnp.ndarray,
                                    weights: jnp.ndarray | None = None):
    """Same normal equations as impl2 but the weights multiply BOTH the
    projector sum and the rhs, and the 3x3 system is solved with lstsq
    (pseudo-inverse) instead of an exact solve — so a singular projector sum
    yields the minimum-norm solution rather than NaN
    (reference pose_geometry.py:98-126)."""
    eye = jnp.eye(3, dtype=points.dtype)
    projs = eye - directions[:, :, None] * directions[:, None, :]
    b = projs @ points[:, :, None]
    if weights is not None:
        projs = projs * weights[:, None, None]
        b = b * weights[:, None, None]
    solution = jnp.linalg.lstsq(projs.sum(axis=0), b.sum(axis=0))[0]
    return solution[:, 0]


def _irls(y: jnp.ndarray, x_mat: jnp.ndarray, maxiter: int,
          w_init: float = 1.0, d: float = 1e-4,
          tolerance: float = 1e-3) -> jnp.ndarray:
    """Iteratively-reweighted least squares with an L1 (1/residual) weight
    update (reference pose_geometry.py:129-145). The reference's
    data-dependent early exit becomes a `lax.while_loop` condition so the
    whole solver stays one XLA program with static shapes."""
    w0 = jnp.full((y.shape[0],), w_init, dtype=x_mat.dtype)

    def weighted_solve(w):
        xtw = x_mat.T * w[None, :]
        return jnp.linalg.lstsq(xtw @ x_mat, xtw @ y)[0]

    def cond(state):
        i, _, tol = state
        return (i < maxiter) & (tol >= tolerance)

    def body(state):
        i, beta, _ = state
        resid = jnp.abs(y - x_mat @ beta)
        w = 1.0 / jnp.maximum(d, resid)
        new_beta = weighted_solve(w)
        return i + 1, new_beta, jnp.sum(jnp.abs(new_beta - beta))

    init = (jnp.int32(0), weighted_solve(w0), jnp.asarray(jnp.inf, x_mat.dtype))
    return jax.lax.while_loop(cond, body, init)[1]


def compute_line_intersection_impl4(points: jnp.ndarray,
                                    directions: jnp.ndarray,
                                    weights: jnp.ndarray | None = None):
    """Robust (IRLS) variant of the cross-product solver
    (reference pose_geometry.py:148-171): downweights outlier rays by
    1/|residual| over up to 100 reweighting rounds."""
    a_mat, b = _cross_product_system(points, directions, weights)
    return _irls(b, a_mat, maxiter=100)


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
