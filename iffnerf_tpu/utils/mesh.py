"""Mesh export from the dense alpha field (reference utils.py:168-228,
train.py:39-49: marching cubes over dense alpha -> PLY).

The triangulation runs in the native C++ extension (iffnerf_tpu/native) —
the reference leans on scikit-image's compiled marching_cubes; ours is a
ctypes-loaded C++ kernel. Falls back to skimage when the extension isn't
built and skimage exists.
"""

from __future__ import annotations

import numpy as np


def write_ply(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    """Minimal binary-little-endian PLY writer (replaces plyfile)."""
    verts = np.asarray(verts, dtype=np.float32)
    faces = np.asarray(faces, dtype=np.int32)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(verts)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        f"element face {len(faces)}\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(verts.astype("<f4").tobytes())
        counts = np.full((len(faces), 1), 3, dtype=np.uint8)
        body = np.concatenate(
            [counts.view(np.uint8),
             faces.astype("<i4").view(np.uint8).reshape(len(faces), -1)],
            axis=1,
        )
        f.write(body.tobytes())


def marching_cubes(volume: np.ndarray, level: float):
    """Triangulate the ``level`` isosurface of ``volume`` [X, Y, Z].
    Returns (verts [V, 3] in index coords, faces [F, 3])."""
    try:
        from iffnerf_tpu.native import marching_cubes_native

        return marching_cubes_native(volume, level)
    except (ImportError, OSError):
        pass
    try:
        from skimage import measure  # pragma: no cover - env dependent

        verts, faces, _, _ = measure.marching_cubes(volume, level)
        return verts, faces
    except ImportError as e:
        raise RuntimeError(
            "marching cubes requires the native extension (run "
            "`python -m iffnerf_tpu.native.build`) or scikit-image"
        ) from e


def export_mesh_from_field(config, params, mask, path: str,
                           level: float = 0.005, grid_size=None) -> None:
    """Dense alpha -> marching cubes -> PLY in world coordinates
    (reference train.py:39-49 + utils.convert_sdf_samples_to_ply)."""
    from iffnerf_tpu.models.field import get_dense_alpha

    alpha, _ = get_dense_alpha(config, params, mask, grid_size)
    alpha = np.asarray(alpha)
    verts, faces = marching_cubes(alpha, level)
    aabb = config.aabb_np
    scale = (aabb[1] - aabb[0]) / (np.asarray(alpha.shape) - 1.0)
    verts_world = verts * scale + aabb[0]
    write_ply(path, verts_world, faces)
