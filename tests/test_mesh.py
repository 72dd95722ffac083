"""Native marching-cubes + PLY export tests (reference utils.py:168-228)."""

import os

import numpy as np
import pytest

from iffnerf_tpu.native import marching_cubes_native
from iffnerf_tpu.utils.mesh import write_ply, marching_cubes


def _sphere_volume(n=40, r=0.6):
    x, y, z = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing="ij")
    return (r - np.sqrt(x ** 2 + y ** 2 + z ** 2)).astype(np.float32)


def test_marching_cubes_sphere_topology():
    n = 40
    verts, faces = marching_cubes_native(_sphere_volume(n), 0.0)
    assert len(verts) > 100 and len(faces) > 100
    w = verts / (n - 1) * 2 - 1
    radius = np.linalg.norm(w, axis=-1)
    np.testing.assert_allclose(radius.mean(), 0.6, atol=0.01)
    assert radius.std() < 0.01
    # watertight sphere: V - E + F == 2
    edges = set()
    for f in faces:
        for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            edges.add((min(a, b), max(a, b)))
    assert len(verts) - len(edges) + len(faces) == 2


def test_ply_roundtrip(tmp_path):
    verts, faces = marching_cubes(_sphere_volume(16), 0.0)
    path = os.path.join(tmp_path, "sphere.ply")
    write_ply(path, verts, faces)
    raw = open(path, "rb").read()
    header_end = raw.index(b"end_header\n") + len(b"end_header\n")
    header = raw[:header_end].decode()
    assert f"element vertex {len(verts)}" in header
    assert f"element face {len(faces)}" in header
    body = raw[header_end:]
    got_verts = np.frombuffer(
        body[: len(verts) * 12], dtype="<f4"
    ).reshape(-1, 3)
    np.testing.assert_allclose(got_verts, verts, rtol=1e-6)


def test_empty_level():
    verts, faces = marching_cubes_native(_sphere_volume(16), 10.0)
    assert len(verts) == 0 and len(faces) == 0
