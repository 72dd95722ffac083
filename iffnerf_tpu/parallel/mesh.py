"""Single-axis ICI data mesh: rays are the parallel unit.

The reference's only intra-device parallelism is ray chunking
(renderer.py:12-25) and its only multi-device story is process farming via
CUDA_VISIBLE_DEVICES (extra/auto_run_paramsets.py:160-207). The TPU-native
design shards the ray axis of every batched computation over a 1-D
``Mesh(('data',))``: parameters are replicated (they are small — factor
grids), rays/samples are split, and the loss reduction turns into a psum
XLA inserts automatically under jit. Single-slice first; the mesh
abstraction is general enough for DCN later (SURVEY.md §5).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def get_shard_map():
    """Version-portable ``shard_map``.

    jax >= 0.8 exports ``jax.shard_map`` and renamed the ``check_rep``
    kwarg to ``check_vma``; older versions live in ``jax.experimental``.
    Callers always pass ``check_rep`` and this shim renames it only when
    the resolved function actually wants ``check_vma`` (inspected from the
    signature, so a top-level export that still accepts ``check_rep``
    keeps working)."""
    import inspect

    try:
        from jax import shard_map as _sm  # jax >= 0.8
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as _sm
    try:
        params = inspect.signature(_sm).parameters
        wants_vma = "check_vma" in params and "check_rep" not in params
    except (ValueError, TypeError):  # pragma: no cover - C-level signature
        wants_vma = True

    if not wants_vma:
        return _sm

    def shard_map(f, **kw):
        if "check_rep" in kw:
            kw["check_vma"] = kw.pop("check_rep")
        return _sm(f, **kw)

    return shard_map


def pad_to_multiple(arr, multiple: int, axis: int = 0):
    """Pad ``arr`` along ``axis`` to a multiple; returns (padded, orig_len)."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, rem)
    import jax.numpy as jnp

    return jnp.pad(arr, pad, mode="edge"), n


def shard_rays(mesh: Mesh, rays, axis: str = "data"):
    """Place a [N, C] ray array split along the mesh's data axis; N must be
    divisible by the mesh size (use pad_to_multiple first)."""
    return jax.device_put(rays, NamedSharding(mesh, P(axis)))


def replicate(mesh: Mesh, tree):
    """Replicate a parameter pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def replicate_arrays(mesh: Mesh, tree):
    """Replicate only the array leaves of a pytree (optimizer states mix
    arrays with static leaves that ``device_put`` would needlessly wrap)."""
    import numpy as _np

    sharding = NamedSharding(mesh, P())

    def put(x):
        if isinstance(x, (jax.Array, _np.ndarray)):
            return jax.device_put(x, sharding)
        return x

    return jax.tree.map(put, tree)
