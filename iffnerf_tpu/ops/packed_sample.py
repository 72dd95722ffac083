"""Footprint-packed grid sampling — the TPU-native grid_sample fast path.

TPU gathers are row-rate bound (~7 ns per gathered row regardless of row
width up to ~128 lanes; measured on v5e). The naive bilinear plane sample
costs 4 gathered rows per (plane, sample) and the reference's VM field needs
3 density planes + 3 app planes + 6 line lookups = 36 rows per sample —
~400 ms per 4096x443-sample forward.

The packed layout stores, at each texel, the channels of its entire
interpolation footprint:

  * planes: [H, W, C] -> [H*W, 4C] rows holding the (y,x), (y,x+1),
    (y+1,x), (y+1,x+1) texels (edge-clamped), so one gathered row serves the
    whole bilerp;
  * lines:  [L, C] -> [L, 2C] rows holding (z, z+1);
  * volumes (alpha mask): [D, H, W] -> [D*H*W, 8] trilinear footprints.

Density and appearance channels are concatenated before packing, so a full
VM field evaluation is 3 plane rows + 3 line rows per sample — a 6x row
reduction. Packing is pure shifted-slice concatenation: cheap, jit-inlined,
and differentiable (its transpose is the scatter-add XLA derives
automatically).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# Opt-in reformulation of the gather backward: sort the scatter indices and
# emit a hinted (indices_are_sorted) scatter-add instead of XLA's derived
# unsorted one. OFF by default — measured round 4 (BASELINE.md,
# extra/microbench_scatter_vjp.py): the argsort costs more than the
# unsorted scatter saves at every index distribution tried (16.2 vs
# 0.04-12.3 ms plane, 14.5 vs 6.2-7.3 ms line).
SORTED_SCATTER_GRAD = os.environ.get("IFFNERF_SORTED_SCATTER", "0") == "1"

# Line-table backward as a weighted one-hot matmul (the classic TPU
# scatter-as-matmul): the line tables are tiny (L = grid size, ~300 rows)
# but every row is hit ~k/L times, and XLA's derived scatter-add of k
# update rows runs at ~1/10 the gather rate. Contracting a [k, L] one-hot
# against the [k, 2C] updates moves the accumulation onto the MXU —
# measured 6.2 -> 3.6 ms at k=530k/L=300 (extra/microbench_scatter_vjp.py,
# round 4). Default ON on TPU backends for small L; IFFNERF_LINE_MM_GRAD
# overrides both ways. Gradients match autodiff up to f32 summation order
# (tests/test_line_mm_grad.py).
_LINE_MM_MAX_ROWS = 2048


def _use_line_mm_grad(l: int) -> bool:
    env = os.environ.get("IFFNERF_LINE_MM_GRAD")
    if env is not None:
        return env != "0"
    return l <= _LINE_MM_MAX_ROWS and jax.default_backend() == "tpu"


def _shift(arr: jnp.ndarray, axis: int) -> jnp.ndarray:
    """arr shifted by -1 along axis with edge clamp (x+1 neighbor)."""
    idx = [slice(None)] * arr.ndim
    idx[axis] = slice(1, None)
    shifted = arr[tuple(idx)]
    last = [slice(None)] * arr.ndim
    last[axis] = slice(-1, None)
    return jnp.concatenate([shifted, arr[tuple(last)]], axis=axis)


def pack_plane(plane: jnp.ndarray) -> jnp.ndarray:
    """[H, W, C] -> [H*W, 4C] footprint rows (order: 00, 01, 10, 11)."""
    h, w, c = plane.shape
    p01 = _shift(plane, 1)
    p10 = _shift(plane, 0)
    p11 = _shift(p01, 0)
    return jnp.concatenate([plane, p01, p10, p11], axis=-1).reshape(
        h * w, 4 * c
    )


def pack_line(line: jnp.ndarray) -> jnp.ndarray:
    """[L, C] -> [L, 2C] footprint rows (z, z+1)."""
    return jnp.concatenate([line, _shift(line, 0)], axis=-1)


def pack_volume(volume: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[D, H, W] -> [D*H*W, 8] trilinear footprint rows
    (order: 000, 001, 010, 011, 100, 101, 110, 111 over (z, y, x) shifts)."""
    d, h, w = volume.shape
    v = volume[..., None]
    parts = []
    for dz in (0, 1):
        vz = _shift(v, 0) if dz else v
        for dy in (0, 1):
            vy = _shift(vz, 1) if dy else vz
            for dx in (0, 1):
                parts.append(_shift(vy, 2) if dx else vy)
    return jnp.concatenate(parts, axis=-1).reshape(d * h * w, 8).astype(dtype)


def _shift_k(arr: jnp.ndarray, axis: int, k: int) -> jnp.ndarray:
    """arr shifted by -k along axis with edge clamp (x+k neighbor)."""
    if k == 0:
        return arr
    idx = [slice(None)] * arr.ndim
    idx[axis] = slice(k, None)
    shifted = arr[tuple(idx)]
    last = [slice(None)] * arr.ndim
    last[axis] = slice(-1, None)
    edge = jnp.concatenate([arr[tuple(last)]] * k, axis=axis)
    return jnp.concatenate([shifted, edge], axis=axis)


@functools.partial(jax.jit, static_argnames=("window",))
def pack_volume_bits(volume: jnp.ndarray, window: int = 4) -> jnp.ndarray:
    """[D, H, W] binary -> [D*H*W, L] uint32 neighborhood-bit rows.

    Bit ``(dz*window + dy)*window + dx`` of row ``v`` (lane = idx // 32)
    holds ``volume[v + (dz, dy, dx)] > 0`` (edge-clamped). One gathered row
    then answers the occupancy gate ``trilerp(mask, p) > 0`` for every
    sample whose bilinear footprint lies in the window — a GROUP of
    consecutive ray samples per row (see occupancy_grouped). The row is
    4-16 bytes: gathers are row-rate-bound on TPU, so a bit row costs the
    same as the 8-lane uint8 footprint row but serves ~a handful of
    samples instead of one."""
    d, h, w = volume.shape
    lanes = (window**3 + 31) // 32
    occ = (volume > 0).astype(jnp.uint32)
    out = [jnp.zeros((d, h, w), jnp.uint32) for _ in range(lanes)]
    for dz in range(window):
        vz = _shift_k(occ, 0, dz)
        for dy in range(window):
            vy = _shift_k(vz, 1, dy)
            for dx in range(window):
                vx = _shift_k(vy, 2, dx)
                idx = (dz * window + dy) * window + dx
                out[idx // 32] = out[idx // 32] | (vx << jnp.uint32(idx % 32))
    return jnp.stack(out, axis=-1).reshape(d * h * w, lanes)


def _axis_bits(p, base, size: int, window: int) -> jnp.ndarray:
    """Per-axis window-bit occupancy pattern (uint32).

    Bit j is set iff window texel ``base + j`` receives a strictly positive
    interpolation weight for coordinate ``p`` under zeros padding — i.e.
    j == floor(p) - base (weight 1-frac, always > 0 since frac < 1) or
    j == floor(p)+1 - base with frac > 0; both only when the texel index is
    inside [0, size-1]. This replicates the trilerp > 0 gate exactly,
    including exact-integer coordinates (frac == 0 drops the +1 texel)."""
    i0 = jnp.floor(p).astype(jnp.int32)
    frac = p - i0
    j0 = i0 - base
    j1 = j0 + 1
    in0 = (i0 >= 0) & (i0 <= size - 1) & (j0 >= 0) & (j0 <= window - 1)
    in1 = (
        (i0 + 1 >= 0) & (i0 + 1 <= size - 1) & (frac > 0)
        & (j1 >= 0) & (j1 <= window - 1)
    )
    one = jnp.uint32(1)
    b0 = jnp.left_shift(one, jnp.clip(j0, 0, 31).astype(jnp.uint32))
    b1 = jnp.left_shift(one, jnp.clip(j1, 0, 31).astype(jnp.uint32))
    return jnp.where(in0, b0, 0) | jnp.where(in1, b1, 0)


def _combine_bits(patz, paty, patx, window: int) -> list:
    """Expand per-axis patterns into full window^3-bit lane masks:
    bit (z*window + y)*window + x = patz[z] & paty[y] & patx[x]."""
    lanes = (window**3 + 31) // 32
    out = [jnp.zeros_like(patx) for _ in range(lanes)]
    for z in range(window):
        zbit = (patz >> jnp.uint32(z)) & jnp.uint32(1)
        for y in range(window):
            ybit = (paty >> jnp.uint32(y)) & jnp.uint32(1)
            run = patx * (zbit & ybit)
            idx = (z * window + y) * window
            l0, o0 = idx // 32, idx % 32
            out[l0] = out[l0] | (run << jnp.uint32(o0))
            if o0 + window > 32 and l0 + 1 < lanes:
                out[l0 + 1] = out[l0 + 1] | (run >> jnp.uint32(32 - o0))
    return out


def occupancy_grouped(packed_bits: jnp.ndarray, d: int, h: int, w: int,
                      window: int, coords: jnp.ndarray,
                      group: int = 1) -> jnp.ndarray:
    """Exact ``trilerp(mask, coords) > 0`` gate from neighborhood-bit rows.

    coords [..., S, 3] in [-1, 1] (x, y, z); returns bool [..., S]. Each
    GROUP of ``group`` consecutive samples along axis -2 shares ONE gathered
    row (at the per-axis min floor of the group), dividing the gather count
    — the stage's cost on TPU — by ``group``.

    EXACTNESS REQUIREMENT: the caller guarantees that within a group the
    per-axis pixel-space spread satisfies (group-1) * |delta| <= window - 2
    (see gate_group_for in models/field.py), so every sample's bilinear
    footprint lies inside the window. Out-of-grid samples gate to False,
    matching zeros-padding trilerp. The only deviation from the float
    trilerp is a weight-product underflow to exactly 0.0, which needs a
    coordinate within ~1e-38 of a voxel boundary — unreachable from f32
    pixel coordinates >= 1 (their ULP is ~1e-7)."""
    *lead, s, _ = coords.shape
    pad = (-s) % group
    if pad:
        coords = jnp.concatenate(
            [coords, jnp.repeat(coords[..., -1:, :], pad, axis=-2)], axis=-2
        )
    sg = coords.shape[-2] // group
    c = coords.reshape(tuple(lead) + (sg, group, 3))
    px = _pix(c[..., 0], w)
    py = _pix(c[..., 1], h)
    pz = _pix(c[..., 2], d)

    fx = jnp.floor(px).astype(jnp.int32)
    fy = jnp.floor(py).astype(jnp.int32)
    fz = jnp.floor(pz).astype(jnp.int32)
    bx = jnp.clip(jnp.min(fx, axis=-1), 0, w - 1)   # [..., sg]
    by = jnp.clip(jnp.min(fy, axis=-1), 0, h - 1)
    bz = jnp.clip(jnp.min(fz, axis=-1), 0, d - 1)

    rows = jnp.take(packed_bits, (bz * h + by) * w + bx, axis=0)  # [..., sg, L]

    patx = _axis_bits(px, bx[..., None], w, window)  # [..., sg, group]
    paty = _axis_bits(py, by[..., None], h, window)
    patz = _axis_bits(pz, bz[..., None], d, window)
    lanes = _combine_bits(patz, paty, patx, window)

    hit = jnp.zeros(c.shape[:-1], dtype=jnp.uint32)  # [..., sg, group]
    for li, lane_mask in enumerate(lanes):
        hit = hit | (rows[..., li][..., None] & lane_mask)
    occ = (hit > 0).reshape(tuple(lead) + (sg * group,))
    return occ[..., :s]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gather_contract(packed, idx, weights, c: int):
    """packed[idx] reshaped to [..., K, c], contracted with weights [..., K]
    -> [..., c]. Same value as the inline take+einsum in packed_bilerp /
    packed_lerp; the custom backward sorts the k scatter indices and uses a
    hinted scatter-add (plus a re-gather of the rows instead of saving
    k*K*c residual floats)."""
    kc = weights.shape[-1]
    rows = jnp.take(packed, idx, axis=0)
    corners = rows.reshape(rows.shape[:-1] + (kc, c))
    return jnp.einsum("...kc,...k->...c", corners, weights)


def _gather_contract_fwd(packed, idx, weights, c: int):
    return _gather_contract(packed, idx, weights, c), (packed, idx, weights)


def _gather_contract_bwd(c: int, res, g):
    packed, idx, weights = res
    kc = weights.shape[-1]
    rows = jnp.take(packed, idx, axis=0)  # regather: cheaper than residuals
    corners = rows.reshape(rows.shape[:-1] + (kc, c))
    g_weights = jnp.einsum("...c,...kc->...k", g, corners)
    v = jnp.einsum("...c,...k->...kc", g, weights).reshape(-1, kc * c)
    flat_idx = idx.reshape(-1)
    order = jnp.argsort(flat_idx)
    g_packed = jnp.zeros_like(packed).at[flat_idx[order]].add(
        v[order], indices_are_sorted=True
    )
    g_idx = jnp.zeros(idx.shape, dtype=jax.dtypes.float0)
    return g_packed, g_idx, g_weights


_gather_contract.defvjp(_gather_contract_fwd, _gather_contract_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _lerp_contract_mm(packed, idx, weights, l: int, c: int):
    """packed[idx] [..., 2, c] contracted with weights [..., 2] -> [..., c].
    Same primal as the inline take+einsum in packed_lerp; the custom
    backward replaces XLA's derived scatter-add of the k updates into the
    [l, 2c] table with a weighted one-hot [k, l] matmul on the MXU
    (module docstring: measured 1.7x at lego line shapes)."""
    rows = jnp.take(packed, idx, axis=0)
    corners = rows.reshape(rows.shape[:-1] + (2, c))
    return jnp.einsum("...kc,...k->...c", corners, weights)


def _lerp_contract_mm_fwd(packed, idx, weights, l: int, c: int):
    rows = jnp.take(packed, idx, axis=0)
    corners = rows.reshape(rows.shape[:-1] + (2, c))
    out = jnp.einsum("...kc,...k->...c", corners, weights)
    # save corners (what autodiff would keep for the weight grad): at k
    # rows the re-gather costs ~4x the residual's HBM round trip
    return out, (corners, idx, weights)


def _lerp_contract_mm_bwd(l: int, c: int, res, g):
    corners, idx, weights = res
    g_weights = jnp.einsum("...c,...kc->...k", g, corners)
    gf = g.reshape(-1, c)
    wf = weights.reshape(-1, 2)
    # g_packed[m, j*c + c'] = sum_k 1[idx_k == m] * w[k, j] * g[k, c']
    v = (wf[..., None] * gf[:, None, :]).reshape(-1, 2 * c)
    onehot = (idx.reshape(-1)[:, None]
              == jnp.arange(l, dtype=idx.dtype)[None, :]).astype(gf.dtype)
    g_packed = jnp.einsum("km,kc->mc", onehot, v)
    g_idx = jnp.zeros(idx.shape, dtype=jax.dtypes.float0)
    return g_packed, g_idx, g_weights


_lerp_contract_mm.defvjp(_lerp_contract_mm_fwd, _lerp_contract_mm_bwd)


def _pix(g, size: int):
    return (g + 1.0) * 0.5 * (size - 1)


def _corner_weights(p, size: int):
    """-> (row base index, corner-0 weight, corner-1 weight) implementing
    zeros padding. Packed row ``b`` holds texels (b, b+1); when the true
    floor index is -1 the base clamps to 0 and texel 0's weight must move
    into corner slot 0 (the corner/texel correspondence shifts by one)."""
    i0 = jnp.floor(p).astype(jnp.int32)
    frac = p - i0
    w_texel0 = (1.0 - frac) * ((i0 >= 0) & (i0 <= size - 1))
    w_texel1 = frac * ((i0 + 1 >= 0) & (i0 + 1 <= size - 1))
    shifted = i0 < 0
    w_c0 = jnp.where(shifted, w_texel1, w_texel0)
    w_c1 = jnp.where(shifted, 0.0, w_texel1)
    return jnp.clip(i0, 0, size - 1), w_c0, w_c1


def packed_bilerp(packed: jnp.ndarray, h: int, w: int, c: int,
                  coords: jnp.ndarray) -> jnp.ndarray:
    """One-row bilinear sample with torch grid_sample semantics
    (align_corners=True, zeros padding).

    packed: [H*W, 4C] from pack_plane; coords [..., 2] in [-1, 1] (x, y).
    Returns [..., C]."""
    px = _pix(coords[..., 0], w)
    py = _pix(coords[..., 1], h)
    x0, wx0, wx1 = _corner_weights(px, w)
    y0, wy0, wy1 = _corner_weights(py, h)

    # corner weights kept as a [..., 4] stack and contracted via einsum:
    # trailing-size-1 broadcast temps ([N, 1]) tile to (8, 128) on TPU — a
    # 128x memory expansion when autodiff saves them as residuals.
    weights = jnp.stack(
        [wx0 * wy0, wx1 * wy0, wx0 * wy1, wx1 * wy1], axis=-1
    )
    if SORTED_SCATTER_GRAD:
        return _gather_contract(packed, y0 * w + x0, weights, c)
    rows = jnp.take(packed, y0 * w + x0, axis=0)  # [..., 4C]
    corners = rows.reshape(rows.shape[:-1] + (4, c))
    return jnp.einsum("...kc,...k->...c", corners, weights)


def packed_lerp(packed: jnp.ndarray, l: int, c: int,
                coords: jnp.ndarray) -> jnp.ndarray:
    """One-row linear sample. packed: [L, 2C] from pack_line;
    coords [...] in [-1, 1]. Returns [..., C]."""
    p = _pix(coords, l)
    z0, w0, w1 = _corner_weights(p, l)
    weights = jnp.stack([w0, w1], axis=-1)
    if SORTED_SCATTER_GRAD:
        return _gather_contract(packed, z0, weights, c)
    if _use_line_mm_grad(l):
        return _lerp_contract_mm(packed, z0, weights, l, c)
    rows = jnp.take(packed, z0, axis=0)
    corners = rows.reshape(rows.shape[:-1] + (2, c))
    return jnp.einsum("...kc,...k->...c", corners, weights)


def packed_trilerp(packed: jnp.ndarray, d: int, h: int, w: int,
                   coords: jnp.ndarray) -> jnp.ndarray:
    """One-row trilinear sample of a scalar volume. packed: [D*H*W, 8]
    from pack_volume; coords [..., 3] (x, y, z) in [-1, 1]. Returns [...]."""
    px = _pix(coords[..., 0], w)
    py = _pix(coords[..., 1], h)
    pz = _pix(coords[..., 2], d)
    x0, wx0, wx1 = _corner_weights(px, w)
    y0, wy0, wy1 = _corner_weights(py, h)
    z0, wz0, wz1 = _corner_weights(pz, d)

    rows = jnp.take(packed, (z0 * h + y0) * w + x0, axis=0)  # [..., 8]
    wx = jnp.stack([wx0, wx1], -1)                           # [..., 2]
    wy = jnp.stack([wy0, wy1], -1)
    wz = jnp.stack([wz0, wz1], -1)
    weights = (
        wz[..., :, None, None] * wy[..., None, :, None]
        * wx[..., None, None, :]
    ).reshape(rows.shape)
    return jnp.sum(rows * weights, axis=-1)
