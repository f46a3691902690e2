"""TSDF volume: fixed-point int16 storage, trilinear interpolation and
central-difference gradient.

TPU-native equivalent of the reference ``Volume`` struct
(reference: kfusion/include/commons.h:149-315). Storage is two int16
arrays ``tsdf[z, y, x]`` (value * 32766, truncated toward zero like the C
float->short cast) and ``weight[z, y, x]``; voxel (x, y, z) of the
reference's x-fastest linear layout maps to ``[z, y, x]`` so the memory
order is identical. ``dim`` (metres) and the grid shape are static.

All samplers clamp indices into range (replicate border), matching the
reference's ``lower = max(base, 0)`` / ``upper = min(base+1, size-1)``
(reference: commons.h:198-200) — with the one deliberate fix that indices
are clamped from above too (the reference reads out of bounds for points
beyond the +face; rays never legitimately sample there).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from slambench_tpu import params

Shape3 = Tuple[int, int, int]   # (sx, sy, sz) — reference size order
Dim3 = Tuple[float, float, float]


def init_volume(resolution: Shape3) -> Tuple[jax.Array, jax.Array]:
    """Fresh TSDF: value 1.0 (stored 32766), weight 0.

    Reference: cpp/kernels.cpp:147-157 ``initVolumeKernel``.
    """
    sx, sy, sz = resolution
    tsdf = jnp.full((sz, sy, sx), 32766, jnp.int16)
    # Weights are capped at maxweight=100 (reference:
    # constant_parameters.h:20), so int8 holds them exactly — one less
    # 33 MB stream through HBM per integrated frame than the reference's
    # short2 layout.
    weight = jnp.zeros((sz, sy, sx), jnp.int8)
    return tsdf, weight


def pack_tsdf(value: jax.Array) -> jax.Array:
    """float TSDF in [-1, 1] -> int16, truncating toward zero like the C
    cast in ``make_short2(d.x * 32766.0f, ...)``
    (reference: commons.h:178-179)."""
    return (value * params.TSDF_SCALE).astype(jnp.int16)


def voxel_centers_axis(size: int, dim: float) -> jax.Array:
    """World coordinate of voxel centres along one axis:
    ``(i + 0.5) * dim / size`` (reference: commons.h:186-189 ``pos``)."""
    return ((jnp.arange(size, dtype=jnp.float32) + 0.5) * (dim / size))


def take_flat(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather ``table[idx]`` from a 1-D table of PRE-CLAMPED indices.

    ``promise_in_bounds`` matters enormously on TPU: the default
    clip-mode gather lowers to a pathologically slow path for some index
    shapes (measured up to ~1000x slower, see PROFILE.md); every caller
    here clamps its indices first, so the promise is free.

    The index array must be >= 2-D: 1-D index arrays trigger another
    pathological lowering (measured 27,424 ns/elem vs ~33 for 2-D/3-D
    shapes of the same size — tools/gather_probe.py, PROFILE.md §3).
    """
    assert idx.ndim != 1 or idx.size <= 4096, (
        "1-D gather indices lower ~1000x slower on TPU; reshape to "
        f"[rows, 128] first (got {idx.shape})")
    return table.at[idx].get(mode="promise_in_bounds")


def _vs(tsdf: jax.Array, x: jax.Array, y: jax.Array, z: jax.Array) -> jax.Array:
    """Raw short value at integer voxel coords (already in range).

    Reference: commons.h:172-174 ``vs2`` — returns the stored short as
    float, without the 1/32766 scale.
    """
    sz, sy, sx = tsdf.shape
    flat = (z * sy + y) * sx + x
    return take_flat(tsdf.reshape(-1), flat).astype(jnp.float32)


def _vs_many(tsdf: jax.Array, coords) -> list:
    """The values of MANY lattice points fetched with ONE gather op.

    ``coords`` is a sequence of (x, y, z) integer index arrays (all the
    same shape); returns the corresponding float values in order. At the
    raycast's 77k-ray population a gather is per-OP-cost dominated on
    TPU (~17-22 ms standalone, ~0.5 ms in-jit, vs ~0.4 ms of element
    cost — PROFILE.md §3), so stacking k lookups into one [k, ...]-index
    gather costs ~1/k of k separate gathers. Values are identical to k
    ``_vs`` calls (same gather semantics), keeping callers bit-exact.
    """
    sz, sy, sx = tsdf.shape
    flat = jnp.stack([(z * sy + y) * sx + x for x, y, z in coords])
    k = flat.shape[0]
    if flat.ndim == 1:                      # scalar-position callers
        vals = take_flat(tsdf.reshape(-1), flat.reshape(k, 1)).reshape(k)
    else:
        vals = take_flat(tsdf.reshape(-1), flat)
    return [vals[i].astype(jnp.float32) for i in range(k)]


def interp(tsdf: jax.Array, dim: Dim3, pos: jax.Array) -> jax.Array:
    """Trilinear TSDF interpolation at world positions ``pos`` ([3, ...]).

    Reference: commons.h:191-213 ``Volume::interp`` — voxel-centre offset
    of 0.5, border replication, result scaled by 1/32766.
    """
    sz, sy, sx = tsdf.shape
    size = jnp.array([sx, sy, sz], jnp.float32).reshape(3, *([1] * (pos.ndim - 1)))
    dim_a = jnp.array(dim, jnp.float32).reshape(3, *([1] * (pos.ndim - 1)))

    scaled = pos * size / dim_a - 0.5
    base = jnp.floor(scaled)
    factor = scaled - base
    base = base.astype(jnp.int32)

    limit = jnp.array([sx - 1, sy - 1, sz - 1], jnp.int32).reshape(
        3, *([1] * (pos.ndim - 1)))
    lower = jnp.clip(base, 0, limit)
    upper = jnp.clip(base + 1, 0, limit)

    lx, ly, lz = lower[0], lower[1], lower[2]
    ux, uy, uz = upper[0], upper[1], upper[2]
    fx, fy, fz = factor[0], factor[1], factor[2]

    # All 8 corners in ONE gather op (per-op-cost dominated at image
    # populations — see _vs_many); values bit-identical to 8 _vs calls.
    (c000, c100, c010, c110, c001, c101, c011, c111) = _vs_many(
        tsdf, [(lx, ly, lz), (ux, ly, lz), (lx, uy, lz), (ux, uy, lz),
               (lx, ly, uz), (ux, ly, uz), (lx, uy, uz), (ux, uy, uz)])

    v = (((c000 * (1 - fx) + c100 * fx) * (1 - fy)
          + (c010 * (1 - fx) + c110 * fx) * fy) * (1 - fz)
         + ((c001 * (1 - fx) + c101 * fx) * (1 - fy)
            + (c011 * (1 - fx) + c111 * fx) * fy) * fz)
    return v * params.TSDF_INV_SCALE


def grad(tsdf: jax.Array, dim: Dim3, pos: jax.Array) -> jax.Array:
    """Central-difference TSDF gradient at world positions ``pos``.

    Reference: commons.h:215-301 ``Volume::grad`` — trilinear interpolation
    of one-voxel central differences, scaled by ``dim/size * 0.5/32766``.
    """
    sz, sy, sx = tsdf.shape
    nd = pos.ndim - 1
    size = jnp.array([sx, sy, sz], jnp.float32).reshape(3, *([1] * nd))
    dim_a = jnp.array(dim, jnp.float32).reshape(3, *([1] * nd))
    limit = jnp.array([sx - 1, sy - 1, sz - 1], jnp.int32).reshape(3, *([1] * nd))

    scaled = pos * size / dim_a - 0.5
    base = jnp.floor(scaled)
    factor = scaled - base
    base = base.astype(jnp.int32)

    ll = jnp.clip(base - 1, 0, limit)   # lower_lower
    lo = jnp.clip(base, 0, limit)       # lower (= lower_upper)
    up = jnp.clip(base + 1, 0, limit)   # upper (= upper_lower)
    uu = jnp.clip(base + 2, 0, limit)   # upper_upper

    fx, fy, fz = factor[0], factor[1], factor[2]

    def trilerp(sample):
        """Trilinearly blend sample(xsel, ysel, zsel) over the 2^3 corner
        choices, where sel picks lower (0) / upper (1) per axis."""
        c000 = sample(0, 0, 0)
        c100 = sample(1, 0, 0)
        c010 = sample(0, 1, 0)
        c110 = sample(1, 1, 0)
        c001 = sample(0, 0, 1)
        c101 = sample(1, 0, 1)
        c011 = sample(0, 1, 1)
        c111 = sample(1, 1, 1)
        return (((c000 * (1 - fx) + c100 * fx) * (1 - fy)
                 + (c010 * (1 - fx) + c110 * fx) * fy) * (1 - fz)
                + ((c001 * (1 - fx) + c101 * fx) * (1 - fy)
                   + (c011 * (1 - fx) + c111 * fx) * fy) * fz)

    xs = (lo[0], up[0])
    ys = (lo[1], up[1])
    zs = (lo[2], up[2])

    # The 48 central-difference endpoints touch only 32 distinct lattice
    # points (the 2x2x2 core appears in all three axis stencils); fetch
    # each point exactly once — values and blend arithmetic match the
    # naive 48-gather form bit-for-bit (reference: commons.h:215-301),
    # at 2/3 the gather traffic (gathers price the raycast, PROFILE.md).
    sel3 = [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]
    coords = (
        [(xs[i], ys[j], zs[k]) for i, j, k in sel3]
        + [((ll[0], uu[0])[a], ys[j], zs[k]) for a, j, k in sel3]
        + [(xs[i], (ll[1], uu[1])[b], zs[k]) for i, b, k in sel3]
        + [(xs[i], ys[j], (ll[2], uu[2])[c]) for i, j, c in sel3])
    vals = _vs_many(tsdf, coords)           # one 32-point gather op
    C = {k: vals[n] for n, k in enumerate(sel3)}
    XW = {k: vals[8 + n] for n, k in enumerate(sel3)}
    YW = {k: vals[16 + n] for n, k in enumerate(sel3)}
    ZW = {k: vals[24 + n] for n, k in enumerate(sel3)}

    gx = trilerp(lambda i, j, k: (C[1, j, k] - XW[0, j, k]) if i == 0
                 else (XW[1, j, k] - C[0, j, k]))
    gy = trilerp(lambda i, j, k: (C[i, 1, k] - YW[i, 0, k]) if j == 0
                 else (YW[i, 1, k] - C[i, 0, k]))
    gz = trilerp(lambda i, j, k: (C[i, j, 1] - ZW[i, j, 0]) if k == 0
                 else (ZW[i, j, 1] - C[i, j, 0]))

    g = jnp.stack([gx, gy, gz])
    scale = dim_a / size * (0.5 * params.TSDF_INV_SCALE)
    return g * scale
