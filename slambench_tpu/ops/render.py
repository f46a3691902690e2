"""Diagnostic render kernels: depth colormap, ICP-result colors, shaded
volume raycast, normal visualisation.

TPU-native equivalents of the reference render kernels
(reference: kfusion/src/cpp/kernels.cpp:794-913) and the ``gs2rgb``
rainbow colormap (reference: kfusion/include/commons.h:86-147). Outputs
are uint8 RGBA images [H, W, 4] with a zero alpha/padding byte, matching
the reference's ``uchar4`` buffers.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from slambench_tpu import params
from slambench_tpu.geometry import dot3, length3, normalize3
from slambench_tpu.ops.raycast import raycast
from slambench_tpu.volume import Dim3, grad


def _gs2rgb(h: jax.Array) -> jax.Array:
    """Rainbow colormap, h in [0, 1] -> float r, g, b channels stacked
    [3, ...] (reference: commons.h:86-147)."""
    v = 0.75
    m = 0.25
    sv = 0.6667
    h6 = h * 6.0
    sextant = jnp.floor(h6)
    fract = h6 - sextant
    vsf = v * sv * fract
    mid1 = m + vsf
    mid2 = v - vsf
    sx = sextant.astype(jnp.int32)

    vv = jnp.full_like(h, v)
    mm = jnp.full_like(h, m)
    zz = jnp.zeros_like(h)

    r = jnp.select([sx == 0, sx == 1, sx == 2, sx == 3, sx == 4, sx == 5],
                   [vv, mid2, mm, mm, mid1, vv], zz)
    g = jnp.select([sx == 0, sx == 1, sx == 2, sx == 3, sx == 4, sx == 5],
                   [mid1, vv, vv, mid2, mm, mm], zz)
    b = jnp.select([sx == 0, sx == 1, sx == 2, sx == 3, sx == 4, sx == 5],
                   [mm, mm, mid1, vv, vv, mid2], zz)
    return jnp.stack([r, g, b])


def _pack_rgba(r: jax.Array, g: jax.Array, b: jax.Array) -> jax.Array:
    """Stack float [0,255] channels into a uint8 RGBA image (alpha 0)."""
    a = jnp.zeros_like(r)
    return jnp.stack([r, g, b, a], axis=-1).astype(jnp.uint8)


def render_depth(depth: jax.Array,
                 near_plane: float = params.NEAR_PLANE,
                 far_plane: float = params.FAR_PLANE) -> jax.Array:
    """Depth -> rainbow RGBA; white below near plane, black beyond far.

    Reference: cpp/kernels.cpp:814-842 ``renderDepthKernel``.
    """
    range_scale = 1.0 / (far_plane - near_plane)
    d = (depth - near_plane) * range_scale
    rgb = _gs2rgb(d) * 255.0
    r, g, b = rgb[0], rgb[1], rgb[2]
    white = jnp.full_like(r, 255.0)
    black = jnp.zeros_like(r)
    is_near = depth < near_plane
    is_far = depth > far_plane
    r = jnp.where(is_near, white, jnp.where(is_far, black, r))
    g = jnp.where(is_near, white, jnp.where(is_far, black, g))
    b = jnp.where(is_near, white, jnp.where(is_far, black, b))
    return _pack_rgba(r, g, b)


# ICP diagnostic palette (reference: cpp/kernels.cpp:853-874).
# Plain numpy at module scope: a module-level jnp.array would initialize
# the JAX backend at import time, silently defeating any later
# SLAMBENCH_PLATFORM selection (utils/backend.select_backend must run
# before backend init).
import numpy as _np

_TRACK_COLORS = _np.array([
    [255, 128, 128, 0],   # default
    [128, 128, 128, 0],   # 1: tracked, grey
    [0, 0, 0, 0],         # -1: no input, black
    [255, 0, 0, 0],       # -2: not in image, red
    [0, 255, 0, 0],       # -3: no correspondence, green
    [0, 0, 255, 0],       # -4: too far, blue
    [255, 255, 0, 0],     # -5: wrong normal, yellow
], dtype=_np.uint8)


def render_track(result: jax.Array) -> jax.Array:
    """ICP result-code image (reference: cpp/kernels.cpp:844-878)."""
    idx = jnp.select(
        [result == 1, result == -1, result == -2,
         result == -3, result == -4, result == -5],
        [1, 2, 3, 4, 5, 6], 0)
    return jnp.asarray(_TRACK_COLORS)[idx]


def render_volume(tsdf: jax.Array,
                  dim: Dim3,
                  view: jax.Array,
                  image_size: Tuple[int, int],
                  near_plane: float = params.NEAR_PLANE,
                  far_plane: float = params.FAR_PLANE,
                  step: float = 0.0078125,
                  large_step: float = 0.075,
                  light: Tuple[float, float, float] = params.LIGHT,
                  ambient: Tuple[float, float, float] = params.AMBIENT,
                  mip: jax.Array | None = None,
                  ) -> jax.Array:
    """Raycast from an arbitrary viewpoint with diffuse shading.

    Reference: cpp/kernels.cpp:880-913 ``renderVolumeKernel``.

    ``mip`` (optional): a :func:`make_min_mip` table for ``tsdf``. When
    given, the march uses the chebyshev-skip fast raycast (the fast/
    pallas production tiers, hit-position-compatible per the fast-vs-
    oracle parity tests) instead of the reference-exact oracle march —
    ~5-8x fewer volume gathers on render frames. Omit it for the jnp
    oracle tier (reference-exact sampling).
    """
    if mip is not None:
        from slambench_tpu.ops.raycast_fast import raycast_fast
        hit_pos, t_hit = raycast_fast(tsdf, mip, dim, view, image_size,
                                      near_plane, far_plane, step,
                                      large_step)
    else:
        hit_pos, t_hit = raycast(tsdf, dim, view, image_size,
                                 near_plane, far_plane, step, large_step)
    g = grad(tsdf, dim, hit_pos)
    glen = length3(g)
    light_a = jnp.array(light, jnp.float32).reshape(3, 1, 1)
    ambient_a = jnp.array(ambient, jnp.float32).reshape(3, 1, 1)

    diff_dir = normalize3(light_a - hit_pos)
    dir_term = jnp.maximum(dot3(normalize3(g), diff_dir), 0.0)
    col = jnp.clip(dir_term[None] + ambient_a, 0.0, 1.0) * 255.0

    shade = (t_hit > 0) & (glen > 0)
    col = jnp.where(shade[None], col, 0.0)
    return _pack_rgba(col[0], col[1], col[2])


def render_normal(normal: jax.Array) -> jax.Array:
    """Normals -> RGB (reference: cpp/kernels.cpp:794-812
    ``renderNormalKernel``; uchar3 in the reference, padded here)."""
    n = normalize3(normal)
    invalid = normal[0] == params.INVALID
    r = jnp.where(invalid, 0.0, n[0] * 128.0 + 128.0)
    g = jnp.where(invalid, 0.0, n[1] * 128.0 + 128.0)
    b = jnp.where(invalid, 0.0, n[2] * 128.0 + 128.0)
    return _pack_rgba(r, g, b)
