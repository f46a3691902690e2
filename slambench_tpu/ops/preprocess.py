"""Depth preprocessing: mm->m conversion/downsample, bilateral filter,
robust half-sampling for the ICP pyramid.

TPU-native equivalents of the reference preprocessing kernels
(reference: kfusion/src/cpp/kernels.cpp:159-198, 562-589, 591-626). All are
expressed as statically-unrolled shifted-window reductions — XLA fuses the
25 (bilateral) / 4 (half-sample) taps into a single VPU loop over the
image; there is no data-dependent control flow.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from slambench_tpu import params


def make_gaussian(delta: float = params.DELTA,
                  radius: int = params.RADIUS) -> np.ndarray:
    """Spatial gaussian LUT of the bilateral filter.

    Reference: cpp/kernels.cpp:100-108 — note the reference hard-codes
    ``x = i - 2`` (i.e. ``i - radius`` for the default radius); we use
    ``i - radius`` which is identical for the shipped radius=2.
    """
    i = np.arange(2 * radius + 1, dtype=np.float32)
    x = i - radius
    return np.exp(-(x * x) / (2.0 * delta * delta)).astype(np.float32)


def mm2meters(depth_mm: jax.Array, ratio: int) -> jax.Array:
    """uint16 millimetre depth -> float32 metres, integer downsample.

    Reference: cpp/kernels.cpp:562-589 ``mm2metersKernel`` — pure strided
    subsampling (no averaging): ``out[x, y] = in[x*ratio, y*ratio] / 1000``.
    """
    sub = depth_mm[::ratio, ::ratio]
    return sub.astype(jnp.float32) / 1000.0


def _uintwrap_clamp(idx: jax.Array, size: int) -> jax.Array:
    """The reference's uint clamp: ``clamp(uint(x + i), 0u, size - 1)``.

    In C++ a negative ``x + i`` wraps to a huge unsigned value and clamps to
    ``size - 1`` — so out-of-range-left indices read the RIGHT edge
    (reference: cpp/kernels.cpp:181-182 with cutil_math.h uint clamp). We
    reproduce this exactly for buffer-level parity with the oracle.
    """
    return jnp.where(idx < 0, size - 1, jnp.minimum(idx, size - 1))


def bilateral_filter(depth: jax.Array,
                     gaussian: jax.Array,
                     e_d: float = params.E_DELTA,
                     r: int = params.RADIUS) -> jax.Array:
    """5x5 gaussian-space x gaussian-range bilateral filter of depth.

    Reference: cpp/kernels.cpp:159-198 ``bilateralFilterKernel``. Zero-depth
    pixels pass through as zero; neighbours with non-positive depth are
    excluded from the window sum.
    """
    H, W = depth.shape
    e_d_squared_2 = e_d * e_d * 2.0

    ys = jnp.arange(H, dtype=jnp.int32)[:, None]
    xs = jnp.arange(W, dtype=jnp.int32)[None, :]

    t = jnp.zeros_like(depth)
    s = jnp.zeros_like(depth)
    center = depth
    for j in range(-r, r + 1):       # y offset (reference j indexes gaussian[j+r] over y)
        yi = _uintwrap_clamp(ys + j, H)
        for i in range(-r, r + 1):   # x offset
            xi = _uintwrap_clamp(xs + i, W)
            cur = depth[yi, xi]
            mod = (cur - center) ** 2
            factor = (gaussian[i + r] * gaussian[j + r]
                      * jnp.exp(-mod / e_d_squared_2))
            valid = cur > 0
            t = t + jnp.where(valid, factor * cur, 0.0)
            s = s + jnp.where(valid, factor, 0.0)

    out = t / s
    return jnp.where(center == 0.0, 0.0, out)


def half_sample_robust(depth: jax.Array,
                       e_d: float,
                       r: int = 1) -> jax.Array:
    """Edge-preserving 2x downsample building the ICP pyramid.

    Reference: cpp/kernels.cpp:591-626 ``halfSampleRobustImageKernel``: for
    each output pixel, average the input pixels in the ``[-r+1, r]`` square
    around ``2*(x, y)`` whose value is within ``e_d`` of the centre value.
    With the shipped r=1 this is the 2x2 block {0,1}^2. Indices clamp (int
    clamp, no uint wrap here) to ``2*outSize - 1``.
    """
    H, W = depth.shape
    oh, ow = H // 2, W // 2
    ys = 2 * jnp.arange(oh, dtype=jnp.int32)[:, None]
    xs = 2 * jnp.arange(ow, dtype=jnp.int32)[None, :]
    center = depth[ys, xs]

    t = jnp.zeros((oh, ow), depth.dtype)
    s = jnp.zeros((oh, ow), depth.dtype)
    for i in range(-r + 1, r + 1):   # y offset
        yi = jnp.clip(ys + i, 0, 2 * oh - 1)
        for j in range(-r + 1, r + 1):  # x offset
            xi = jnp.clip(xs + j, 0, 2 * ow - 1)
            cur = depth[yi, xi]
            ok = jnp.abs(cur - center) < e_d
            t = t + jnp.where(ok, cur, 0.0)
            s = s + jnp.where(ok, 1.0, 0.0)
    return t / s
