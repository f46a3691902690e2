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


def _shift_uintwrap(img: jax.Array, dy: int, dx: int) -> jax.Array:
    """``out[y, x] = img[clamp(uint(y+dy), H-1), clamp(uint(x+dx), W-1)]``
    with the reference's unsigned-wraparound clamp semantics: in C++ a
    negative ``x + i`` wraps to a huge unsigned value and clamps to
    ``size - 1`` — so out-of-range-LEFT indices read the RIGHT/BOTTOM edge
    (reference: cpp/kernels.cpp:181-182 with cutil_math.h uint clamp).

    Implemented with static slices + edge broadcasts (no gather): XLA
    fuses all 25 bilateral taps into one VPU pass over the image.
    """
    H, W = img.shape

    def shift1(a, d, size, axis):
        if d == 0:
            return a
        edge = jax.lax.slice_in_dim(a, size - 1, size, axis=axis)
        if d > 0:   # sample x+d: clamp to the far edge on the right
            body = jax.lax.slice_in_dim(a, d, size, axis=axis)
            pad = jnp.concatenate([edge] * d, axis=axis)
            return jnp.concatenate([body, pad], axis=axis)
        # d < 0: uint wrap — the first |d| entries read the FAR edge
        body = jax.lax.slice_in_dim(a, 0, size + d, axis=axis)
        pad = jnp.concatenate([edge] * (-d), axis=axis)
        return jnp.concatenate([pad, body], axis=axis)

    return shift1(shift1(img, dx, W, 1), dy, H, 0)


def bilateral_filter(depth: jax.Array,
                     gaussian: jax.Array,
                     e_d: float = params.E_DELTA,
                     r: int = params.RADIUS) -> jax.Array:
    """5x5 gaussian-space x gaussian-range bilateral filter of depth.

    Reference: cpp/kernels.cpp:159-198 ``bilateralFilterKernel``. Zero-depth
    pixels pass through as zero; neighbours with non-positive depth are
    excluded from the window sum. The window is expressed as 25 statically
    shifted image views so no gather is emitted.
    """
    e_d_squared_2 = e_d * e_d * 2.0
    t = jnp.zeros_like(depth)
    s = jnp.zeros_like(depth)
    center = depth
    for j in range(-r, r + 1):       # y offset
        for i in range(-r, r + 1):   # x offset
            cur = _shift_uintwrap(depth, j, i)
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
    center = depth[0:2 * oh:2, 0:2 * ow:2]

    t = jnp.zeros((oh, ow), depth.dtype)
    s = jnp.zeros((oh, ow), depth.dtype)
    # Strided views instead of gathers; for the shipped r=1 the window
    # offsets {0, 1}^2 never leave the image (H, W even), and for larger
    # r the clamp is folded into the slice bounds per offset.
    for i in range(-r + 1, r + 1):   # y offset
        for j in range(-r + 1, r + 1):  # x offset
            ys = np.clip(2 * np.arange(oh) + i, 0, 2 * oh - 1)
            xs = np.clip(2 * np.arange(ow) + j, 0, 2 * ow - 1)
            if (np.all(np.diff(ys) == 2) and np.all(np.diff(xs) == 2)):
                cur = jax.lax.slice(depth, (int(ys[0]), int(xs[0])),
                                    (int(ys[-1]) + 1, int(xs[-1]) + 1),
                                    (2, 2))
            else:
                cur = depth[jnp.asarray(ys)[:, None], jnp.asarray(xs)[None, :]]
            ok = jnp.abs(cur - center) < e_d
            t = t + jnp.where(ok, cur, 0.0)
            s = s + jnp.where(ok, 1.0, 0.0)
    return t / s
