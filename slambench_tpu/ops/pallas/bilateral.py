"""Bilateral depth filter as a VMEM-resident Pallas stencil.

The reference's ``bilateralFilterKernel`` (reference:
kfusion/src/cpp/kernels.cpp:159-198) over a whole depth image held in
VMEM: all 25 taps, the range weights and the normalization happen in one
kernel with zero intermediate HBM traffic (the pure-jnp version relies on
XLA to fuse its 25 shifted views; this makes the fusion explicit). The
uint-wraparound border clamp semantics are identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slambench_tpu import params


def _shift_uintwrap_val(img, dy: int, dx: int):
    """Shift an in-register image value with the reference's uint-wrap
    border clamp (out-of-range-left reads the far edge)."""
    H, W = img.shape

    def shift1(a, d, size, axis):
        if d == 0:
            return a
        edge = jax.lax.slice_in_dim(a, size - 1, size, axis=axis)
        if d > 0:
            body = jax.lax.slice_in_dim(a, d, size, axis=axis)
            pad = jnp.concatenate([edge] * d, axis=axis)
            return jnp.concatenate([body, pad], axis=axis)
        body = jax.lax.slice_in_dim(a, 0, size + d, axis=axis)
        pad = jnp.concatenate([edge] * (-d), axis=axis)
        return jnp.concatenate([pad, body], axis=axis)

    return shift1(shift1(img, dx, W, 1), dy, H, 0)


def _make_kernel(gaussian, e_d: float, r: int):
    e2 = e_d * e_d * 2.0
    g = [float(x) for x in gaussian]

    def kernel(in_ref, out_ref):
        depth = in_ref[:]
        t = jnp.zeros_like(depth)
        s = jnp.zeros_like(depth)
        for j in range(-r, r + 1):
            for i in range(-r, r + 1):
                cur = _shift_uintwrap_val(depth, j, i)
                mod = (cur - depth) ** 2
                factor = (g[i + r] * g[j + r]) * jnp.exp(-mod / e2)
                valid = cur > 0
                t = t + jnp.where(valid, factor * cur, 0.0)
                s = s + jnp.where(valid, factor, 0.0)
        out_ref[:] = jnp.where(depth == 0.0, 0.0, t / s)

    return kernel


def bilateral_filter_pallas(depth: jax.Array,
                            gaussian,
                            e_d: float = params.E_DELTA,
                            r: int = params.RADIUS,
                            interpret: bool = False) -> jax.Array:
    """``gaussian`` must be a concrete (host) array — the LUT is baked
    into the kernel as constants (like the reference's __constant LUT)."""
    import numpy as np
    kernel = _make_kernel(np.asarray(gaussian), e_d, r)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(depth.shape, depth.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(depth)
