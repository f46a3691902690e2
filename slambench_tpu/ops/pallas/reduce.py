"""Fused ICP normal-equations reduction as a Pallas TPU kernel.

The TPU-native counterpart of the reference's flagship ``reduceKernel``
(reference: kfusion/src/cpp/kernels.cpp:251-495 — a 32-scalar OpenMP
reduction; cuda/kernels.cu:381-454 — a <<<8,112>>> shared-memory tree).

Layout (v2 — the round-1 kernel padded every pixel row to the full
128-lane width, materializing ~32x the necessary HBM traffic in the XLA
prologue): the per-pixel channels travel as eight natural [R, 128]
planes (error, J0..J5, result), R = ceil(npix/128); each grid step loads
one row-tile of every plane into VMEM, masks invalid pixels, computes
the 28 upper-triangle Gram terms with one [8, TILE*128] x [TILE*128, 8]
MXU contraction, and accumulates into a [8, 128] VMEM scratch that is
flushed on the last step. Mosaic constraints shaped the kernel: blocks
are full 128-lane width, no scatter (counts are placed with iota masks).

Output layout matches ``ops.track.reduce_track``:
``[err^2, JTe(6), triu(JTJ)(21), count, n_-4, n_-5, n_other]``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 128-lane rows per grid step. Env-overridable for tuning sweeps — the
# TPU analogue of the reference's work-group-size override harness
# (reference: thirdparty/OCLWrapper.cpp:77-132, KERNEL/ls*/gs* env);
# driven by slambench_tpu.tools.autotune.
TILE_ROWS = int(os.environ.get("SLAMBENCH_TILE_ROWS", "128"))
WIDTH = 128


def _reduce_kernel(a_ref, res_ref, out_ref, acc_ref):
    """Grid step: accumulate this tile's Gram block + counts.

    a_ref:   [8, TILE, 128]  planes = [error, J0..J5, zeros]
    res_ref: [TILE, 128]     result codes (f32)
    out_ref: [8, 128]        packed accumulator output (last step)
    acc_ref: [8, 128]        VMEM scratch accumulator
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    res = res_ref[:]
    valid = (res >= 1.0).astype(jnp.float32)            # [TILE, 128]

    t, w = res.shape
    a = a_ref[:].reshape(8, t * w)
    am = a * valid.reshape(1, t * w)
    # Gram block on the MXU: contraction over all pixels of the tile.
    G = jax.lax.dot_general(
        am, am, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [8, 8]

    # Counts over the tile.
    n_valid = jnp.sum(valid)
    n_far = jnp.sum((res == -4.0).astype(jnp.float32))
    n_wrong = jnp.sum((res == -5.0).astype(jnp.float32))
    n_other = jnp.sum(((res < 1.0) & (res > -4.0)).astype(jnp.float32))

    # Scatter-free placement into the [8, 128] accumulator: Gram goes to
    # cols 0..7, counts to col 7 rows 0..3 (plane 7 is all-zero padding,
    # so Gram col/row 7 is structurally zero).
    rowi = jax.lax.broadcasted_iota(jnp.int32, (8, WIDTH), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (8, WIDTH), 1)
    G_wide = jnp.pad(G, ((0, 0), (0, WIDTH - 8)))
    counts = ((n_valid * (rowi == 0) + n_far * (rowi == 1)
               + n_wrong * (rowi == 2) + n_other * (rowi == 3))
              * (coli == 7)).astype(jnp.float32)
    acc_ref[:] = acc_ref[:] + G_wide + counts

    @pl.when(step == pl.num_programs(0) - 1)
    def _flush():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret", "tile_rows"))
def reduce_track_pallas(data, interpret: bool = False,
                        tile_rows: int | None = None) -> jax.Array:
    """Packed 32-float reduction from TrackData (ops.track contract).

    ``tile_rows`` overrides the per-step tile height in 128-lane rows
    (default: the SLAMBENCH_TILE_ROWS env var) — the tuning knob the
    reference exposes as OpenCL work-group-size overrides.
    """
    TILE = tile_rows or TILE_ROWS
    result = data["result"].reshape(-1)
    error = data["error"].reshape(-1)
    J = data["J"].reshape(6, -1)
    n = result.shape[0]

    pad = (-n) % (TILE * WIDTH)
    if pad:
        # -6 falls outside every counting bucket (valid / -4 / -5 /
        # "other reject" which is -4 < r < 1), so padding is inert.
        result = jnp.pad(result, (0, pad), constant_values=-6)
        error = jnp.pad(error, (0, pad))
        J = jnp.pad(J, ((0, 0), (0, pad)))
        n += pad
    rows = n // WIDTH

    a = jnp.concatenate(
        [error[None], J, jnp.zeros((1, n), jnp.float32)],
        axis=0).reshape(8, rows, WIDTH)
    res = result.reshape(rows, WIDTH).astype(jnp.float32)

    grid = rows // TILE
    G = pl.pallas_call(
        _reduce_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, TILE, WIDTH), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, WIDTH), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, WIDTH), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, WIDTH), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, WIDTH), jnp.float32)],
        interpret=interpret,
    )(a, res)

    err2 = G[0, 0]
    jte = G[0, 1:7]
    triu = G[1:7, 1:7][jnp.triu_indices(6)]
    info = jnp.stack([G[0, 7], G[1, 7], G[2, 7], G[3, 7]])
    return jnp.concatenate([err2[None], jte, triu, info])
