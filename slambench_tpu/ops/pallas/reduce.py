"""Fused ICP normal-equations reduction as a Pallas TPU kernel.

The TPU-native counterpart of the reference's flagship ``reduceKernel``
(reference: kfusion/src/cpp/kernels.cpp:251-495 — a 32-scalar OpenMP
reduction; cuda/kernels.cu:381-454 — a <<<8,112>>> shared-memory tree).
Each grid step loads one row-tile of the per-pixel ``[error, J0..J5]``
rows (padded to the native 128-lane width) plus the result-code map into
VMEM, masks invalid pixels, computes the Gram block with one 128x128 MXU
contraction, and accumulates into a VMEM scratch that is flushed on the
last step. Mosaic constraints shaped the kernel: full-lane-width (128)
blocks only, no scatter (counts are placed with iota masks), result
codes travel as f32.

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

# Pixels per grid step. Env-overridable for tuning sweeps — the TPU
# analogue of the reference's work-group-size override harness
# (reference: thirdparty/OCLWrapper.cpp:77-132, KERNEL/ls*/gs* env vars);
# driven by slambench_tpu.tools.autotune.
TILE_ROWS = int(os.environ.get("SLAMBENCH_TILE_ROWS", "512"))
WIDTH = 128              # native lane width; cols 0..7 carry data


def _reduce_kernel(a_ref, res_ref, out_ref, acc_ref):
    """Grid step: accumulate this tile's Gram block + counts.

    a_ref:   [TILE, 128]  cols = [error, J0..J5, 0 x 121]
    res_ref: [TILE, 128]  result code broadcast across lanes (f32)
    out_ref: [128, 128]   final accumulator output (last step)
    acc_ref: [128, 128]   VMEM scratch accumulator
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a = a_ref[:]
    res = res_ref[:]
    valid = (res >= 1.0).astype(jnp.float32)      # [TILE, 128]

    am = a * valid
    G = jax.lax.dot_general(
        am, am, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [128, 128]

    # Counts over the tile; every lane carries the same code, so divide
    # the full-width sums by WIDTH (exact: counts are integers * 128).
    inv_w = 1.0 / WIDTH
    n_valid = jnp.sum(valid) * inv_w
    n_far = jnp.sum((res == -4.0).astype(jnp.float32)) * inv_w
    n_wrong = jnp.sum((res == -5.0).astype(jnp.float32)) * inv_w
    n_other = jnp.sum(((res < 1.0) & (res > -4.0)).astype(jnp.float32)) \
        * inv_w

    # Scatter-free placement: counts land in column 7, rows 0-3 (the
    # zero-padded column of the Gram block).
    rowi = jax.lax.broadcasted_iota(jnp.int32, (WIDTH, WIDTH), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (WIDTH, WIDTH), 1)
    vals = (n_valid * (rowi == 0).astype(jnp.float32)
            + n_far * (rowi == 1).astype(jnp.float32)
            + n_wrong * (rowi == 2).astype(jnp.float32)
            + n_other * (rowi == 3).astype(jnp.float32))
    counts_col = vals * (coli == 7).astype(jnp.float32)

    acc_ref[:] = acc_ref[:] + G + counts_col

    @pl.when(step == pl.num_programs(0) - 1)
    def _flush():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret", "tile_rows"))
def reduce_track_pallas(data, interpret: bool = False,
                        tile_rows: int | None = None) -> jax.Array:
    """Packed 32-float reduction from TrackData (ops.track contract).

    ``tile_rows`` overrides the per-step tile height (default: the
    SLAMBENCH_TILE_ROWS env var or 512) — the tuning knob the reference
    exposes as OpenCL work-group size overrides.
    """
    TILE = tile_rows or TILE_ROWS
    result = data["result"].reshape(-1)
    error = data["error"].reshape(-1)
    J = data["J"].reshape(6, -1)
    n = result.shape[0]

    pad = (-n) % TILE
    if pad:
        # -6 falls outside every counting bucket (valid / -4 / -5 /
        # "other reject" which is -4 < r < 1), so padding is inert.
        result = jnp.pad(result, (0, pad), constant_values=-6)
        error = jnp.pad(error, (0, pad))
        J = jnp.pad(J, ((0, 0), (0, pad)))
        n += pad

    a = jnp.concatenate(
        [error[None, :], J, jnp.zeros((WIDTH - 7, n), jnp.float32)],
        axis=0).T                                    # [N, 128]
    res = jnp.broadcast_to(result[:, None], (n, WIDTH)).astype(jnp.float32)

    grid = n // TILE
    G = pl.pallas_call(
        _reduce_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE, WIDTH), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, WIDTH), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((WIDTH, WIDTH), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((WIDTH, WIDTH), jnp.float32),
        scratch_shapes=[pltpu.VMEM((WIDTH, WIDTH), jnp.float32)],
        interpret=interpret,
    )(a, res)

    err2 = G[0, 0]
    jte = G[0, 1:7]
    triu = G[1:7, 1:7][jnp.triu_indices(6)]
    info = jnp.stack([G[0, 7], G[1, 7], G[2, 7], G[3, 7]])
    return jnp.concatenate([err2[None], jte, triu, info])
