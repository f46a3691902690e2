"""Projective data association (ICP correspondence) and the fused
normal-equations reduction.

TPU-native equivalents of ``trackKernel`` and ``reduceKernel``
(reference: kfusion/src/cpp/kernels.cpp:497-560, 251-495). The reduction is
re-designed for the MXU: instead of the reference's 32-scalar OpenMP
reduction / CUDA shared-memory tree, the masked per-pixel rows
``[error, J0..J5]`` form a ``[7, N]`` matrix A and a single
``A @ A^T`` contraction yields the error^2 term, the J^T e vector and the
full J^T J Gram block at once. The result is packed into the reference's
32-float layout ``[err^2, JTe(6), triu(JTJ)(21), count, n_-4, n_-5,
n_other]`` so ``update_pose``/``check_pose`` consume it unchanged.

Track result codes (reference: cpp/kernels.cpp:514-553):
  1 tracked / -1 no input / -2 projects outside image /
  -3 no reference normal / -4 too far / -5 wrong normal.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from slambench_tpu import params
from slambench_tpu.geometry import cross3, dot3, length3, rotate, transform

TrackData = Dict[str, jax.Array]  # {"result": [h,w] i32, "error": [h,w] f32, "J": [6,h,w] f32}


def track(in_vertex: jax.Array,
          in_normal: jax.Array,
          ref_vertex: jax.Array,
          ref_normal: jax.Array,
          t_track: jax.Array,
          view: jax.Array,
          dist_threshold: float = params.DIST_THRESHOLD,
          normal_threshold: float = params.NORMAL_THRESHOLD) -> TrackData:
    """Per-pixel ICP correspondence against the raycast reference maps.

    ``in_*`` are [3, h, w] pyramid-level maps; ``ref_*`` are [3, H, W] at
    full computation size. ``t_track`` is the current pose estimate and
    ``view = K @ inverse(raycast_pose)`` projects world points into the
    reference image (reference: cpp/kernels.cpp:948,956-958).
    """
    _, H, W = ref_vertex.shape

    proj_vertex = transform(t_track, in_vertex)           # [3, h, w]
    proj_pos = transform(view, proj_vertex)
    # Reference divides unconditionally; z == 0 yields inf/nan which we
    # classify as out-of-bounds (-2) — the C++ uint conversion of a NaN
    # pixel is UB, this is the sane pinned-down choice.
    px = proj_pos[0] / proj_pos[2] + 0.5
    py = proj_pos[1] / proj_pos[2] + 0.5

    in_bounds = ((px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1)
                 & jnp.isfinite(px) & jnp.isfinite(py))

    # uint2 truncation of the (non-negative, checked) projected pixel
    # (reference: cpp/kernels.cpp:531).
    u = jnp.clip(px.astype(jnp.int32), 0, W - 1)
    v = jnp.clip(py.astype(jnp.int32), 0, H - 1)
    flat = v * W + u

    # Pre-clamped gathers (promise_in_bounds avoids the slow clip-mode
    # gather lowering on TPU — see volume.take_flat). The two reference
    # maps ride ONE gather: per-gather-op cost dominates at pyramid
    # sizes on TPU (PROFILE.md), so 6 channels x 1 op beats 3 x 2 ops.
    refs = jnp.concatenate([ref_normal.reshape(3, -1),
                            ref_vertex.reshape(3, -1)], axis=0)
    ref_nv = refs.at[:, flat].get(mode="promise_in_bounds")  # [6, h, w]
    ref_n, ref_v = ref_nv[:3], ref_nv[3:]

    no_input = in_normal[0] == params.INVALID
    ref_invalid = ref_n[0] == params.INVALID

    diff = ref_v - proj_vertex
    proj_normal = rotate(t_track, in_normal)

    too_far = length3(diff) > dist_threshold
    dotn = dot3(proj_normal, ref_n)
    wrong_normal = dotn < normal_threshold

    # Priority chain mirrors the reference's early-continue order.
    result = jnp.where(
        no_input, -1,
        jnp.where(
            ~in_bounds, -2,
            jnp.where(
                ref_invalid, -3,
                jnp.where(too_far, -4,
                          jnp.where(wrong_normal, -5, 1)))))

    error = dot3(ref_n, diff)
    J = jnp.concatenate([ref_n, cross3(proj_vertex, ref_n)], axis=0)  # [6,h,w]

    return {
        "result": result.astype(jnp.int32),
        "error": error.astype(jnp.float32),
        "J": J.astype(jnp.float32),
    }


def reduce_track(data: TrackData) -> jax.Array:
    """Reduce per-pixel TrackData into the packed 32-float vector.

    Reference: cpp/kernels.cpp:251-495 ``reduceKernel``/``new_reduce``
    (8 row-strided blocks later summed into row 0 — here a single fused
    Gram-matrix contraction; the 8x32 blocking is an artifact of the CUDA
    launch shape, not of the maths).
    """
    result = data["result"].reshape(-1)
    error = data["error"].reshape(-1)
    J = data["J"].reshape(6, -1)

    valid = result >= 1
    vf = valid.astype(jnp.float32)

    e = error * vf
    Jm = J * vf[None, :]
    A = jnp.concatenate([e[None, :], Jm], axis=0)          # [7, N]
    # HIGHEST precision: on TPU the default bf16 MXU pass would quantize
    # the Gram terms; the contraction is tiny (7x7 output) so the f32
    # multi-pass costs nothing.
    G = jnp.dot(A, A.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)       # [7, 7]

    err2 = G[0, 0]
    jte = G[0, 1:7]
    triu = G[1:7, 1:7][jnp.triu_indices(6)]                # 21 values

    n_valid = jnp.sum(vf)
    n_far = jnp.sum((result == -4).astype(jnp.float32))
    n_wrong = jnp.sum((result == -5).astype(jnp.float32))
    # "row.result > -4" among rejected pixels (reference: cpp:305):
    n_other = jnp.sum(((result < 1) & (result > -4)).astype(jnp.float32))

    info = jnp.stack([n_valid, n_far, n_wrong, n_other])
    return jnp.concatenate([err2[None], jte, triu, info]).astype(jnp.float32)


def track_and_reduce(in_vertex: jax.Array,
                     in_normal: jax.Array,
                     ref_vertex: jax.Array,
                     ref_normal: jax.Array,
                     t_track: jax.Array,
                     view: jax.Array,
                     dist_threshold: float = params.DIST_THRESHOLD,
                     normal_threshold: float = params.NORMAL_THRESHOLD,
                     use_pallas: bool = False,
                     ) -> Tuple[jax.Array, TrackData]:
    """Fused track + reduce — one ICP iteration's data term.

    Returns (packed 32-vector, track data). Under jit, XLA fuses the
    correspondence math into the Gram contraction so per-pixel J rows never
    round-trip to HBM. With ``use_pallas`` the reduction runs through the
    hand-written Pallas MXU kernel instead of the XLA contraction.
    """
    data = track(in_vertex, in_normal, ref_vertex, ref_normal,
                 t_track, view, dist_threshold, normal_threshold)
    if use_pallas:
        from slambench_tpu.ops.pallas.reduce import reduce_track_pallas
        # Mosaic needs a TPU; everywhere else the kernel runs in the
        # Pallas interpreter (same numerics, slower — the oracle role).
        interpret = jax.default_backend() != "tpu"
        return reduce_track_pallas(data, interpret=interpret), data
    return reduce_track(data), data
