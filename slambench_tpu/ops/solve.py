"""Pose update (6x6 Gauss-Newton solve + SE(3) retraction) and pose
acceptance test.

TPU-native equivalents of ``updatePoseKernel`` and ``checkPoseKernel``
(reference: kfusion/src/cpp/kernels.cpp:759-792). Unlike the reference —
which reads the 256-float reduction back to the host and solves with TooN
on the CPU every ICP iteration (reference: cuda/kernels.cu:821-825) — both
run in-graph so the whole coarse-to-fine ICP loop stays on device.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from slambench_tpu import params
from slambench_tpu.geometry import mat4mul, se3_exp, solve_normal_equations


def update_pose(pose: jax.Array,
                reduction: jax.Array,
                icp_threshold: float) -> Tuple[jax.Array, jax.Array]:
    """One Gauss-Newton step: ``pose <- exp(solve(JTJ, JTe)) @ pose``.

    ``reduction`` is the packed 32-vector; elements 1:28 are
    ``[JTe(6), triu(JTJ)(21)]`` (reference: cpp/kernels.cpp:764-767 uses
    ``values[0].slice<1, 27>()``). Returns (new_pose, converged) with
    convergence = ``|x| < icp_threshold`` (reference: cpp:770-771).
    """
    x = solve_normal_equations(reduction[1:28])
    new_pose = mat4mul(se3_exp(x), pose)
    converged = jnp.linalg.norm(x) < icp_threshold
    return new_pose, converged


def check_pose(pose: jax.Array,
               old_pose: jax.Array,
               reduction: jax.Array,
               image_size: Tuple[int, int],
               track_threshold: float = params.TRACK_THRESHOLD,
               ) -> Tuple[jax.Array, jax.Array]:
    """Accept or reject the tracked pose.

    Reject (revert to ``old_pose``) when the RMS point-plane residual
    exceeds 2e-2 m or fewer than ``track_threshold`` of the pixels tracked
    (reference: cpp/kernels.cpp:777-792). With an all-zero reduction the
    residual is 0/0 = NaN; NaN > 2e-2 is false in IEEE (matching C++) and
    the pixel-ratio test then rejects — frames with no correspondences are
    always rejected, exactly as in the reference.
    """
    h, w = image_size
    err2 = reduction[0]
    count = reduction[28]
    rms = jnp.sqrt(err2 / count)
    bad = (rms > params.RMS_RESIDUAL_BOUND) | (count / (h * w) < track_threshold)
    out_pose = jnp.where(bad, old_pose, pose)
    return out_pose, ~bad
