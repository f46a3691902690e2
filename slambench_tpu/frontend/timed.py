"""Per-kernel timed frame execution (the KERNEL_TIMINGS route).

The reference wraps every kernel launch in TICK/TOCK macros that fence
the device and print ``name duration_ns size`` to stderr
(reference: kfusion/src/cpp/kernels.cpp:16-37,57; CUDA TOCK fences with
cudaDeviceSynchronize, cuda/kernels.cu:23-38). The fused TPU step hides
kernels inside one dispatch, so this module provides the structural
twin of the reference pipeline instead: every kernel is its own jitted
dispatch, the coarse-to-fine ICP loop runs host-side with a per-
iteration readback of the packed reduction (exactly the reference's
structure, opencl/kernels.cpp:793-807), and each dispatch is fenced and
logged under the reference's kernel names so checkKernels-compatible
tooling (eval/check_kernels.py) gets real per-kernel input.

This is a diagnostic mode: the production path is the fused
``KFusion.compute_frame``.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from slambench_tpu import params
from slambench_tpu.geometry import (
    get_camera_matrix, get_inverse_camera_matrix, mat4mul, rigid_inverse,
)
from slambench_tpu.ops.integrate import integrate
from slambench_tpu.ops.preprocess import (
    bilateral_filter, half_sample_robust, mm2meters,
)
from slambench_tpu.ops.raycast import raycast_maps
from slambench_tpu.ops.raycast_fast import (
    make_min_mip, raycast_fast_maps, warm_start_bound,
)
from slambench_tpu.ops.solve import check_pose, update_pose
from slambench_tpu.ops.track import reduce_track, track
from slambench_tpu.ops.vertex import depth2vertex, vertex2normal
from slambench_tpu.pipeline import KFusion, KFusionState, cv_predict
from slambench_tpu.utils.timers import KernelTimer


class TimedRunner:
    """Executes one frame kernel-by-kernel with reference-named timing
    lines; wraps (and caches per-op jits for) a ``KFusion``."""

    def __init__(self, kf: KFusion, stream=None):
        self.kf = kf
        self.stream = stream if stream is not None else sys.stderr
        k = kf._k

        self._mm2m = jax.jit(mm2meters, static_argnums=1)
        self._bilateral = jax.jit(
            lambda d: bilateral_filter(d, kf.gaussian, params.E_DELTA,
                                       params.RADIUS))
        self._half = jax.jit(
            lambda d: half_sample_robust(d, params.E_DELTA * 3, 1))
        self._d2v = []
        self._v2n = jax.jit(vertex2normal)
        for i in range(len(kf.iterations)):
            inv_k = get_inverse_camera_matrix(k / float(1 << i))
            self._d2v.append(jax.jit(
                lambda d, inv_k=inv_k: depth2vertex(d, inv_k)))
        self._track = jax.jit(track)
        self._reduce = jax.jit(reduce_track)
        self._update = jax.jit(
            lambda pose, red: update_pose(pose, red, kf.icp_threshold))
        self._check = jax.jit(
            lambda pose, old, red: check_pose(pose, old, red,
                                              (kf.H, kf.W)))
        self._integrate = jax.jit(
            lambda tsdf, weight, fd, pose: integrate(
                tsdf, weight, fd, rigid_inverse(pose),
                get_camera_matrix(k), kf.mu, params.MAX_WEIGHT,
                kf.volume_dimensions))
        self._mip = jax.jit(make_min_mip)
        if kf.backend == "jnp":
            self._raycast = jax.jit(
                lambda tsdf, mip, pose, t_init: raycast_maps(
                    tsdf, kf.volume_dimensions,
                    mat4mul(pose, get_inverse_camera_matrix(k)),
                    (kf.H, kf.W), params.NEAR_PLANE, params.FAR_PLANE,
                    kf.step, 0.75 * kf.mu)
                + (jnp.zeros((kf.H, kf.W), jnp.float32),))
        else:
            self._raycast = jax.jit(
                lambda tsdf, mip, pose, t_init: raycast_fast_maps(
                    tsdf, mip, kf.volume_dimensions,
                    mat4mul(pose, get_inverse_camera_matrix(k)),
                    (kf.H, kf.W), params.NEAR_PLANE, params.FAR_PLANE,
                    kf.step, 0.75 * kf.mu, t_init=t_init))
        self._warm = jax.jit(
            lambda prev_t, rc_pose, pose: warm_start_bound(
                prev_t, mat4mul(rigid_inverse(rc_pose), pose),
                params.FAR_PLANE, 0.75 * kf.mu))
        self._cv = jax.jit(cv_predict)

    def _timed(self, name: str, size: int, fn, *args):
        with KernelTimer(name, size, stream=self.stream,
                         enabled=True) as t:
            t.result = fn(*args)
        return t.result

    def process_frame(self, state: KFusionState, input_depth,
                      frame: int, tracking_rate: int = 1,
                      integration_rate: int = 2) -> KFusionState:
        kf = self.kf
        H, W = kf.H, kf.W
        npix = H * W
        input_depth = jnp.asarray(input_depth)
        ratio = input_depth.shape[1] // W

        fd = self._timed("mm2meters", npix, self._mm2m, input_depth, ratio)
        sd0 = self._timed("bilateralFilter", npix, self._bilateral, fd)
        state = dataclasses.replace(state, float_depth=fd,
                                    scaled_depth0=sd0)

        tracked = False
        if frame % tracking_rate == 0:
            levels = len(kf.iterations)
            pyr = [sd0]
            for i in range(1, levels):
                pyr.append(self._timed("halfSampleRobustImage",
                                       npix >> (2 * i), self._half,
                                       pyr[-1]))
            verts, norms = [], []
            for i in range(levels):
                v = self._timed("depth2vertex", npix >> (2 * i),
                                self._d2v[i], pyr[i])
                n = self._timed("vertex2normal", npix >> (2 * i),
                                self._v2n, v)
                verts.append(v)
                norms.append(n)

            old_pose = state.pose
            view = mat4mul(get_camera_matrix(kf._k),
                           rigid_inverse(state.raycast_pose))
            # ICP initial pose: the same motion-model contract as
            # pipeline._tracking — without this, --motion-model cv was
            # silently a no-op under KERNEL_TIMINGS=1 (measured: synth3
            # fast clip drifts to 0.505 m ATE vs 0.077 m with cv).
            if kf.motion_model == "cv":
                pose = self._cv(state.pose, state.old_pose)
            else:
                pose = state.pose
            red = state.reduction
            track_result = state.track_result
            for level in reversed(range(levels)):
                size_l = npix >> (2 * level)
                for _ in range(kf.iterations[level]):
                    data = self._timed("track", size_l, self._track,
                                       verts[level], norms[level],
                                       state.ref_vertex, state.ref_normal,
                                       pose, view)
                    red = self._timed("reduce", size_l, self._reduce, data)
                    pose, conv = self._timed("updatePose", 1,
                                             self._update, pose, red)
                    if level == 0:
                        track_result = data["result"]
                    # Host-side convergence break: the reference reads the
                    # reduction back and breaks on host every iteration
                    # (opencl/kernels.cpp:793-807).
                    if bool(conv):
                        break
            pose, tracked_dev = self._timed("checkPose", 1, self._check,
                                            pose, old_pose, red)
            tracked = bool(tracked_dev)
            state = dataclasses.replace(
                state, pose=pose, old_pose=old_pose, reduction=red,
                track_result=track_result, tracked=tracked_dev)
        else:
            state = dataclasses.replace(state, tracked=jnp.asarray(False))
            tracked = False

        should = (tracked and frame % integration_rate == 0) or frame <= 3
        if should:
            tsdf, weight = self._timed("integrate", npix, self._integrate,
                                       state.tsdf, state.weight,
                                       state.float_depth, state.pose)
            mip = self._timed("minMip", npix, self._mip, tsdf)
            state = dataclasses.replace(state, tsdf=tsdf, weight=weight,
                                        mip=mip)
        state = dataclasses.replace(state, integrated=jnp.asarray(should))

        if frame > 2:
            t_init = self._warm(state.prev_t_hit, state.raycast_pose,
                                state.pose)
            vertex, normal, t_hit = self._timed(
                "raycast", npix, self._raycast, state.tsdf, state.mip,
                state.pose, t_init)
            state = dataclasses.replace(
                state, raycast_pose=state.pose, ref_vertex=vertex,
                ref_normal=normal, prev_t_hit=t_hit)
        return state
