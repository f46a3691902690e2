"""The KinectFusion pipeline: functional state + jitted phase functions.

TPU-native re-design of the reference ``Kfusion`` class
(reference: kfusion/include/kernels.h:83-195, kfusion/src/cpp/kernels.cpp:
915-1055). Instead of a mutable object with device buffers, the pipeline
state is an immutable pytree (``KFusionState``) threaded through jitted
phase functions; a fused ``compute_frame`` runs the whole
preprocess->track->integrate->raycast chain in one device dispatch.

Key structural difference from the reference: the coarse-to-fine ICP loop
— which in the reference reads the 8x32 reduction back to the host and
solves with TooN every iteration (reference: cuda/kernels.cu:821-825,
opencl/kernels.cpp:793-807) — runs entirely on-device inside
``lax.while_loop``s, including the 6x6 solve, the SE(3) retraction and the
early-exit convergence test. One host<->device round-trip per frame
(the depth upload) instead of ~19.

Frame-rate gates (``frame % tracking_rate`` etc.) are host-side static
booleans — the frame counter lives in the driver loop, so each of the few
gate combinations compiles once and steady-state alternates between two
fully-specialized step graphs. The tracked/integrated decisions that
depend on device data stay in-graph as ``lax.cond``.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from slambench_tpu import params
from slambench_tpu.geometry import (
    get_camera_matrix, get_inverse_camera_matrix, mat4mul, rigid_inverse,
    se3_exp, se3_log, translation_pose,
)
from slambench_tpu.ops.integrate import integrate, integrate_blocks
from slambench_tpu.ops.preprocess import (
    bilateral_filter, half_sample_robust, make_gaussian, mm2meters,
)
from slambench_tpu.ops.raycast import raycast_maps
from slambench_tpu.ops.raycast_fast import (
    make_min_mip, raycast_fast_maps, warm_start_bound,
)
from slambench_tpu.ops.render import render_depth, render_track, render_volume
from slambench_tpu.ops.solve import check_pose, update_pose
from slambench_tpu.ops.track import track_and_reduce
from slambench_tpu.ops.vertex import depth2vertex, vertex2normal
from slambench_tpu.volume import init_volume


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KFusionState:
    """Everything that persists across frames (plus the intra-frame
    buffers that cross phase boundaries), as one pytree.

    Serializing this dataclass IS checkpoint/resume — a strict capability
    superset of the reference's volume dump (reference: cpp:1006-1030).
    """
    tsdf: jax.Array          # int16 [Z, Y, X]
    weight: jax.Array        # int8 [Z, Y, X] (maxweight=100 fits exactly)
    mip: jax.Array           # int16 [Z/8, Y/8, X/8] conservative min-mip
    pose: jax.Array          # f32 [4, 4]
    old_pose: jax.Array      # f32 [4, 4]
    raycast_pose: jax.Array  # f32 [4, 4]
    ref_vertex: jax.Array    # f32 [3, H, W] raycast vertex map
    ref_normal: jax.Array    # f32 [3, H, W] raycast normal map
    prev_t_hit: jax.Array    # f32 [H, W] last raycast hit distances
    float_depth: jax.Array   # f32 [H, W] metres (mm2meters output)
    scaled_depth0: jax.Array  # f32 [H, W] bilateral-filtered depth
    track_result: jax.Array  # i32 [H, W] last ICP result codes
    reduction: jax.Array     # f32 [32] packed normal equations
    tracked: jax.Array       # bool
    integrated: jax.Array    # bool


def cv_predict(pose: jax.Array, old_pose: jax.Array,
               damping: float = 0.5,
               max_step: float = 0.04) -> jax.Array:
    """Damped constant-velocity ICP warm start.

    ``pose = old_pose @ D`` with ``D`` the last camera-frame motion;
    the prediction advances by ``exp(damping * clamp(log(D)))``. The
    damping and the twist-norm cap keep the initial guess inside the
    coarse pyramid level's convergence basin: an UNdamped prediction
    measured on the synthetic e2e clip overshoots at the trajectory's
    acceleration peaks, converging ICP to a wrong-but-accepted optimum
    (RMS just under the 2e-2 checkPose gate) that poisons the map.
    After a rejected frame ``pose == old_pose`` so ``D == I`` — the
    prediction degrades to the reference's previous-pose start.
    """
    xi = se3_log(mat4mul(rigid_inverse(old_pose), pose))
    norm = jnp.linalg.norm(xi)
    scale = damping * jnp.minimum(1.0, max_step / jnp.maximum(norm, 1e-12))
    return mat4mul(pose, se3_exp(xi * scale))


class KFusion:
    """Pipeline driver: bakes the run configuration into jitted phase
    functions (the analogue of rebuilding the reference ``Kfusion`` object
    when parameters change, reference: qt/SlamBenchQt.cpp:347-362)."""

    def __init__(self,
                 computation_size: Tuple[int, int],      # (W, H) ref order
                 volume_resolution: Tuple[int, int, int],
                 volume_dimensions: Tuple[float, float, float],
                 init_pose: Sequence[float],
                 pyramid: Sequence[int],
                 camera: Sequence[float],
                 mu: float = 0.1,
                 icp_threshold: float = 1e-5,
                 backend: str = "fast",
                 motion_model: str = "none"):
        # "jnp": the oracle trilinear march (reference-exact sampling);
        # "fast"/"auto": min-mip accelerated raycast (same hits, ~10x
        # fewer volume reads); "pallas": fast raycast + the hand-written
        # Pallas reduction/stencil kernels (Mosaic-compiled on TPU,
        # interpreter elsewhere).
        if backend not in ("jnp", "fast", "pallas", "auto"):
            raise ValueError(
                f"unknown backend {backend!r}: use jnp|fast|pallas|auto")
        if backend == "auto":
            backend = "fast"
        # ICP initial guess: "none" starts at the previous pose (the
        # reference's behaviour, cpp/kernels.cpp:938); "cv" warm-starts
        # at a constant-velocity prediction pose @ (old_pose^-1 @ pose),
        # which cuts while_loop iterations on smooth trajectories (the
        # early-exit convergence test fires sooner). A diverging
        # prediction is caught by the unchanged checkPose gate, which
        # reverts to the previous pose exactly as the reference does.
        if motion_model not in ("none", "cv"):
            raise ValueError(
                f"unknown motion_model {motion_model!r}: use none|cv")
        self.motion_model = motion_model
        W, H = computation_size
        self.W, self.H = W, H
        self.volume_resolution = tuple(volume_resolution)
        self.volume_dimensions = tuple(float(d) for d in volume_dimensions)
        self.init_pose = tuple(float(p) for p in init_pose)
        self.iterations = tuple(int(i) for i in pyramid)
        self.camera = tuple(float(c) for c in camera)
        self.mu = float(mu)
        self.icp_threshold = float(icp_threshold)
        self.backend = backend
        # Fine ray-march step = min(dim) / max(res) (reference: kernels.h:116).
        self.step = min(self.volume_dimensions) / max(self.volume_resolution)
        # Frustum-culled block integration (ops/integrate.integrate_blocks):
        # env "NZxNY[xNX]" overrides; "1x1"/"0" disables. Default: 8x8x2
        # blocks on TPU for the fast tiers (8x8 measured 1.8x on hardware
        # at the bench pose; the x-split cuts live voxels 50% -> ~35%
        # more, PROFILE.md §7 / profiles/r3_probe.json); monolithic on
        # CPU (XLA:CPU gathers are vectorized — serialized cond blocks
        # only add loop overhead there) and for the jnp oracle tier (the
        # reference's unconditional voxel stream).
        blk = os.environ.get("SLAMBENCH_INTEGRATE_BLOCKS", "auto")
        rz, ry = self.volume_resolution[2], self.volume_resolution[1]
        rx = self.volume_resolution[0]
        if blk in ("auto", ""):
            on_tpu = jax.default_backend() == "tpu"
            nz, ny, nx = (8, 8, 2) if (backend != "jnp" and on_tpu) \
                else (1, 1, 1)
        elif blk == "0":
            nz, ny, nx = 1, 1, 1
        else:
            parts = [int(v) for v in blk.lower().split("x")]
            if not 1 <= len(parts) <= 3:
                raise ValueError(
                    f"SLAMBENCH_INTEGRATE_BLOCKS={blk!r}: use NZ, NZxNY "
                    "or NZxNYxNX")
            nz, ny, nx = (parts + [1, 1])[:3]
        if rz % nz or ry % ny or rx % nx:
            nz, ny, nx = 1, 1, 1
        self.integrate_block_grid = (nz, ny, nx)
        self.gaussian = jnp.asarray(make_gaussian())

        self._levels = len(self.iterations)
        self._k = jnp.asarray(self.camera, jnp.float32)

        # jitted phase functions (state donated so the TSDF updates in place).
        self.preprocessing = jax.jit(self._preprocessing, donate_argnums=0)
        self.tracking = jax.jit(self._tracking, donate_argnums=0)
        self.integration = jax.jit(self._integration, donate_argnums=0,
                                   static_argnames=("integrate_frame",
                                                    "force_integrate"))
        self.raycasting = jax.jit(self._raycasting, donate_argnums=0)
        self.compute_frames_scan = jax.jit(
            self._compute_frames_scan, donate_argnums=0)
        self.compute_frames_scan_rated = jax.jit(
            self._compute_frames_scan_rated, donate_argnums=0,
            static_argnames=("tracking_rate", "integration_rate",
                             "phase"))
        self.compute_frame = jax.jit(
            self._compute_frame, donate_argnums=0,
            static_argnames=("tracking_on", "integrate_frame",
                             "force_integrate", "raycast_on"))
        self.render_depth_image = jax.jit(self._render_depth)
        self.render_track_image = jax.jit(self._render_track)
        self.render_volume_image = jax.jit(self._render_volume)

    # ------------------------------------------------------------------ #

    def init_state(self) -> KFusionState:
        """Fresh pipeline state (reference: languageSpecificConstructor +
        reset, cpp/kernels.cpp:67-137).

        The reference leaves ``raycastPose`` zero-initialized and inverts
        that singular matrix on frame 0 (UB); we initialize it to the
        starting pose, which produces the same observable behaviour (no
        reference normals yet => every pixel rejected => untracked frame).
        """
        tsdf, weight = init_volume(self.volume_resolution)
        pose = np.asarray(translation_pose(self.init_pose))
        H, W = self.H, self.W
        # Each leaf gets its own device buffer — the phase functions donate
        # the state, and XLA rejects donating one buffer twice.
        return KFusionState(
            tsdf=tsdf,
            weight=weight,
            mip=make_min_mip(tsdf),
            pose=jnp.asarray(pose.copy()),
            old_pose=jnp.asarray(pose.copy()),
            raycast_pose=jnp.asarray(pose.copy()),
            ref_vertex=jnp.asarray(np.zeros((3, H, W), np.float32)),
            ref_normal=jnp.asarray(np.zeros((3, H, W), np.float32)),
            prev_t_hit=jnp.asarray(np.zeros((H, W), np.float32)),
            float_depth=jnp.asarray(np.zeros((H, W), np.float32)),
            scaled_depth0=jnp.asarray(np.zeros((H, W), np.float32)),
            track_result=jnp.asarray(np.zeros((H, W), np.int32)),
            reduction=jnp.asarray(np.zeros((32,), np.float32)),
            tracked=jnp.asarray(False),
            integrated=jnp.asarray(False),
        )

    # ---------------------------- phases ------------------------------ #

    def _preprocessing(self, state: KFusionState,
                       input_depth: jax.Array) -> KFusionState:
        """mm->m conversion + bilateral filter
        (reference: cpp/kernels.cpp:915-922)."""
        in_h, in_w = input_depth.shape
        ratio = in_w // self.W
        fd = mm2meters(input_depth, ratio)
        if self.backend == "pallas":
            from slambench_tpu.ops.pallas.bilateral import (
                bilateral_filter_pallas,
            )
            sd0 = bilateral_filter_pallas(
                fd, np.asarray(self.gaussian), params.E_DELTA,
                params.RADIUS, interpret=jax.default_backend() != "tpu")
        else:
            sd0 = bilateral_filter(fd, self.gaussian, params.E_DELTA,
                                   params.RADIUS)
        return dataclasses.replace(state, float_depth=fd, scaled_depth0=sd0)

    def _build_pyramid(self, sd0: jax.Array) -> List[jax.Array]:
        """Depth pyramid via robust half-sampling
        (reference: cpp/kernels.cpp:930-935)."""
        pyr = [sd0]
        for _ in range(1, self._levels):
            pyr.append(half_sample_robust(pyr[-1], params.E_DELTA * 3, 1))
        return pyr

    def _tracking(self, state: KFusionState, *,
                  with_census: bool = False):
        """Pyramid build + per-level vertex/normal + coarse-to-fine ICP
        (reference: cpp/kernels.cpp:924-971).

        ``with_census=True`` additionally returns the per-level executed
        ICP iteration counts and convergence flags (coarsest-first
        ``int32[levels]`` / ``bool[levels]``) — the measurement surface
        of ``tools/icp_census`` (PROFILE.md §10.1), served by this one
        implementation so the census can never drift from the pipeline."""
        pyr = self._build_pyramid(state.scaled_depth0)
        verts, norms = [], []
        for i in range(self._levels):
            inv_k = get_inverse_camera_matrix(self._k / float(1 << i))
            v = depth2vertex(pyr[i], inv_k)
            verts.append(v)
            norms.append(vertex2normal(v))

        old_pose = state.pose
        view = mat4mul(get_camera_matrix(self._k),
                       rigid_inverse(state.raycast_pose))

        if self.motion_model == "cv":
            pose = cv_predict(state.pose, state.old_pose)
        else:
            pose = state.pose
        reduction = state.reduction
        track_result = state.track_result
        counts, convs = [], []

        for level in reversed(range(self._levels)):
            h = self.H >> level
            w = self.W >> level
            max_iters = self.iterations[level]

            def body(carry, _level=level):
                i, pose_c, _red, _res, _conv = carry
                red, data = track_and_reduce(
                    verts[_level], norms[_level],
                    state.ref_vertex, state.ref_normal, pose_c, view,
                    use_pallas=(self.backend == "pallas"))
                new_pose, conv = update_pose(pose_c, red, self.icp_threshold)
                return (i + 1, new_pose, red, data["result"], conv)

            def cond(carry, _max=max_iters):
                i, _p, _r, _res, conv = carry
                return (i < _max) & ~conv

            init = (jnp.int32(0), pose, reduction,
                    jnp.zeros((h, w), jnp.int32), jnp.asarray(False))
            n_it, pose, reduction, level_result, conv = jax.lax.while_loop(
                cond, body, init)
            counts.append(n_it)
            convs.append(conv)
            if level == 0:
                track_result = level_result

        pose, tracked = check_pose(pose, old_pose, reduction, (self.H, self.W))
        new_state = dataclasses.replace(
            state, pose=pose, old_pose=old_pose, reduction=reduction,
            track_result=track_result, tracked=tracked)
        if with_census:
            return new_state, jnp.stack(counts), jnp.stack(convs)
        return new_state

    def _integration(self, state: KFusionState, *,
                     integrate_frame: bool,
                     force_integrate: bool) -> KFusionState:
        """TSDF fusion, gated on pose acceptance and the integration rate
        (reference: cpp/kernels.cpp:988-1004). ``integrate_frame`` is the
        host-side ``frame % integration_rate == 0``; ``force_integrate``
        is ``frame <= 3``."""
        pose, ok = check_pose(state.pose, state.old_pose, state.reduction,
                              (self.H, self.W))
        should = (ok & integrate_frame) | force_integrate

        def do(args):
            tsdf, weight, _ = args
            nz, ny, nx = self.integrate_block_grid
            if (nz, ny, nx) == (1, 1, 1):
                tsdf, weight = integrate(
                    tsdf, weight, state.float_depth, rigid_inverse(pose),
                    get_camera_matrix(self._k), self.mu,
                    params.MAX_WEIGHT, self.volume_dimensions)
            else:
                tsdf, weight = integrate_blocks(
                    tsdf, weight, state.float_depth, rigid_inverse(pose),
                    get_camera_matrix(self._k), self.mu,
                    params.MAX_WEIGHT, self.volume_dimensions,
                    n_z=nz, n_y=ny, n_x=nx)
            return tsdf, weight, make_min_mip(tsdf)

        tsdf, weight, mip = jax.lax.cond(
            should, do, lambda args: args,
            (state.tsdf, state.weight, state.mip))
        return dataclasses.replace(
            state, pose=pose, tsdf=tsdf, weight=weight, mip=mip,
            integrated=should)

    def _raycasting(self, state: KFusionState) -> KFusionState:
        """Surface prediction from the current pose; only called when
        frame > 2 (reference: cpp/kernels.cpp:973-986)."""
        view = mat4mul(state.pose, get_inverse_camera_matrix(self._k))
        if self.backend == "jnp":
            vertex, normal = raycast_maps(
                state.tsdf, self.volume_dimensions, view, (self.H, self.W),
                params.NEAR_PLANE, params.FAR_PLANE,
                self.step, 0.75 * self.mu)
            # Oracle backend keeps no warm start; store zeros.
            t_hit = jnp.zeros((self.H, self.W), jnp.float32)
        else:
            # Temporal warm start: the previous raycast bounds where the
            # (static) scene surface can be, shrunk by the rigid-motion
            # margin between the two raycast poses. Default OFF: the
            # lockstep march's trip count is set by the LONGEST ray, and
            # miss/sky rays get no bound from the warm start, so it was
            # measured SLOWER both profiling days (172->202 ms r2,
            # 140->164 ms r3, PROFILE.md §6) — the bound computation
            # costs without cutting the critical path. Env-switchable
            # for scenes with full surface coverage (no miss rays),
            # where the bound does shorten the longest ray.
            if os.environ.get("SLAMBENCH_WARM_START", "0") == "1":
                delta = mat4mul(rigid_inverse(state.raycast_pose),
                                state.pose)
                t_init = warm_start_bound(
                    state.prev_t_hit, delta, params.FAR_PLANE,
                    0.75 * self.mu)
            else:
                t_init = None
            vertex, normal, t_hit = raycast_fast_maps(
                state.tsdf, state.mip, self.volume_dimensions, view,
                (self.H, self.W), params.NEAR_PLANE, params.FAR_PLANE,
                self.step, 0.75 * self.mu, t_init=t_init)
        return dataclasses.replace(
            state, raycast_pose=state.pose, ref_vertex=vertex,
            ref_normal=normal, prev_t_hit=t_hit)

    def _compute_frame(self, state: KFusionState, input_depth: jax.Array, *,
                       tracking_on: bool, integrate_frame: bool,
                       force_integrate: bool, raycast_on: bool
                       ) -> KFusionState:
        """Fused preprocess->track->integrate->raycast, one dispatch
        (reference: cpp/kernels.cpp:1048-1055 ``computeFrame``)."""
        state = self._preprocessing(state, input_depth)
        if tracking_on:
            state = self._tracking(state)
        else:
            state = dataclasses.replace(state, tracked=jnp.asarray(False))
        state = self._integration(state, integrate_frame=integrate_frame,
                                  force_integrate=force_integrate)
        if raycast_on:
            state = self._raycasting(state)
        return state

    def _compute_frames_scan(self, state: KFusionState,
                             depths: jax.Array
                             ) -> Tuple[KFusionState, dict]:
        """``lax.scan`` of the fused steady-state frame over a stacked
        depth batch ``[N, H, W]``; returns (state, per-frame outputs:
        ``{"pos": [N, 3], "tracked": [N], "integrated": [N]}`` — the
        columns the 14-column log needs per frame).

        Dispatch-granularity batching, not a semantics change: each
        frame runs the same fused step as :meth:`compute_frame` with the
        steady-state gates (tracking + integrate on, no forced
        bootstrap, raycast on — the reference's ``-r 1`` loop past
        frame 3), sequentially, carrying the state. Matches N per-frame
        dispatches to FMA-contraction ulps (measured 5.7e-6 m over 7
        frames — XLA contracts the scan body differently than the
        standalone jit; asserted at 0.1 mm on positions plus measured
        knife-edge-voxel LSB bounds by tests/test_pipeline_e2e.py);
        what it removes is the PER-FRAME
        host dispatch round-trip, which on a tunneled endpoint is
        material (BENCHMARKS.md). Bootstrap frames (<= 3) and
        rate-gated schedules still go through per-frame dispatch."""
        def body(s, depth):
            s = self._scan_step(s, depth, tracking_on=True,
                                integrate_frame=True,
                                force_integrate=False,
                                raycast_on=True)
            return s, {"pos": s.pose[:3, 3], "tracked": s.tracked,
                       "integrated": s.integrated}

        return jax.lax.scan(body, state, depths)

    def _scan_step(self, state: KFusionState, depth: jax.Array,
                   **gates) -> KFusionState:
        """The one-frame step the scan bodies run — overridden by
        ShardedKFusion with the shard_map step so both scan variants
        serve both tiers."""
        return self._compute_frame(state, depth, **gates)

    def _compute_frames_scan_rated(self, state: KFusionState,
                                   depths: jax.Array, *,
                                   tracking_rate: int,
                                   integration_rate: int,
                                   phase: int
                                   ) -> Tuple[KFusionState, dict]:
        """Dispatch batching for RATE-GATED schedules (the reference
        Makefile's ``-r 2`` default): the scan body consumes one full
        gate period (lcm of the rates) per step, with each in-period
        frame's gates static — so e.g. a ``-r 2`` run alternates
        integrate-on/off inside one compiled scan body instead of
        falling back to per-frame dispatch. ``phase`` is the first
        frame's index modulo the period (gates follow the reference's
        ``frame % rate`` convention, cpp/kernels.cpp:927,994).
        ``depths`` is [K, L, H, W] with L the gate period."""
        L = math.lcm(tracking_rate, integration_rate)
        assert depths.ndim == 4 and depths.shape[1] == L, depths.shape

        def body(s, dblock):
            outs = []
            for i in range(L):
                f = phase + i
                s = self._scan_step(
                    s, dblock[i],
                    tracking_on=(f % tracking_rate == 0),
                    integrate_frame=(f % integration_rate == 0),
                    force_integrate=False, raycast_on=True)
                outs.append({"pos": s.pose[:3, 3], "tracked": s.tracked,
                             "integrated": s.integrated})
            stacked = {k: jnp.stack([o[k] for o in outs])
                       for k in outs[0]}
            return s, stacked

        state, ys = jax.lax.scan(body, state, depths)
        # [K, L, ...] -> [K*L, ...] frame-major outputs.
        return state, {k: v.reshape((-1,) + v.shape[2:])
                       for k, v in ys.items()}

    # ---------------------------- frontends --------------------------- #

    def process_frame(self, state: KFusionState, input_depth, frame: int,
                      tracking_rate: int = 1, integration_rate: int = 2
                      ) -> KFusionState:
        """One full frame with host-side rate gates; ``frame`` is the
        driver's frame counter (reference: benchmark.cpp:125-158 loop
        body, with the gates of cpp/kernels.cpp:927,994,977)."""
        return self.compute_frame(
            state, jnp.asarray(input_depth),
            tracking_on=(frame % tracking_rate == 0),
            integrate_frame=(frame % integration_rate == 0),
            force_integrate=(frame <= 3),
            raycast_on=(frame > 2))

    # ---------------------------- rendering --------------------------- #

    def _render_depth(self, state: KFusionState) -> jax.Array:
        return render_depth(state.float_depth)

    def _render_track(self, state: KFusionState) -> jax.Array:
        return render_track(state.track_result)

    def _render_volume(self, state: KFusionState) -> jax.Array:
        view = mat4mul(state.pose, get_inverse_camera_matrix(self._k))
        # fast/pallas tiers march with the chebyshev-skip raycast (the
        # state's mip is already maintained for the tracking raycast);
        # the jnp oracle tier keeps the reference-exact march.
        return render_volume(
            state.tsdf, self.volume_dimensions, view, (self.H, self.W),
            params.NEAR_PLANE, params.FAR_PLANE * 2.0,
            self.step, 0.75 * self.mu,
            mip=None if self.backend == "jnp" else state.mip)

    # ---------------------------- utilities --------------------------- #

    def get_position(self, state: KFusionState) -> np.ndarray:
        """Pose translation relative to the initial pose
        (reference: kernels.h:150-157 ``getPosition``)."""
        t = np.asarray(state.pose[:3, 3])
        return t - np.asarray(self.init_pose, np.float32)

    def dump_volume(self, state: KFusionState, filename: str) -> None:
        """Write the TSDF shorts (value component only), x-fastest order —
        byte-compatible with the reference dump
        (reference: cpp/kernels.cpp:1006-1030)."""
        np.asarray(state.tsdf).astype("<i2").tofile(filename)
