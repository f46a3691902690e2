"""Keyframe selection + pose-graph-corrected KinectFusion driver.

Beyond-reference layer (BASELINE.json config 5). The core KinectFusion
state machine is untouched (frame-to-model odometry); this wrapper:

* promotes frames to **keyframes** on translation/rotation thresholds,
  storing pose + a downsampled vertex/normal snapshot,
* links consecutive keyframes with odometry edges weighted by the ICP
  residual quality,
* detects **loop-closure candidates** by pose proximity between
  non-consecutive keyframes and verifies them by aligning the stored
  snapshots with a few point-to-plane ICP iterations (the same
  track/reduce/solve kernels as the tracker),
* periodically optimizes the pose graph and reports the corrected
  trajectory (drift removal for long runs; the TSDF itself is not
  re-deformed — like most keyframe SLAM systems the map correction is
  applied at export).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from slambench_tpu import params
from slambench_tpu.geometry import (
    get_camera_matrix, mat4mul, rigid_inverse, se3_log,
)
from slambench_tpu.models.posegraph import PoseGraph
from slambench_tpu.ops.solve import update_pose
from slambench_tpu.ops.track import track_and_reduce
from slambench_tpu.pipeline import KFusion, KFusionState


@dataclasses.dataclass
class Keyframe:
    index: int                 # pose-graph node id
    frame: int                 # source frame number
    pose: np.ndarray           # [4, 4] odometry pose at creation
    vertex: np.ndarray         # [3, h, w] downsampled vertex map
    normal: np.ndarray         # [3, h, w] downsampled normal map


class KeyframeStore:
    """Keyframe promotion policy + storage."""

    def __init__(self, trans_threshold: float = 0.15,
                 rot_threshold: float = 0.15,
                 downsample: int = 2):
        self.trans_threshold = trans_threshold
        self.rot_threshold = rot_threshold
        self.downsample = downsample
        self.keyframes: List[Keyframe] = []

    def should_promote(self, pose: np.ndarray) -> bool:
        if not self.keyframes:
            return True
        last = self.keyframes[-1].pose
        rel = np.linalg.inv(last) @ pose
        x = np.asarray(se3_log(jnp.asarray(rel, jnp.float32)))
        return (np.linalg.norm(x[:3]) > self.trans_threshold
                or np.linalg.norm(x[3:]) > self.rot_threshold)

    def promote(self, frame: int, pose: np.ndarray, vertex: np.ndarray,
                normal: np.ndarray) -> Keyframe:
        s = self.downsample
        kf = Keyframe(index=len(self.keyframes), frame=frame,
                      pose=np.asarray(pose, np.float32),
                      vertex=np.asarray(vertex[:, ::s, ::s], np.float32),
                      normal=np.asarray(normal[:, ::s, ::s], np.float32))
        self.keyframes.append(kf)
        return kf

    def loop_candidates(self, kf: Keyframe, min_gap: int = 5,
                        radius: float = 0.5) -> List[Keyframe]:
        out = []
        p = kf.pose[:3, 3]
        for other in self.keyframes[: max(0, kf.index - min_gap)]:
            if np.linalg.norm(other.pose[:3, 3] - p) < radius:
                out.append(other)
        return out


def build_ba_problem(keyframes: List[Keyframe],
                     poses_cur: Optional[List[np.ndarray]] = None,
                     cell: float = 0.075,
                     stride: int = 2,
                     min_views: int = 2,
                     max_obs: int = 16384):
    """Construct a bundle-adjustment problem from keyframe snapshots.

    Measurements are the keyframes' back-projected surface points in
    their own CAMERA frames (fixed data — stored snapshot vertices
    un-projected through the creation pose). Landmarks are found by
    VOXEL HASHING those points in the CURRENT pose estimates' world
    frame (``poses_cur``, e.g. the pose-graph solution BA refines):
    points are quantized to ``cell``-sized world cells and every cell
    seen by >= ``min_views`` keyframes becomes one landmark,
    initialized at the mean of its re-projected points. The models/ba.py
    residual model is ``r = T_i^-1 X_l - z`` (depth-camera BA).
    Returns (poses0 [N,4,4], landmarks0 [M,3], obs_cam, obs_lm, obs_z,
    obs_w) as numpy arrays, or None when fewer than 2 keyframes or no
    multi-view landmark exists. Observations beyond ``max_obs`` are
    dropped (deterministically, in keyframe order). Defaults measured
    on the revisit e2e scene: cell=0.075/stride=2 turns BA from worse
    than the pose graph (0.043 vs 0.037 tail ATE at the old 0.15/4 —
    cell-quantization noise dominated) to better (0.0345).
    """
    if len(keyframes) < 2:
        return None
    if poses_cur is None:
        poses_cur = [kf.pose for kf in keyframes]
    cells: dict = {}
    for kf in keyframes:
        v = kf.vertex[:, ::stride, ::stride].reshape(3, -1)   # world
        n0 = kf.normal[0, ::stride, ::stride].reshape(-1)
        valid = (n0 != params.INVALID) & (np.abs(v).sum(axis=0) > 0)
        pts = v[:, valid].T                                    # [P, 3]
        if not len(pts):
            continue
        # Fixed camera-frame measurements via the CREATION pose...
        Rinv = kf.pose[:3, :3].T
        t = kf.pose[:3, 3]
        zc = (Rinv @ (pts - t).T).T                            # camera
        # ...hashed/initialized in the CURRENT estimate's world frame.
        P = np.asarray(poses_cur[kf.index], np.float32)
        xw = (P[:3, :3] @ zc.T).T + P[:3, 3]
        keys = np.floor(xw / cell).astype(np.int64)
        for key, pw, pc in zip(map(tuple, keys), xw, zc):
            cells.setdefault(key, {}).setdefault(kf.index, []).append(
                (pw, pc))
    obs_cam, obs_lm, obs_z, lms = [], [], [], []
    for key, views in cells.items():
        if len(views) < min_views:
            continue
        lm_id = len(lms)
        world_mean = np.mean([pw for vs in views.values()
                              for (pw, _pc) in vs], axis=0)
        lms.append(world_mean)
        for kf_idx, vs in views.items():
            obs_cam.append(kf_idx)
            obs_lm.append(lm_id)
            obs_z.append(np.mean([pc for (_pw, pc) in vs], axis=0))
    if not lms:
        return None
    obs_cam = np.asarray(obs_cam, np.int32)[:max_obs]
    obs_lm = np.asarray(obs_lm, np.int32)[:max_obs]
    obs_z = np.asarray(obs_z, np.float32)[:max_obs]
    # Pad observations to the next power of two (jit shape reuse; zero
    # weight = inert, models/ba.py contract).
    k = len(obs_cam)
    cap = 1
    while cap < k:
        cap *= 2
    pad = cap - k
    obs_cam = np.concatenate([obs_cam, np.zeros(pad, np.int32)])
    obs_lm = np.concatenate([obs_lm, np.zeros(pad, np.int32)])
    obs_z = np.concatenate([obs_z, np.zeros((pad, 3), np.float32)])
    obs_w = np.concatenate([np.ones(k, np.float32),
                            np.zeros(pad, np.float32)])
    poses0 = np.stack([kf.pose for kf in keyframes]).astype(np.float32)
    return (poses0, np.stack(lms).astype(np.float32),
            obs_cam, obs_lm, obs_z, obs_w)


class PoseGraphKFusion:
    """KFusion + keyframing + pose-graph / bundle-adjustment backend.

    ``backend="posegraph"`` optimizes the keyframe pose graph (odometry
    + loop-closure edges); ``backend="ba"`` instead runs the sparse
    Schur-complement bundle adjuster (models/ba.py) on snapshot-derived
    landmarks (BASELINE config 5), falling back to the pose graph when
    the BA problem is degenerate (no multi-view landmarks yet)."""

    def __init__(self, kfusion: KFusion,
                 keyframe_store: Optional[KeyframeStore] = None,
                 optimize_every: int = 5,
                 icp_iters: int = 5,
                 backend: str = "posegraph"):
        if backend not in ("posegraph", "ba"):
            raise ValueError(f"unknown keyframe backend {backend!r}")
        self.kf = kfusion
        self.store = keyframe_store or KeyframeStore()
        self.graph = PoseGraph()
        self.optimize_every = optimize_every
        self.icp_iters = icp_iters
        self.backend = backend
        self._trajectory: List[np.ndarray] = []
        self._kf_of_frame: List[int] = []

        # Snapshot maps are stored downsampled (KeyframeStore.downsample),
        # so projective association onto the snapshot pixel grid uses the
        # correspondingly scaled intrinsics (the pyramid-level convention,
        # pipeline.py _tracking).
        camera = jnp.asarray(self.kf.camera, jnp.float32)
        self._K = get_camera_matrix(camera / float(self.store.downsample))

        def align(src_v, src_n, dst_v, dst_n, init_rel, view):
            """A few point-to-plane ICP iterations aligning snapshot src
            onto dst's map; returns (relative pose, residual count).
            ``view`` must be ``K @ inv(dst.pose)``: the stored snapshots
            are WORLD-frame raycast maps indexed by dst's pixel grid, so
            projective association of a world point onto that grid goes
            through dst's camera, not an identity camera."""

            def body(carry, _):
                rel, _red = carry
                red, _ = track_and_reduce(src_v, src_n, dst_v, dst_n,
                                          rel, view)
                new_rel, _c = update_pose(rel, red, 1e-6)
                return (new_rel, red), None

            (rel, red), _ = jax.lax.scan(
                body, (init_rel, jnp.zeros(32)), None,
                length=self.icp_iters)
            return rel, red

        self._align = jax.jit(align)

    def process_frame(self, state: KFusionState, depth, frame: int,
                      tracking_rate: int = 1, integration_rate: int = 2
                      ) -> KFusionState:
        state = self.kf.process_frame(state, depth, frame,
                                      tracking_rate, integration_rate)
        pose = np.asarray(state.pose)
        self._trajectory.append(pose)

        if self.store.should_promote(pose) and frame > 3:
            kf = self.store.promote(frame, pose,
                                    np.asarray(state.ref_vertex),
                                    np.asarray(state.ref_normal))
            node = self.graph.add_pose(pose)
            assert node == kf.index
            if kf.index > 0:
                self.graph.add_odometry_edge(kf.index - 1, kf.index,
                                             weight=1.0)
            # Loop closures: verify candidates by snapshot ICP.
            for cand in self.store.loop_candidates(kf):
                # Stored maps are world-frame raycast maps, so the ICP
                # measures the (small) relative world correction aligning
                # kf's snapshot onto cand's, starting at identity.
                rel, red = self._align(
                    jnp.asarray(kf.vertex), jnp.asarray(kf.normal),
                    jnp.asarray(cand.vertex), jnp.asarray(cand.normal),
                    jnp.eye(4),
                    mat4mul(self._K, rigid_inverse(
                        jnp.asarray(cand.pose, jnp.float32))))
                count = float(red[28])
                npix = kf.vertex.shape[1] * kf.vertex.shape[2]
                # Acceptance needs BOTH gates the tracker itself uses
                # (ops/solve.check_pose, reference: cpp/kernels.cpp:
                # 777-792): enough inliers AND a small point-plane RMS.
                # Inlier count alone passes wrong-but-overlapping
                # alignments (two parallel walls agree on normals while
                # sliding); their residual RMS exposes them.
                rms = float(np.sqrt(red[0] / count)) if count > 0 \
                    else float("inf")
                if (count / npix > 0.3
                        and rms < params.RMS_RESIDUAL_BOUND):
                    # rel corrects kf's world points onto cand's map:
                    # measured T_cand_kf = inv(P_cand) @ rel @ P_kf.
                    T_ij = (np.linalg.inv(cand.pose)
                            @ np.asarray(rel) @ kf.pose)
                    self.graph.add_edge(cand.index, kf.index, T_ij,
                                        weight=min(count / npix, 1.0))
            if (len(self.store.keyframes) % self.optimize_every == 0
                    and len(self.graph.edges) > 1):
                if self.backend == "ba":
                    self._optimize_ba()
                else:
                    self.graph.optimize(n_iters=8)
        self._kf_of_frame.append(len(self.store.keyframes) - 1)
        return state

    def _optimize_ba(self) -> None:
        """Sparse Schur-complement BA over snapshot-derived landmarks
        (models/ba.py), seeded from the pose-graph solution: the graph
        (odometry + ICP-verified loop closures) fixes the large-scale
        drift, then BA jointly refines poses and landmarks from the raw
        surface measurements. Keyframe poses in the graph are replaced
        by the BA solution so :meth:`corrected_trajectory` propagates
        it. Falls back to the pose graph alone while the landmark set
        is degenerate."""
        from slambench_tpu.models.ba import bundle_adjust
        self.graph.optimize(n_iters=8)
        prob = build_ba_problem(self.store.keyframes,
                                poses_cur=self.graph.poses)
        if prob is None:
            return
        _odo_poses, lms0, cam, lm, z, w = prob
        poses0 = np.stack(self.graph.poses).astype(np.float32)
        # Pad cameras and landmarks to power-of-two tiers too — the K
        # padding in build_ba_problem only buys jit reuse if N and M are
        # also stable across calls (every keyframe promotion grows both).
        # Padded cameras are identity poses and padded landmarks zeros;
        # no observation references them, so under per-block damping
        # their gradient is zero and their update exactly zero — inert.
        n_real, m_real = poses0.shape[0], lms0.shape[0]

        def _cap(x: int, lo: int = 8) -> int:
            c = lo
            while c < x:
                c *= 2
            return c

        poses_p = np.concatenate(
            [poses0, np.tile(np.eye(4, dtype=np.float32),
                             (_cap(n_real) - n_real, 1, 1))])
        lms_p = np.concatenate(
            [lms0, np.zeros((_cap(m_real) - m_real, 3), np.float32)])
        # n_cg pinned so the CG depth does not vary with the padding tier.
        out_p, _out_l, _r2 = bundle_adjust(
            jnp.asarray(poses_p), jnp.asarray(lms_p), jnp.asarray(cam),
            jnp.asarray(lm), jnp.asarray(z), jnp.asarray(w),
            n_iters=4, damping=1e-4, n_cg=64)
        out_p = np.asarray(out_p)
        self.graph.poses = [out_p[k] for k in range(n_real)]

    def corrected_trajectory(self) -> np.ndarray:
        """Per-frame poses with pose-graph corrections propagated from
        the owning keyframe (frames between keyframes move rigidly with
        their predecessor keyframe)."""
        if not self.store.keyframes:
            return np.stack(self._trajectory) if self._trajectory else \
                np.zeros((0, 4, 4), np.float32)
        opt = [np.asarray(p) for p in self.graph.poses]
        out = []
        for frame, pose in enumerate(self._trajectory):
            k = self._kf_of_frame[frame]
            if k < 0:
                out.append(pose)
                continue
            kf = self.store.keyframes[k]
            correction = opt[k] @ np.linalg.inv(kf.pose)
            out.append(correction @ pose)
        return np.stack(out)
