"""Synthetic living-room dataset with exact ground-truth trajectory.

The reference's accuracy gate downloads ICL-NUIM trajectories
(reference: Makefile:37-43) and compares against their ground truth
(reference: thirdparty/checkPos.py). This environment has no network
egress, so this module ray-traces an analytic SDF "living room" (walls +
furniture primitives) along a known smooth camera trajectory and emits

  * a RAW container (planar-z millimetre depth, reference format),
  * a ground-truth trajectory file in the ICL-NUIM/freiburg convention
    consumed by checkPos-style evaluation (y-axis negated deltas,
    reference: checkPos.py:104),

giving the same end-to-end ATE test the reference runs, with a ground
truth that is exact rather than rendered.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from slambench_tpu.io.raw import RawWriter

# Bumped whenever the analytic scene or trajectory changes shape;
# generate_dataset stamps it next to the RAW so cached datasets (bench,
# profilers) regenerate instead of silently mixing scene generations.
SCENE_VERSION = 2


@dataclasses.dataclass
class SyntheticScene:
    """An analytic SDF scene inside the volume [0, dim]^3.

    The default furniture layout gives the depth images structure in all
    six pose DOF (a floor/wall-only scene leaves yaw unconstrained and ICP
    drifts): a sphere, two boxes and a tall pillar at different heights
    and azimuths.

    The walls are INSET from the volume boundary: a wall exactly on the
    volume face would have its entire negative TSDF band outside the
    volume, making it invisible to the raycast (no f<0 voxel exists) —
    every wall pixel then returns -3 and the tracked-pixel ratio sits on
    the 15% track-threshold cliff (ICL-NUIM rooms are likewise interior
    to the reference's fusion volume).
    """
    dim: Tuple[float, float, float] = (4.8, 4.8, 4.8)
    wall_inset: float = 0.25

    def sdf(self, p: jax.Array) -> jax.Array:
        """Signed distance (positive in free space) at world points
        ``p`` of shape [3, ...]."""
        dx, dy, dz = self.dim
        x, y, z = p[0], p[1], p[2]

        # Room interior: distance to the nearest (inset) wall plane.
        w = self.wall_inset * dx / 4.8
        room = jnp.minimum(
            jnp.minimum(jnp.minimum(x - w, dx - w - x),
                        jnp.minimum(y - w, dy - w - y)),
            jnp.minimum(z - w, dz - w - z))

        def sphere(c, r):
            return jnp.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2
                            + (z - c[2]) ** 2) - r

        def box(c, h):
            qx = jnp.abs(x - c[0]) - h[0]
            qy = jnp.abs(y - c[1]) - h[1]
            qz = jnp.abs(z - c[2]) - h[2]
            outside = jnp.sqrt(jnp.maximum(qx, 0.0) ** 2
                               + jnp.maximum(qy, 0.0) ** 2
                               + jnp.maximum(qz, 0.0) ** 2)
            inside = jnp.minimum(jnp.maximum(qx, jnp.maximum(qy, qz)), 0.0)
            return outside + inside

        s = dx / 4.8  # scale furniture with the room
        d = room
        d = jnp.minimum(d, sphere((2.6 * s, 2.2 * s, 3.4 * s), 0.5 * s))
        d = jnp.minimum(d, box((1.4 * s, 3.4 * s, 3.2 * s),
                               (0.45 * s, 0.5 * s, 0.45 * s)))
        d = jnp.minimum(d, box((3.4 * s, 1.2 * s, 2.6 * s),
                               (0.5 * s, 0.35 * s, 0.4 * s)))
        d = jnp.minimum(d, box((1.0 * s, 1.1 * s, 3.8 * s),
                               (0.3 * s, 1.1 * s, 0.3 * s)))  # pillar
        d = jnp.minimum(d, sphere((3.8 * s, 3.8 * s, 3.9 * s), 0.35 * s))
        return d


def _rot_yx(yaw: float, pitch: float) -> np.ndarray:
    """Camera-to-world rotation: yaw about +y then pitch about +x."""
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float32)
    Rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]], np.float32)
    return Ry @ Rx


def orbit_trajectory(n_frames: int,
                     init_pos: Sequence[float],
                     amp: float = 0.25,
                     yaw_amp: float = 0.12,
                     pitch_amp: float = 0.05,
                     period: int = 60) -> np.ndarray:
    """Smooth looping camera trajectory of c2w pose matrices [N, 4, 4].

    Starts exactly at ``init_pos`` with identity rotation (matching the
    pipeline's translation-only initial pose, reference: kernels.h:106-109)
    and wanders with small per-frame deltas so frame-to-frame ICP stays in
    its convergence basin. The angular rate is fixed by ``period`` (frames
    per orbit), NOT by ``n_frames`` — per-frame motion must not depend on
    clip length.
    """
    poses = np.zeros((n_frames, 4, 4), np.float32)
    p0 = np.asarray(init_pos, np.float32)
    # Ease-in: real handheld sequences (incl. ICL-NUIM) start nearly
    # static; the pipeline cannot track before its first raycast at
    # frame 3 (reference: cpp/kernels.cpp:977), so a trajectory moving at
    # full speed from frame 0 would imprint bootstrap misregistration
    # into the TSDF that no tracker could remove. Ramp the parameter
    # speed linearly over the first `ramp` frames.
    ramp = 10
    for i in range(n_frames):
        # Quadratic ease-in joining the unit-speed line C1-continuously.
        s = i * i / (2.0 * ramp) if i < ramp else i - ramp * 0.5
        ph = 2.0 * np.pi * s / max(period, 1)
        t = p0 + np.array([
            amp * np.sin(ph),
            0.5 * amp * (1 - np.cos(ph)),
            0.6 * amp * np.sin(2 * ph),
        ], np.float32)
        R = _rot_yx(yaw_amp * np.sin(ph), pitch_amp * (1 - np.cos(ph)))
        poses[i, :3, :3] = R
        poses[i, :3, 3] = t
        poses[i, 3, 3] = 1.0
    return poses


def render_depth_frame(scene: SyntheticScene,
                       pose: np.ndarray,
                       k: Sequence[float],
                       image_size: Tuple[int, int],
                       max_range: float = 6.0,
                       n_steps: int = 96) -> np.ndarray:
    """Sphere-trace one planar-z depth image (uint16 millimetres).

    The output convention matches the RAW container: z-depth (what
    ``scene2raw`` stores after undoing the euclidean depth,
    reference: thirdparty/scene2raw.cpp:97-109).
    """
    W, H = image_size
    fx, fy, cx, cy = k
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    dir_cam = jnp.stack([
        jnp.broadcast_to((u - cx) / fx, (H, W)),
        jnp.broadcast_to((v - cy) / fy, (H, W)),
        jnp.ones((H, W), jnp.float32),
    ])
    R = jnp.asarray(pose[:3, :3])
    o = jnp.asarray(pose[:3, 3]).reshape(3, 1, 1)
    dw = jnp.stack([
        R[0, 0] * dir_cam[0] + R[0, 1] * dir_cam[1] + R[0, 2] * dir_cam[2],
        R[1, 0] * dir_cam[0] + R[1, 1] * dir_cam[1] + R[1, 2] * dir_cam[2],
        R[2, 0] * dir_cam[0] + R[2, 1] * dir_cam[1] + R[2, 2] * dir_cam[2],
    ])
    norm = jnp.sqrt(dir_cam[0] ** 2 + dir_cam[1] ** 2 + dir_cam[2] ** 2)
    du = dw / norm[None]

    def body(i, t):
        d = scene.sdf(o + du * t[None])
        return t + jnp.maximum(d, 1e-4) * (t < max_range)

    t = jax.lax.fori_loop(0, n_steps, body,
                          jnp.full((H, W), 1e-3, jnp.float32))
    hit = t < max_range
    z = t / norm  # planar z-depth
    depth_mm = jnp.where(hit, z * 1000.0, 0.0)
    return jnp.clip(depth_mm, 0, 65535).astype(jnp.uint16)


def write_gt_freiburg(path: str, poses: np.ndarray) -> None:
    """Ground truth in the convention checkPos-style evaluation expects:
    x/z are deltas from the start, y is the NEGATED delta
    (reference: thirdparty/checkPos.py:104 applies
    ``(kf_x + gt0_x, -(kf_y + gt0_y), kf_z + gt0_z)``; starting the GT at
    the origin makes the adjusted estimate directly comparable)."""
    p0 = poses[0, :3, 3]
    with open(path, "w") as f:
        for i, pose in enumerate(poses):
            d = pose[:3, 3] - p0
            f.write("%d %.9f %.9f %.9f 0 0 0 1\n" % (i + 1, d[0], -d[1], d[2]))


def generate_dataset(out_dir: str,
                     n_frames: int = 60,
                     image_size: Tuple[int, int] = (640, 480),
                     k: Optional[Sequence[float]] = None,
                     dim: Tuple[float, float, float] = (4.8, 4.8, 4.8),
                     init_pos_factor: Sequence[float] = (0.34, 0.5, 0.24),
                     amp: float = 0.25,
                     period: int = 60,
                     name: str = "synth") -> dict:
    """Render a full dataset: RAW container + ground-truth file.

    Returns a manifest dict with paths and the exact poses.
    """
    os.makedirs(out_dir, exist_ok=True)
    W, H = image_size
    if k is None:
        # Scale the ICL-NUIM intrinsics to the requested resolution.
        kscale = W / 640.0
        k = (481.2 * kscale, 480.0 * kscale, (W / 2), (H / 2))
    scene = SyntheticScene(dim=dim)
    init_pos = [f * d for f, d in zip(init_pos_factor, dim)]
    poses = orbit_trajectory(n_frames, init_pos, amp=amp, period=period)

    raw_path = os.path.join(out_dir, f"{name}.raw")
    gt_path = os.path.join(out_dir, f"{name}.gt.freiburg")

    render = jax.jit(
        lambda pose: render_depth_frame(scene, pose, k, image_size))
    with RawWriter(raw_path, W, H) as wr:
        for i in range(n_frames):
            depth = np.asarray(render(jnp.asarray(poses[i])))
            wr.write(depth)
    write_gt_freiburg(gt_path, poses)
    with open(os.path.join(out_dir, f"{name}.scene_version"), "w") as f:
        f.write(str(SCENE_VERSION))
    return {
        "raw": raw_path,
        "gt": gt_path,
        "poses": poses,
        "camera": tuple(k),
        "image_size": image_size,
        "dim": dim,
        "init_pos_factor": tuple(init_pos_factor),
    }
