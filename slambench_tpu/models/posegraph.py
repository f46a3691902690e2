"""Pose-graph optimization on SE(3), TPU-native.

No reference counterpart (the reference is pure frame-to-model odometry);
this implements BASELINE.json's beyond-reference layer. Design:

* Edges carry relative-pose measurements ``T_ij`` (from ICP odometry or
  loop closures). The residual of edge (i, j) is
  ``r = log(T_ij^-1 · T_i^-1 · T_j)`` in se(3).
* One Gauss-Newton iteration evaluates all edge residuals and Jacobians
  **batched with vmap** (Jacobians by central differences on the 12
  perturbation directions — 24 tiny exp/log chains per edge, fully
  vectorized; no per-edge Python), scatters the 12x12 blocks into the
  6N x 6N normal matrix with ``segment_sum``, and solves the damped
  system on-device.
* The edge set is embarrassingly parallel: under a mesh, each device
  reduces its slice of edges and a single ``psum`` of (H, b) completes
  the normal equations — the same collective pattern as the ICP reduce.
  ``optimize_pose_graph`` takes an optional ``axis_name`` for use inside
  ``shard_map``.
* Gauge freedom is fixed by a strong prior on pose 0.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from slambench_tpu.geometry import mat4mul, rigid_inverse, se3_exp, se3_log


def edge_residual(Ti: jax.Array, Tj: jax.Array, Tij: jax.Array
                  ) -> jax.Array:
    """r = log(T_ij^-1 T_i^-1 T_j) — zero when the measurement is
    satisfied."""
    Z = mat4mul(rigid_inverse(Tij), mat4mul(rigid_inverse(Ti), Tj))
    return se3_log(Z)


def _edge_jacobians(Ti, Tj, Tij, eps=1e-4):
    """Central-difference Jacobians of the residual wrt right-perturbed
    T_i, T_j: r(T_i exp(x_i), T_j exp(x_j)). Returns (Ji [6,6], Jj [6,6],
    r [6])."""
    r0 = edge_residual(Ti, Tj, Tij)

    basis = jnp.eye(6, dtype=jnp.float32) * eps

    def dcol_i(col):
        rp = edge_residual(mat4mul(Ti, se3_exp(col)), Tj, Tij)
        rm = edge_residual(mat4mul(Ti, se3_exp(-col)), Tj, Tij)
        return (rp - rm) / (2 * eps)

    def dcol_j(col):
        rp = edge_residual(Ti, mat4mul(Tj, se3_exp(col)), Tij)
        rm = edge_residual(Ti, mat4mul(Tj, se3_exp(-col)), Tij)
        return (rp - rm) / (2 * eps)

    Ji = jax.vmap(dcol_i)(basis).T    # [6, 6]
    Jj = jax.vmap(dcol_j)(basis).T
    return Ji, Jj, r0


@functools.partial(jax.jit, static_argnames=("n_iters", "axis_name"))
def optimize_pose_graph(poses: jax.Array,
                        edges_ij: jax.Array,
                        edges_T: jax.Array,
                        edges_w: jax.Array,
                        n_iters: int = 10,
                        damping: float = 1e-6,
                        prior_weight: float = 1e6,
                        axis_name: Optional[str] = None
                        ) -> Tuple[jax.Array, jax.Array]:
    """Gauss-Newton pose-graph optimization.

    Args:
      poses: [N, 4, 4] initial absolute poses.
      edges_ij: [E, 2] int32 (i, j) indices.
      edges_T: [E, 4, 4] measured relative poses T_ij.
      edges_w: [E] per-edge weights (0 masks an edge out — fixed-size
        edge buffers with padding stay jit-friendly).
      axis_name: reduce (H, b) over this mesh axis (edge-sharded mode).

    Returns (optimized poses [N, 4, 4], final total squared residual).
    """
    N = poses.shape[0]

    def gn_step(poses, _):
        def per_edge(ij, Tij, w):
            Ti = poses[ij[0]]
            Tj = poses[ij[1]]
            Ji, Jj, r = _edge_jacobians(Ti, Tj, Tij)
            hp = jax.lax.Precision.HIGHEST
            Hii = w * jnp.matmul(Ji.T, Ji, precision=hp)
            Hjj = w * jnp.matmul(Jj.T, Jj, precision=hp)
            Hij = w * jnp.matmul(Ji.T, Jj, precision=hp)
            bi = w * jnp.matmul(Ji.T, r, precision=hp)
            bj = w * jnp.matmul(Jj.T, r, precision=hp)
            return Hii, Hjj, Hij, bi, bj, w * jnp.dot(r, r)

        Hii, Hjj, Hij, bi, bj, r2 = jax.vmap(per_edge)(
            edges_ij, edges_T, edges_w)

        # Assemble the 6N x 6N system with segment sums over block rows.
        idx_i = edges_ij[:, 0]
        idx_j = edges_ij[:, 1]
        H = jnp.zeros((N, N, 6, 6), jnp.float32)
        H = H.at[idx_i, idx_i].add(Hii)
        H = H.at[idx_j, idx_j].add(Hjj)
        H = H.at[idx_i, idx_j].add(Hij)
        H = H.at[idx_j, idx_i].add(jnp.swapaxes(Hij, 1, 2))
        b = jnp.zeros((N, 6), jnp.float32)
        b = b.at[idx_i].add(bi)
        b = b.at[idx_j].add(bj)
        total_r2 = jnp.sum(r2)

        if axis_name is not None:
            H = jax.lax.psum(H, axis_name)
            b = jax.lax.psum(b, axis_name)
            total_r2 = jax.lax.psum(total_r2, axis_name)

        # Gauge prior on pose 0.
        H = H.at[0, 0].add(prior_weight * jnp.eye(6))

        Hd = H.transpose(0, 2, 1, 3).reshape(6 * N, 6 * N)
        Hd = Hd + damping * jnp.eye(6 * N)
        delta = jnp.linalg.solve(Hd, -b.reshape(-1)).reshape(N, 6)

        new_poses = jax.vmap(lambda T, d: mat4mul(T, se3_exp(d)))(
            poses, delta)
        return new_poses, total_r2

    poses, r2s = jax.lax.scan(gn_step, poses, None, length=n_iters)
    return poses, r2s[-1]


class PoseGraph:
    """Host-side pose-graph builder: grows keyframe poses and edges,
    optimizes on device. Fixed-capacity edge buffer keeps recompilation
    bounded (unused slots carry zero weight)."""

    def __init__(self, capacity_poses: int = 512,
                 capacity_edges: int = 2048):
        self.poses: list = []
        self.edges: list = []       # (i, j, T_ij 4x4, weight)
        self.cap_p = capacity_poses
        self.cap_e = capacity_edges

    def add_pose(self, pose: np.ndarray) -> int:
        self.poses.append(np.asarray(pose, np.float32))
        return len(self.poses) - 1

    def add_edge(self, i: int, j: int, T_ij: np.ndarray,
                 weight: float = 1.0) -> None:
        self.edges.append((i, j, np.asarray(T_ij, np.float32),
                           float(weight)))

    def add_odometry_edge(self, i: int, j: int, weight: float = 1.0):
        """Measurement = current relative pose between stored poses."""
        T_ij = np.linalg.inv(self.poses[i]) @ self.poses[j]
        self.add_edge(i, j, T_ij, weight)

    def optimize(self, n_iters: int = 10) -> np.ndarray:
        n = len(self.poses)
        e = len(self.edges)
        if n == 0:
            return np.zeros((0, 4, 4), np.float32)
        # Pad the edge buffer to the next power of two for shape reuse.
        cap = 1
        while cap < max(e, 1):
            cap *= 2
        ij = np.zeros((cap, 2), np.int32)
        T = np.tile(np.eye(4, dtype=np.float32), (cap, 1, 1))
        w = np.zeros((cap,), np.float32)
        for k, (i, j, Tij, wt) in enumerate(self.edges):
            ij[k] = (i, j)
            T[k] = Tij
            w[k] = wt
        poses = jnp.asarray(np.stack(self.poses))
        out, _ = optimize_pose_graph(poses, jnp.asarray(ij),
                                     jnp.asarray(T), jnp.asarray(w),
                                     n_iters=n_iters)
        result = np.asarray(out)
        self.poses = [result[k] for k in range(n)]
        return result
