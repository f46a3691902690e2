"""Pose-graph / keyframe layer tests (beyond-reference; BASELINE.json
config 5)."""

import numpy as np
import jax.numpy as jnp
import pytest

from slambench_tpu.geometry import se3_exp, se3_log
from slambench_tpu.models.posegraph import (
    PoseGraph, edge_residual, optimize_pose_graph,
)
from slambench_tpu.models.keyframes import KeyframeStore


def _circle_poses(n=12, radius=1.0):
    out = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        x = np.array([radius * np.cos(ang), radius * np.sin(ang), 0,
                      0, 0, ang], np.float32)
        out.append(np.asarray(se3_exp(jnp.asarray(x))))
    return out


def test_se3_log_roundtrip(rng):
    for _ in range(20):
        x = (0.5 * rng.normal(size=6)).astype(np.float32)
        T = se3_exp(jnp.asarray(x))
        x2 = np.asarray(se3_log(T))
        np.testing.assert_allclose(x2, x, atol=1e-4)
    # Small-angle branch.
    x = np.array([0.1, -0.2, 0.3, 1e-7, -1e-7, 1e-7], np.float32)
    np.testing.assert_allclose(np.asarray(se3_log(se3_exp(jnp.asarray(x)))),
                               x, atol=1e-5)


def test_edge_residual_zero_when_consistent():
    gt = _circle_poses()
    Tij = np.linalg.inv(gt[2]) @ gt[3]
    r = np.asarray(edge_residual(jnp.asarray(gt[2]), jnp.asarray(gt[3]),
                                 jnp.asarray(Tij)))
    np.testing.assert_allclose(r, 0.0, atol=1e-5)


def test_loop_closure_removes_drift(rng):
    gt = _circle_poses()
    n = len(gt)
    pg = PoseGraph()
    est = [gt[0]]
    pg.add_pose(gt[0])
    for i in range(1, n):
        rel_true = np.linalg.inv(gt[i - 1]) @ gt[i]
        noise = np.asarray(se3_exp(jnp.asarray(
            (0.03 * rng.normal(size=6)).astype(np.float32))))
        est.append(est[-1] @ rel_true @ noise)
        pg.add_pose(est[-1])
        pg.add_edge(i - 1, i, rel_true, 1.0)
    pg.add_edge(0, n - 1, np.linalg.inv(gt[0]) @ gt[n - 1], 2.0)

    before = np.mean([np.linalg.norm(est[i][:3, 3] - gt[i][:3, 3])
                      for i in range(n)])
    out = pg.optimize(n_iters=15)
    after = np.mean([np.linalg.norm(out[i][:3, 3] - gt[i][:3, 3])
                     for i in range(n)])
    assert after < before * 0.3
    # Rotations must stay orthonormal after optimization.
    for i in range(n):
        R = out[i][:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_padded_edges_are_inert():
    # Zero-weight padding edges must not affect the solution.
    gt = _circle_poses(6)
    poses = jnp.asarray(np.stack(gt))
    ij = np.zeros((8, 2), np.int32)
    T = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    w = np.zeros(8, np.float32)
    for k in range(5):
        ij[k] = (k, k + 1)
        T[k] = np.linalg.inv(gt[k]) @ gt[k + 1]
        w[k] = 1.0
    out, r2 = optimize_pose_graph(poses, jnp.asarray(ij), jnp.asarray(T),
                                  jnp.asarray(w), n_iters=3)
    np.testing.assert_allclose(np.asarray(out), np.stack(gt), atol=1e-3)


def test_keyframe_promotion_policy():
    store = KeyframeStore(trans_threshold=0.1, rot_threshold=0.1)
    p0 = np.eye(4, dtype=np.float32)
    assert store.should_promote(p0)
    v = np.zeros((3, 8, 8), np.float32)
    store.promote(0, p0, v, v)
    # Small motion: no promotion.
    p1 = p0.copy()
    p1[0, 3] = 0.05
    assert not store.should_promote(p1)
    # Large translation: promote.
    p2 = p0.copy()
    p2[0, 3] = 0.2
    assert store.should_promote(p2)
    store.promote(5, p2, v, v)
    # Proximity loop candidates exclude recent keyframes.
    kf = store.keyframes[-1]
    assert store.loop_candidates(kf, min_gap=5) == []
