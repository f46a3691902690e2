"""Geometry substrate tests (reference contract: commons.h:317-412)."""

import numpy as np
import jax.numpy as jnp

from slambench_tpu import geometry as G


def test_camera_matrix_roundtrip():
    k = jnp.array([481.2, 480.0, 320.0, 240.0])
    K = G.get_camera_matrix(k)
    iK = G.get_inverse_camera_matrix(k)
    np.testing.assert_allclose(np.asarray(G.mat4mul(K, iK)), np.eye(4),
                               atol=1e-4)


def test_se3_exp_identity():
    T = G.se3_exp(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-7)


def test_se3_exp_pure_translation():
    T = G.se3_exp(jnp.array([0.1, -0.2, 0.3, 0.0, 0.0, 0.0]))
    expect = np.eye(4, dtype=np.float32)
    expect[:3, 3] = [0.1, -0.2, 0.3]
    np.testing.assert_allclose(np.asarray(T), expect, atol=1e-7)


def test_se3_exp_rotation_matches_rodrigues():
    w = np.array([0.3, -0.1, 0.2], np.float32)
    u = np.array([0.05, 0.02, -0.03], np.float32)
    T = np.asarray(G.se3_exp(jnp.concatenate([jnp.asarray(u),
                                              jnp.asarray(w)])))
    th = np.linalg.norm(w)
    K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    R = np.eye(3) + np.sin(th) / th * K + (1 - np.cos(th)) / th**2 * (K @ K)
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-6)
    # TooN translation: u + B (w x u) + C (w x (w x u))
    A = np.sin(th) / th
    B = (1 - np.cos(th)) / th**2
    C = (1 - A) / th**2
    t = u + B * np.cross(w, u) + C * np.cross(w, np.cross(w, u))
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-6)


def test_se3_exp_small_angle_continuity():
    for scale in (1e-6, 1e-4, 1e-3):
        x = jnp.array([0.01, 0.0, 0.0, scale, 0.0, 0.0])
        T = np.asarray(G.se3_exp(x))
        assert np.isfinite(T).all()
        np.testing.assert_allclose(T[:3, :3] @ T[:3, :3].T, np.eye(3),
                                   atol=1e-6)


def test_rigid_inverse():
    T = np.asarray(G.se3_exp(jnp.array([0.4, -0.1, 0.2, 0.3, 0.2, -0.1])))
    Ti = np.asarray(G.rigid_inverse(jnp.asarray(T)))
    np.testing.assert_allclose(T @ Ti, np.eye(4), atol=1e-6)


def test_make_jtj_symmetry():
    tri = jnp.arange(21, dtype=jnp.float32) + 1
    C = np.asarray(G.make_jtj(tri))
    np.testing.assert_allclose(C, C.T)
    # Row-major upper-triangle packing (reference: commons.h:380-395).
    assert C[0, 0] == 1 and C[0, 5] == 6 and C[1, 1] == 7 and C[5, 5] == 21


def test_solve_normal_equations_matches_lstsq(rng):
    Jr = rng.normal(size=(100, 6)).astype(np.float32)
    e = rng.normal(size=100).astype(np.float32)
    C = Jr.T @ Jr
    b = Jr.T @ e
    packed = np.concatenate([b, C[np.triu_indices(6)]]).astype(np.float32)
    x = np.asarray(G.solve_normal_equations(jnp.asarray(packed)))
    expect = np.linalg.solve(C, b)
    np.testing.assert_allclose(x, expect, rtol=1e-3, atol=1e-4)


def test_solve_normal_equations_zero_system():
    x = np.asarray(G.solve_normal_equations(jnp.zeros(27)))
    np.testing.assert_allclose(x, np.zeros(6))


def test_solve_normal_equations_rank_deficient():
    # A rank-1 JTJ: the 1e6 condition clamp must zero the null directions
    # instead of exploding (reference: commons.h:398-404).
    j = np.array([1.0, 2, 3, 4, 5, 6], np.float32)
    C = np.outer(j, j)
    b = j * 2.0
    packed = np.concatenate([b, C[np.triu_indices(6)]]).astype(np.float32)
    x = np.asarray(G.solve_normal_equations(jnp.asarray(packed)))
    assert np.isfinite(x).all()
    # Minimum-norm solution of the rank-1 system: x = 2 j / |j|^2.
    np.testing.assert_allclose(x, 2 * j / np.dot(j, j), atol=1e-5)


def test_transform_and_rotate(rng):
    M = np.asarray(G.se3_exp(jnp.array([0.4, -0.1, 0.2, 0.3, 0.2, -0.1])))
    v = rng.normal(size=(3, 4, 5)).astype(np.float32)
    out = np.asarray(G.transform(jnp.asarray(M), jnp.asarray(v)))
    expect = np.einsum("ij,jhw->ihw", M[:3, :3], v) + M[:3, 3, None, None]
    np.testing.assert_allclose(out, expect, atol=1e-6)
    rot = np.asarray(G.rotate(jnp.asarray(M), jnp.asarray(v)))
    np.testing.assert_allclose(rot, np.einsum("ij,jhw->ihw", M[:3, :3], v),
                               atol=1e-6)
