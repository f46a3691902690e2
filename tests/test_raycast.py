"""Raycast tests against analytic geometry."""

import numpy as np
import jax.numpy as jnp

from slambench_tpu import geometry as G
from slambench_tpu.volume import pack_tsdf
from slambench_tpu.ops.raycast import raycast, raycast_maps


def _sphere_volume(res=32, dim=2.0, center=(1.0, 1.0, 1.4), radius=0.3,
                   mu=0.2):
    """A truncated-SDF sphere baked into an int16 volume."""
    c = np.linspace(0.5 * dim / res, dim - 0.5 * dim / res, res)
    Z, Y, X = np.meshgrid(c, c, c, indexing="ij")
    d = np.sqrt((X - center[0]) ** 2 + (Y - center[1]) ** 2
                + (Z - center[2]) ** 2) - radius
    sdf = np.clip(d / mu, -1.0, 1.0).astype(np.float32)
    return jnp.asarray(np.trunc(sdf * 32766.0).astype(np.int16))


def test_raycast_hits_sphere_at_analytic_distance():
    dim = (2.0, 2.0, 2.0)
    tsdf = _sphere_volume()
    # Camera at the volume centre front, looking straight down +z.
    pose = G.translation_pose([1.0, 1.0, 0.2])
    k = jnp.array([60.0, 60.0, 16.0, 12.0])
    view = G.mat4mul(pose, G.get_inverse_camera_matrix(k))
    vertex, normal = raycast_maps(tsdf, dim, view, (24, 32),
                                  near_plane=0.1, far_plane=4.0,
                                  step=2.0 / 32, large_step=0.15)
    # Central pixel ray: start (1,1,0.2) toward +z; sphere front face at
    # z = 1.4 - 0.3 = 1.1, i.e. distance 0.9.
    cz = np.asarray(vertex[2, 12, 16])
    assert abs(cz - 1.1) < 0.02, cz
    # Normal at the front pole points back toward the camera (-z).
    n = np.asarray(normal[:, 12, 16])
    assert n[2] < -0.9, n


def test_raycast_miss_marks_invalid():
    dim = (2.0, 2.0, 2.0)
    tsdf = _sphere_volume()
    pose = G.translation_pose([1.0, 1.0, 0.2])
    k = jnp.array([60.0, 60.0, 16.0, 12.0])
    view = G.mat4mul(pose, G.get_inverse_camera_matrix(k))
    vertex, normal = raycast_maps(tsdf, dim, view, (24, 32),
                                  near_plane=0.1, far_plane=4.0,
                                  step=2.0 / 32, large_step=0.15)
    # Corner rays miss the sphere: vertex 0, normal INVALID.
    assert np.asarray(normal[0, 0, 0]) == -2.0
    np.testing.assert_allclose(np.asarray(vertex[:, 0, 0]), 0.0)


def test_raycast_from_inside_surface_returns_no_hit():
    """Rays starting where TSDF <= 0 must not report a hit
    (reference: cpp/kernels.cpp:708 'if we were already in it')."""
    dim = (2.0, 2.0, 2.0)
    tsdf = _sphere_volume(center=(1.0, 1.0, 0.25), radius=0.4)
    pose = G.translation_pose([1.0, 1.0, 0.2])  # inside the sphere
    k = jnp.array([60.0, 60.0, 16.0, 12.0])
    view = G.mat4mul(pose, G.get_inverse_camera_matrix(k))
    _, t_hit = raycast(tsdf, dim, view, (8, 8), 0.01, 4.0, 2.0 / 32, 0.15)
    assert float(np.asarray(t_hit[4, 4])) == 0.0
