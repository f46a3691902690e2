"""Render-kernel tests: palette contracts (reference:
kfusion/src/cpp/kernels.cpp:794-913, commons.h:86-147) and the
fast-march render_volume parity (fast/pallas tiers march the shaded
view with the chebyshev-skip raycast; the jnp tier keeps the oracle)."""

import numpy as np
import jax.numpy as jnp

from slambench_tpu import geometry as G
from slambench_tpu.ops.raycast_fast import make_min_mip
from slambench_tpu.ops.render import (
    render_depth, render_normal, render_track, render_volume,
)


def _sphere_volume(res=64, dimv=2.0, center=(1.0, 1.0, 1.4), radius=0.3,
                   mu=0.2):
    c = np.linspace(0.5 * dimv / res, dimv - 0.5 * dimv / res, res)
    Z, Y, X = np.meshgrid(c, c, c, indexing="ij")
    d = np.sqrt((X - center[0]) ** 2 + (Y - center[1]) ** 2
                + (Z - center[2]) ** 2) - radius
    sdf = np.clip(d / mu, -1, 1).astype(np.float32)
    return jnp.asarray(np.trunc(sdf * 32766).astype(np.int16))


def test_render_depth_near_far_clamps():
    # Below near plane -> white, beyond far -> black, in-range -> rainbow
    # (reference: cpp/kernels.cpp:814-842).
    depth = jnp.asarray(np.array([[0.1, 2.0, 9.0]], np.float32))
    img = np.asarray(render_depth(depth, near_plane=0.4, far_plane=4.0))
    assert img.shape == (1, 3, 4) and img.dtype == np.uint8
    assert (img[0, 0, :3] == 255).all()           # near -> white
    assert (img[0, 2, :3] == 0).all()             # far -> black
    mid = img[0, 1, :3]
    assert mid.max() > 0 and not (mid == mid[0]).all()   # a real colour


def test_render_track_code_palette():
    # Result-code palette (reference: cpp/kernels.cpp:853-874).
    codes = jnp.asarray(np.array([[1, -1, -2, -3, -4, -5, 7]], np.int32))
    img = np.asarray(render_track(codes))
    expect = [(128, 128, 128), (0, 0, 0), (255, 0, 0), (0, 255, 0),
              (0, 0, 255), (255, 255, 0), (255, 128, 128)]
    for i, rgb in enumerate(expect):
        assert tuple(img[0, i, :3]) == rgb


def test_render_normal_invalid_black():
    n = np.zeros((3, 2, 2), np.float32)
    n[:, 0, 0] = (0.0, 0.0, 1.0)
    n[0, 1, 1] = -2.0                              # INVALID marker
    img = np.asarray(render_normal(jnp.asarray(n)))
    assert tuple(img[0, 0, :3]) == (128, 128, 255)
    assert (img[1, 1, :3] == 0).all()


def test_render_volume_fast_matches_oracle():
    """The mip-march render must shade the same surface as the oracle
    march: same hit footprint (within a few silhouette pixels) and
    near-identical shading on the common hits."""
    dim = (2.0, 2.0, 2.0)
    tsdf = _sphere_volume()
    mip = make_min_mip(tsdf)
    pose = G.translation_pose([1.0, 1.0, 0.2])
    k = jnp.array([60.0, 60.0, 16.0, 12.0])
    view = G.mat4mul(pose, G.get_inverse_camera_matrix(k))
    args = (dim, view, (24, 32), 0.1, 4.0, 2.0 / 64, 0.15)
    img_o = np.asarray(render_volume(tsdf, *args))
    img_f = np.asarray(render_volume(tsdf, *args, mip=mip))
    h_o = img_o[..., :3].max(axis=-1) > 0
    h_f = img_f[..., :3].max(axis=-1) > 0
    # No oracle hit may be lost (the mip skip is conservative); the fast
    # march may add a handful of grazing hits the oracle's large_step
    # jumps over.
    assert (h_o & ~h_f).sum() <= 2
    m = h_o & h_f
    assert m.sum() > 50
    diff = np.abs(img_o[m, :3].astype(int) - img_f[m, :3].astype(int))
    # Sub-voxel hit agreement -> shading within a few grey levels for
    # the bulk; silhouette-grazing rays may differ more.
    assert np.percentile(diff, 90) <= 8
