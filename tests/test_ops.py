"""Kernel-contract tests: vectorized jnp ops vs the straight-line NumPy
oracle (the reference's cross-backend comparison pattern,
reference: commons.h:414-518)."""

import numpy as np
import jax.numpy as jnp
import pytest

from slambench_tpu import geometry as G
from slambench_tpu.ops import preprocess as P
from slambench_tpu.ops import vertex as V
from slambench_tpu.ops.track import reduce_track, track
from slambench_tpu.ops.integrate import integrate
from slambench_tpu.volume import init_volume, interp, pack_tsdf

import reference_impl as ref


@pytest.fixture(scope="module")
def depth_image(rng=np.random.default_rng(7)):
    """A structured small depth image with holes and a step edge."""
    H, W = 24, 32
    d = 1.5 + 0.2 * np.sin(np.linspace(0, 3, W))[None, :] \
        + 0.1 * np.cos(np.linspace(0, 2, H))[:, None]
    d = d.astype(np.float32)
    d[5:9, 5:9] = 0.0                 # hole
    d[12:, 20:] += 0.8                # depth discontinuity
    return d


def test_mm2meters():
    raw = (np.arange(48 * 64) % 5000).astype(np.uint16).reshape(48, 64)
    out = np.asarray(P.mm2meters(jnp.asarray(raw), 2))
    np.testing.assert_allclose(out, raw[::2, ::2] / 1000.0, rtol=1e-6)
    assert out.shape == (24, 32)


def test_bilateral_filter_matches_oracle(depth_image):
    g = P.make_gaussian()
    got = np.asarray(P.bilateral_filter(jnp.asarray(depth_image),
                                        jnp.asarray(g)))
    want = ref.bilateral_filter(depth_image, g, 0.1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_half_sample_matches_oracle(depth_image):
    got = np.asarray(P.half_sample_robust(jnp.asarray(depth_image), 0.3, 1))
    want = ref.half_sample_robust(depth_image, 0.3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_depth2vertex_matches_oracle(depth_image):
    k = jnp.array([100.0, 100.0, 16.0, 12.0])
    iK = G.get_inverse_camera_matrix(k)
    got = np.asarray(V.depth2vertex(jnp.asarray(depth_image), iK))
    want = ref.depth2vertex(depth_image, np.asarray(iK))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_vertex2normal_matches_oracle(depth_image):
    k = jnp.array([100.0, 100.0, 16.0, 12.0])
    iK = G.get_inverse_camera_matrix(k)
    vert = V.depth2vertex(jnp.asarray(depth_image), iK)
    got = np.asarray(V.vertex2normal(vert))
    want = ref.vertex2normal(np.asarray(vert))
    inv_got = got[0] == ref.INVALID
    inv_want = want[0] == ref.INVALID
    np.testing.assert_array_equal(inv_got, inv_want)
    m = ~inv_want
    np.testing.assert_allclose(got[:, m], want[:, m], rtol=1e-4, atol=1e-5)


def _make_track_inputs(depth_image):
    k = jnp.array([100.0, 100.0, 16.0, 12.0])
    iK = G.get_inverse_camera_matrix(k)
    vert = V.depth2vertex(jnp.asarray(depth_image), iK)
    norm = V.vertex2normal(vert)
    pose = G.se3_exp(jnp.array([0.01, -0.005, 0.008, 0.004, -0.003, 0.002]))
    # Reference maps: the same geometry seen from the identity pose.
    ref_vert = V.depth2vertex(jnp.asarray(depth_image), iK)
    ref_norm = V.vertex2normal(ref_vert)
    view = G.mat4mul(G.get_camera_matrix(k),
                     G.rigid_inverse(jnp.eye(4)))
    return vert, norm, ref_vert, ref_norm, pose, view


def test_track_matches_oracle(depth_image):
    vert, norm, rv, rn, pose, view = _make_track_inputs(depth_image)
    data = track(vert, norm, rv, rn, pose, view)
    res_w, err_w, J_w = ref.track(
        np.asarray(vert), np.asarray(norm), np.asarray(rv), np.asarray(rn),
        np.asarray(pose), np.asarray(view), 0.1, 0.8)
    np.testing.assert_array_equal(np.asarray(data["result"]), res_w)
    m = res_w >= 1
    np.testing.assert_allclose(np.asarray(data["error"])[m], err_w[m],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(data["J"])[:, m], J_w[:, m],
                               rtol=1e-4, atol=1e-5)
    assert m.sum() > 50  # the test scene must actually exercise the math


def test_reduce_matches_oracle(depth_image):
    vert, norm, rv, rn, pose, view = _make_track_inputs(depth_image)
    data = track(vert, norm, rv, rn, pose, view)
    got = np.asarray(reduce_track(data))
    want = ref.reduce_track(np.asarray(data["result"]),
                            np.asarray(data["error"]),
                            np.asarray(data["J"]))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_integrate_matches_oracle(depth_image):
    res = (16, 16, 16)
    dim = (2.0, 2.0, 2.0)
    tsdf, weight = init_volume(res)
    k = jnp.array([100.0, 100.0, 16.0, 12.0])
    K = G.get_camera_matrix(k)
    pose = G.translation_pose([1.0, 1.0, 0.0])
    inv_pose = G.rigid_inverse(pose)
    got_t, got_w = integrate(tsdf, weight, jnp.asarray(depth_image),
                             inv_pose, K, 0.1, 100.0, dim)
    want_t, want_w = ref.integrate(
        np.asarray(tsdf), np.asarray(weight), depth_image,
        np.asarray(inv_pose), np.asarray(K), 0.1, 100.0, dim)
    assert (np.asarray(got_w) > 0).sum() == (want_w > 0).sum()
    np.testing.assert_array_equal(np.asarray(got_w), want_w)
    # int16 truncation boundary: allow 1 lsb of drift from f32 assoc. order
    assert np.abs(np.asarray(got_t).astype(np.int32)
                  - want_t.astype(np.int32)).max() <= 1


def test_integrate_weight_cap(depth_image):
    res = (8, 8, 8)
    tsdf, weight = init_volume(res)
    k = jnp.array([100.0, 100.0, 16.0, 12.0])
    K = G.get_camera_matrix(k)
    inv_pose = G.rigid_inverse(G.translation_pose([1.0, 1.0, 0.0]))
    for _ in range(5):
        tsdf, weight = integrate(tsdf, weight, jnp.asarray(depth_image),
                                 inv_pose, K, 0.1, 3.0, (2.0, 2.0, 2.0))
    assert np.asarray(weight).max() <= 3


def test_interp_matches_oracle(rng):
    tsdf = (rng.normal(size=(8, 8, 8)) * 1000).astype(np.int16)
    dim = (2.0, 2.0, 2.0)
    pts = rng.uniform(0.1, 1.9, size=(3, 20)).astype(np.float32)
    got = np.asarray(interp(jnp.asarray(tsdf), dim, jnp.asarray(pts)))
    for i in range(20):
        want = ref.interp(tsdf, dim, pts[:, i])
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-6)


def test_pack_tsdf_truncates_toward_zero():
    vals = jnp.array([0.9999, -0.9999, 0.5, -0.5, 1.0, -1.0])
    got = np.asarray(pack_tsdf(vals))
    want = np.trunc(np.asarray(vals) * 32766.0).astype(np.int16)
    np.testing.assert_array_equal(got, want)


def test_integrate_blocks_matches_monolithic():
    """Frustum-culled block integration (ops/integrate.integrate_blocks)
    vs the monolithic op, across poses that exercise partial/total culls.

    Contract (same as the oracle contract above): identical weights,
    tsdf within 1 int16 LSB on a <0.1% knife-edge fraction — XLA's FMA
    contraction differs inside the block loop, the same drift class as
    the reference's C++-vs-CUDA backends."""
    from slambench_tpu.ops.integrate import block_visibility, integrate_blocks
    from slambench_tpu import params

    rng = np.random.default_rng(3)
    V3 = 64
    H, W = 24, 32
    tsdf = jnp.asarray(rng.integers(-32766, 32767, (V3,) * 3).astype(np.int16))
    weight = jnp.asarray(rng.integers(0, 100, (V3,) * 3).astype(np.int8))
    depth = jnp.asarray((rng.random((H, W)) * 4).astype(np.float32))
    depth = depth.at[5:9, 5:9].set(0.0)
    K = G.get_camera_matrix(jnp.array([30.0, 30.0, 16.0, 12.0]))
    dim = (4.8, 4.8, 4.8)

    th = 0.7
    rot = np.eye(4, dtype=np.float32)
    rot[:3, :3] = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                            [-np.sin(th), 0, np.cos(th)]], np.float32)
    rot[:3, 3] = [1.0, 2.0, 1.0]
    poses = {
        "corner": G.translation_pose([0.3, 0.3, 0.1]),
        "outside": G.translation_pose([2.4, 2.4, 6.0]),  # behind the far wall
        "rotated": jnp.asarray(rot),
    }
    for name, pose in poses.items():
        inv = G.rigid_inverse(pose)
        t1, w1 = map(np.asarray, integrate(
            tsdf, weight, depth, inv, K, 0.1, params.MAX_WEIGHT, dim))
        for nz, ny, nx in ((8, 8, 1), (4, 4, 1), (8, 8, 2), (4, 4, 4)):
            vis = np.asarray(block_visibility(nz, ny, dim, inv, K, depth,
                                              0.1, n_x=nx))
            t2, w2 = map(np.asarray, integrate_blocks(
                tsdf, weight, depth, inv, K, 0.1, params.MAX_WEIGHT, dim,
                n_z=nz, n_y=ny, n_x=nx))
            assert (w1 == w2).all(), f"{name} {nz}x{ny}x{nx}: weights differ"
            d = np.abs(t1.astype(np.int32) - t2.astype(np.int32))
            assert d.max() <= 1, f"{name} {nz}x{ny}x{nx}: max lsb {d.max()}"
            assert (d > 0).mean() < 1e-3, f"{name} {nz}x{ny}x{nx}"
            if name == "outside":
                assert vis.sum() == 0      # total cull => untouched volume
                assert (t1 == np.asarray(tsdf)).all()
            else:
                # the cull must actually remove blocks for these poses
                assert 0 < vis.sum() < vis.size
