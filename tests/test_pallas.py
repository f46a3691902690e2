"""Pallas kernels vs the jnp oracle (interpret mode on CPU; the same
calls compile on TPU). The cross-backend epsilon-comparison pattern of
the reference (commons.h:414-518)."""

import numpy as np
import jax.numpy as jnp
import pytest

from slambench_tpu import geometry as G
from slambench_tpu.ops.preprocess import bilateral_filter, make_gaussian
from slambench_tpu.ops.track import reduce_track, track
from slambench_tpu.ops.vertex import depth2vertex, vertex2normal
from slambench_tpu.ops.pallas.bilateral import bilateral_filter_pallas
from slambench_tpu.ops.pallas.reduce import reduce_track_pallas


@pytest.fixture(scope="module")
def depth_image():
    rng = np.random.default_rng(11)
    H, W = 48, 128
    d = (1.5 + 0.3 * rng.normal(size=(H, W))).astype(np.float32)
    d[d < 1.0] = 0.0
    d[10:14, 40:60] = 0.0
    return d


def test_pallas_bilateral_matches_oracle(depth_image):
    g = make_gaussian()
    want = np.asarray(bilateral_filter(jnp.asarray(depth_image),
                                       jnp.asarray(g)))
    got = np.asarray(bilateral_filter_pallas(jnp.asarray(depth_image), g,
                                             interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_reduce_matches_oracle(depth_image):
    k = jnp.array([100.0, 100.0, 64.0, 24.0])
    iK = G.get_inverse_camera_matrix(k)
    vert = depth2vertex(jnp.asarray(depth_image), iK)
    norm = vertex2normal(vert)
    pose = G.se3_exp(jnp.array([0.01, -0.005, 0.008, 0.004, -0.003, 0.002]))
    view = G.get_camera_matrix(k)
    data = track(vert, norm, vert, norm, pose, view)

    want = np.asarray(reduce_track(data))
    got = np.asarray(reduce_track_pallas(data, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_pallas_reduce_handles_padding():
    # Non-multiple-of-tile pixel counts must pad inertly (result -1).
    h, w = 13, 17
    data = {
        "result": jnp.ones((h, w), jnp.int32),
        "error": jnp.full((h, w), 0.5, jnp.float32),
        "J": jnp.ones((6, h, w), jnp.float32),
    }
    got = np.asarray(reduce_track_pallas(data, interpret=True))
    want = np.asarray(reduce_track(data))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    assert got[28] == h * w


def test_pallas_reduce_tile_rows_invariance():
    # The tuning knob (tools/autotune; SLAMBENCH_TILE_ROWS) must not
    # change results — only the grid decomposition.
    rng = np.random.default_rng(3)
    h, w = 96, 128
    data = {
        "result": jnp.asarray(rng.choice(
            [1, -1, -2, -4, -5], size=(h, w)).astype(np.int32)),
        "error": jnp.asarray(rng.standard_normal((h, w)).astype(np.float32)),
        "J": jnp.asarray(rng.standard_normal((6, h, w)).astype(np.float32)),
    }
    base = np.asarray(reduce_track_pallas(data, interpret=True))
    for tile in (256, 1024, 4096):
        got = np.asarray(reduce_track_pallas(data, interpret=True,
                                             tile_rows=tile))
        np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-4)
