"""scene2raw converter: ICL-NUIM scene fixture -> RAW byte semantics.

The reference converter (reference: kfusion/thirdparty/scene2raw.cpp:
76-187) reads ASCII ``.depth`` files of euclidean ray lengths (metres),
undoes the euclidean->planar conversion with the ICL-NUIM intrinsics
(scene2raw.cpp:97-109, the same maths as the scene reader,
interface.h:182-193), truncates to millimetre uint16 and streams
``[w,h]+depth+[w,h]+rgb`` records. These tests synthesize a 3-frame
scene directory (no network egress — real ICL bytes are unreachable),
run the converter through BOTH parser paths (native libslamio and the
numpy fallback), read the container back with RawDepthReader, and check
the planarization against an independent per-pixel double-precision
implementation of scene2raw.cpp:97-109.
"""

import math
import os

import numpy as np
import pytest

from slambench_tpu.io import native
from slambench_tpu.io.raw import frame_nbytes, raw_frame_count
from slambench_tpu.io.readers import (
    RawDepthReader, SceneDepthReader, SCENE_K, SCENE_SIZE,
)
from slambench_tpu.tools import scene2raw

W, H = SCENE_SIZE
N_FRAMES = 3


def _make_scene_dir(tmp_path):
    """ASCII .depth euclidean-ray frames + PNG color frames, shaped like
    an ICL-NUIM scene directory."""
    rng = np.random.default_rng(7)
    u = np.arange(W, dtype=np.float64)[None, :]
    v = np.arange(H, dtype=np.float64)[:, None]
    euclids = []
    for f in range(N_FRAMES):
        # Smooth scene-like field, 1.5..3.5 m euclidean ray lengths.
        euclid = (2.5 + 0.8 * np.sin(u / 97.0 + f)
                  * np.cos(v / 61.0 - 0.3 * f))
        # A few zero rays (ICL files contain invalid pixels).
        euclid[(u + v + f * 11) % 197 == 0] = 0.0
        euclids.append(euclid)
        with open(tmp_path / ("scene_00_%04d.depth" % f), "w") as fh:
            np.savetxt(fh, euclid, fmt="%.6f", newline="\n")
        rgb = rng.integers(0, 256, (H, W, 3), np.uint8)
        try:
            from PIL import Image
            Image.fromarray(rgb).save(tmp_path / ("scene_00_%04d.png" % f))
        except ImportError:
            pass
    return euclids


def _independent_planar_mm(euclid, pixels):
    """Per-pixel double-precision re-derivation of scene2raw.cpp:97-109:
    mm = euclid*1000 / sqrt(((u-u0)/fx)^2 + ((v-v0)/fy)^2 + 1), C
    truncation to ushort. Returns the expected uint16 at each (v, u)."""
    fx, fy, cx, cy = SCENE_K
    out = []
    for (vv, uu) in pixels:
        ux = (uu - cx) / fx
        vy = (vv - cy) / fy
        mm = euclid[vv, uu] * 1000.0 / math.sqrt(ux * ux + vy * vy + 1.0)
        out.append(int(min(max(mm, 0.0), 65535.0)))
    return np.asarray(out, np.int64)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("icl_scene")
    euclids = _make_scene_dir(d)
    return d, euclids


def _convert_and_check(scene_dir, euclids, out_path):
    n = scene2raw.convert(str(scene_dir), str(out_path), verbose=False)
    assert n == N_FRAMES
    assert raw_frame_count(str(out_path)) == N_FRAMES
    # Container layout is the fixed-size reference record
    # (interface.h:241-284): [w,h] u32 header leads every frame.
    assert os.path.getsize(out_path) == N_FRAMES * frame_nbytes(W, H)
    with open(out_path, "rb") as f:
        w0, h0 = np.frombuffer(f.read(8), "<u4")
    assert (int(w0), int(h0)) == (W, H)

    rd = RawDepthReader(str(out_path))
    assert rd.get_input_size() == (W, H)
    rng = np.random.default_rng(3)
    pixels = list(zip(rng.integers(0, H, 400), rng.integers(0, W, 400)))
    depths = []
    for f in range(N_FRAMES):
        depth = rd.read_next_depth_frame()
        assert depth is not None and depth.shape == (H, W)
        depths.append(depth)
        expected = _independent_planar_mm(euclids[f], pixels)
        got = np.asarray([int(depth[vv, uu]) for vv, uu in pixels])
        # f32 converter vs f64 oracle: truncation can flip by 1 LSB at
        # millimetre boundaries, never more.
        assert np.max(np.abs(got - expected)) <= 1
        assert np.mean(got == expected) > 0.95
    assert rd.read_next_depth_frame() is None
    return depths


def test_numpy_path_roundtrip(scene, tmp_path, monkeypatch):
    scene_dir, euclids = scene
    monkeypatch.setattr(scene2raw.native, "available", lambda: False)
    depths = _convert_and_check(scene_dir, euclids, tmp_path / "np.raw")
    # Zero rays stay zero (no bogus planarization of invalid pixels).
    assert (depths[0][np.asarray(euclids[0]) == 0.0] == 0).all()


@pytest.mark.skipif(not native.available(),
                    reason="native libslamio not built")
def test_native_path_roundtrip(scene, tmp_path, monkeypatch):
    scene_dir, euclids = scene
    d_nat = _convert_and_check(scene_dir, euclids, tmp_path / "nat.raw")
    monkeypatch.setattr(scene2raw.native, "available", lambda: False)
    d_np = _convert_and_check(scene_dir, euclids, tmp_path / "np.raw")
    for a, b in zip(d_nat, d_np):
        # Same f32 inputs, different op order (divide-by-sqrt vs
        # multiply-by-rsqrt): at most 1 LSB apart after truncation.
        assert np.max(np.abs(a.astype(np.int64) - b.astype(np.int64))) <= 1
        assert np.mean(a == b) > 0.999


def test_rgb_roundtrip(scene, tmp_path):
    pytest.importorskip("PIL")
    scene_dir, _ = scene
    from slambench_tpu.io.raw import read_raw_frame
    from PIL import Image
    out = tmp_path / "rgb.raw"
    scene2raw.convert(str(scene_dir), str(out), verbose=False)
    _, rgb = read_raw_frame(str(out), 1, want_rgb=True)
    src = np.asarray(Image.open(
        scene_dir / "scene_00_0001.png").convert("RGB"))
    np.testing.assert_array_equal(rgb, src)


def test_scene_reader_agrees_with_converter(scene, tmp_path, monkeypatch):
    """The direct scene-directory reader (interface.h:99-197 equivalent)
    and the scene2raw->RAW route produce the same millimetre frames —
    the reference guarantees this by sharing the planarization maths."""
    scene_dir, _ = scene
    monkeypatch.setattr(scene2raw.native, "available", lambda: False)
    out = tmp_path / "cmp.raw"
    scene2raw.convert(str(scene_dir), str(out), verbose=False)
    sr = SceneDepthReader(str(scene_dir))
    rr = RawDepthReader(str(out))
    for _ in range(N_FRAMES):
        a = sr.read_next_depth_frame()
        b = rr.read_next_depth_frame()
        assert np.max(np.abs(a.astype(np.int64) - b.astype(np.int64))) <= 1
        assert np.mean(a == b) > 0.999
