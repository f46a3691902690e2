"""Configuration flag parsing and dataset I/O tests
(reference contracts: default_parameters.h:53-230, interface.h:199-318)."""

import os

import numpy as np
import pytest

from slambench_tpu.config import (
    parse_args, parse_float3, parse_float4, parse_uint3,
)
from slambench_tpu.io.raw import RawWriter, raw_frame_count, read_raw_frame
from slambench_tpu.io.readers import RawDepthReader, make_reader


def test_vector_broadcast_semantics():
    # Reference scalar-broadcast rules (default_parameters.h:155-230).
    assert parse_float3("2.5") == (2.5, 2.5, 2.5)
    assert parse_float3("1,2") == (1.0, 2.0, 2.0)
    assert parse_float3("1,2,3") == (1.0, 2.0, 3.0)
    assert parse_uint3("64") == (64, 64, 64)
    assert parse_float4("481.2,480,320,240") == (481.2, 480.0, 320.0, 240.0)
    assert parse_float4("1,2") == (1.0, 2.0, 2.0, 2.0)


def test_parse_args_defaults_and_flags(tmp_path):
    f = tmp_path / "x.raw"
    f.write_bytes(b"\0" * 16)
    cfg = parse_args(["-i", str(f), "-s", "4.8", "-p", "0.34,0.5,0.24",
                      "-z", "4", "-c", "2", "-r", "1",
                      "-k", "481.2,480,320,240"])
    assert cfg.compute_size_ratio == 2
    assert cfg.volume_size == (4.8, 4.8, 4.8)
    assert cfg.initial_pos_factor == (0.34, 0.5, 0.24)
    assert cfg.rendering_rate == 4
    assert cfg.integration_rate == 1
    assert cfg.camera_overrided
    assert cfg.init_pose == pytest.approx(
        (0.34 * 4.8, 0.5 * 4.8, 0.24 * 4.8))
    # Untouched defaults (reference: default_parameters.h:25-38).
    assert cfg.pyramid == (10, 5, 4)
    assert cfg.mu == 0.1
    assert cfg.icp_threshold == 1e-5
    assert cfg.volume_resolution == (256, 256, 256)


def test_parse_args_validation_accumulates():
    with pytest.raises(SystemExit) as e:
        parse_args(["-c", "3", "-r", "0"])
    assert e.value.code == 1


def test_parse_args_backend_validated():
    for good in ("jnp", "fast", "pallas", "auto"):
        assert parse_args(["--backend", good]).backend == good
    # A typo'd backend must fail loudly, not silently benchmark the
    # wrong thing.
    with pytest.raises(SystemExit):
        parse_args(["--backend", "palas"])


def test_parse_args_blocking_read():
    assert parse_args([]).blocking_read is False
    assert parse_args(["-b"]).blocking_read is True
    assert parse_args(["--blocking-read"]).blocking_read is True


def test_raw_roundtrip(tmp_path):
    path = str(tmp_path / "t.raw")
    frames = [(np.arange(12 * 16) % 4000).astype(np.uint16).reshape(12, 16)
              + i for i in range(3)]
    with RawWriter(path, 16, 12) as w:
        for f in frames:
            w.write(f)
    assert raw_frame_count(path) == 3
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(read_raw_frame(path, i), f)
    assert read_raw_frame(path, 3) is None


def test_raw_reader_sequential(tmp_path):
    path = str(tmp_path / "t.raw")
    with RawWriter(path, 16, 12) as w:
        for i in range(3):
            w.write(np.full((12, 16), i, np.uint16))
    rd = RawDepthReader(path)
    seen = []
    while True:
        d = rd.read_next_depth_frame()
        if d is None:
            break
        seen.append(int(d[0, 0]))
    assert seen == [0, 1, 2]
    rd.restart()
    assert int(rd.read_next_depth_frame()[0, 0]) == 0


def test_make_reader_dispatch(tmp_path, monkeypatch):
    from slambench_tpu.io.readers import NativeBackedRawReader
    path = str(tmp_path / "t.raw")
    with RawWriter(path, 16, 12) as w:
        w.write(np.zeros((12, 16), np.uint16))
    # Native loader preferred when libslamio builds, numpy otherwise.
    r = make_reader(path)
    assert isinstance(r, (RawDepthReader, NativeBackedRawReader))
    # Forcing the pure-numpy reader must work (fallback path).
    monkeypatch.setenv("SLAMBENCH_NATIVE_IO", "0")
    assert isinstance(make_reader(path), RawDepthReader)
    # .scf indirection (reference: reader.cpp:38-170).
    scf = tmp_path / "scene.scf"
    scf.write_text(f'input_file = "t.raw"\n')
    r2 = make_reader(str(scf))
    assert isinstance(r2, RawDepthReader)
    assert make_reader(str(tmp_path / "missing.nope")) is None


def test_native_reader_matches_numpy_reader(tmp_path):
    """The native mmap loader and the numpy reader must produce identical
    frames (interface.h:199-318's contract)."""
    from slambench_tpu.io import native
    if not native.available():
        pytest.skip("libslamio.so not built")
    from slambench_tpu.io.readers import NativeBackedRawReader
    path = str(tmp_path / "t.raw")
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 5000, (12, 16)).astype(np.uint16)
              for _ in range(3)]
    with RawWriter(path, 16, 12) as w:
        for f in frames:
            w.write(f)
    rn = NativeBackedRawReader(path)
    rp = RawDepthReader(path)
    assert rn.get_input_size() == rp.get_input_size()
    for f in frames:
        a, b = rn.read_next_depth_frame(), rp.read_next_depth_frame()
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, f)
    assert rn.read_next_depth_frame() is None


def test_scene_depth_reader(tmp_path):
    # A 640x480 ASCII .depth file of euclidean distances; the reader
    # planarizes (reference: interface.h:182-193).
    from slambench_tpu.io.readers import SceneDepthReader, SCENE_K
    w, h = 640, 480
    d = np.full(w * h, 2.0, np.float32)
    (tmp_path / "scene_00_0000.depth").write_text(
        " ".join("2.0" for _ in range(w * h)))
    rd = SceneDepthReader(str(tmp_path))
    depth = rd.read_next_depth_frame()
    assert depth.shape == (h, w)
    fx, fy, cx, cy = SCENE_K
    # Centre pixel: euclidean == planar.
    assert abs(depth[int(cy), int(cx)] / 1000.0 - 2.0) < 2e-3
    # Corner pixel: planar < euclidean.
    assert depth[0, 0] < 2000
