"""Tests for the live dashboard (Qt-GUI analogue) and the xprof trace
converter (nvprof2log analogue)."""

import gzip
import io
import json
import os
import struct
import threading
import urllib.error
import urllib.request
import zlib

import numpy as np
import pytest

from slambench_tpu.frontend.dashboard import (
    CLOSED, PAUSED, RUNNING, DashboardState, compose_tile, encode_png,
    load_rc, save_rc, serve)
from slambench_tpu.eval.check_kernels import aggregate_kernel_log
from slambench_tpu.eval import xprof2log


# --- PNG encoder -------------------------------------------------------

def test_encode_png_roundtrip_header_and_pixels():
    rgb = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    png = encode_png(rgb)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", png[16:24])
    assert (w, h) == (7, 5)
    # Decode the IDAT payload and undo the per-row filter-0 bytes.
    idat_start = png.index(b"IDAT") + 4
    idat_len = struct.unpack(">I", png[idat_start - 8:idat_start - 4])[0]
    raw = zlib.decompress(png[idat_start:idat_start + idat_len])
    rows = [raw[y * (1 + 7 * 3) + 1:(y + 1) * (1 + 7 * 3)]
            for y in range(5)]
    got = np.frombuffer(b"".join(rows), np.uint8).reshape(5, 7, 3)
    np.testing.assert_array_equal(got, rgb)


def test_compose_tile_layout():
    h, w = 4, 6
    mk = lambda v: np.full((h, w, 3), v, np.uint8)
    grid = compose_tile(mk(10), mk(20), mk(30), raw_rgb=mk(40))
    assert grid.shape == (2 * h, 2 * w, 3)
    assert grid[0, 0, 0] == 40 and grid[0, w, 0] == 10
    assert grid[h, 0, 0] == 20 and grid[h, w, 0] == 30


# --- camera state machine (reference: qt/MainWindow.h:40-42) ----------

def test_state_machine_pause_step_resume():
    s = DashboardState()
    assert s.wait_if_paused() == RUNNING
    s.control("pause")
    s.control("step")
    assert s.wait_if_paused(poll_s=0.001) == "STEP"   # one credit
    s.control("resume")
    assert s.wait_if_paused() == RUNNING
    s.control("quit")
    assert s.wait_if_paused() == CLOSED


def test_breakpoints_pause_the_run():
    s = DashboardState()
    s.control("break_frame", "5")
    s.publish(4, True, True, (0, 0, 0), {}, None)
    assert s.snapshot()["mode"] == RUNNING
    s.publish(5, True, True, (0, 0, 0), {}, None)
    snap = s.snapshot()
    assert snap["mode"] == PAUSED and snap["break_at_frame"] is None
    s.control("resume")
    s.control("break_untracked", "1")
    s.publish(6, False, False, (0, 0, 0), {}, None)
    assert s.snapshot()["mode"] == PAUSED


def test_reset_clears_series():
    s = DashboardState()
    s.publish(0, True, True, (1, 2, 3), {"fps": 2.0}, None)
    s.control("reset")
    assert s.take_reset() is True
    assert s.snapshot()["series"]["fps"] == []
    assert s.take_reset() is False


# --- HTTP surface ------------------------------------------------------

def test_http_endpoints_serve_state_and_controls():
    s = DashboardState()
    tile = encode_png(np.zeros((2, 2, 3), np.uint8))
    s.publish(7, True, False, (0.1, 0.2, 0.3), {"fps": 1.5}, tile)
    httpd = serve(s, port=0)
    port = httpd.server_address[1]
    try:
        base = f"http://127.0.0.1:{port}"
        stats = json.loads(urllib.request.urlopen(
            base + "/stats.json", timeout=5).read())
        assert stats["frame"] == 7 and stats["series"]["fps"] == [1.5]
        png = urllib.request.urlopen(base + "/tile.png", timeout=5).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        # Mutations need the per-run CSRF token (embedded in the page).
        html = urllib.request.urlopen(base + "/", timeout=5).read()
        assert b"dashboard" in html and s.token.encode() in html
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(base + "/control?cmd=pause", timeout=5)
        assert e.value.code == 403
        body = urllib.request.urlopen(
            base + f"/control?cmd=pause&token={s.token}", timeout=5).read()
        assert body == b"PAUSED"
    finally:
        httpd.shutdown()


def test_http_reconfig_endpoint_queues_changes():
    """Runtime parameter reconfiguration (the reference's Qt dropdown
    rebuild, qt/SlamBenchQt.cpp:347-362) over HTTP."""
    s = DashboardState()
    httpd = serve(s, port=0)
    port = httpd.server_address[1]
    try:
        base = f"http://127.0.0.1:{port}"
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(
                base + "/reconfig?volume_resolution=128", timeout=5)
        assert e.value.code == 403
        body = urllib.request.urlopen(
            base + f"/reconfig?volume_resolution=128&integration_rate=3"
                   f"&token={s.token}", timeout=5).read()
        assert body == b"RECONFIG"
        assert s.take_reconfig() == {"volume_resolution": "128",
                                     "integration_rate": "3"}
        assert s.take_reconfig() is None
    finally:
        httpd.shutdown()


def test_series_history_is_bounded():
    s = DashboardState()
    for i in range(DashboardState.MAX_POINTS + 50):
        s.publish(i, True, True, (0, 0, 0), {"fps": float(i)}, None)
    assert len(s.series["fps"]) == DashboardState.MAX_POINTS
    assert s.series["fps"][-1] == float(DashboardState.MAX_POINTS + 49)


def test_http_mesh_endpoint():
    """Live /mesh.ply export of the current reconstruction (beyond the
    reference's Qt GUI; mesh bytes come from tools/mesh_export)."""
    import numpy as np

    from slambench_tpu.tools.mesh_export import ply_bytes, surface_nets

    s = DashboardState()
    httpd = serve(s, port=0)
    port = httpd.server_address[1]
    try:
        base = f"http://127.0.0.1:{port}"
        # No provider yet: 503, not a crash.
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(base + "/mesh.ply", timeout=5)
        assert e.value.code == 503

        i = (np.arange(24) + 0.5) / 24
        z, y, x = np.meshgrid(i, i, i, indexing="ij")
        vol = np.clip((np.sqrt((x - .5) ** 2 + (y - .5) ** 2
                               + (z - .5) ** 2) - 0.3) * 6, -1, 1)
        s.mesh_provider = lambda: ply_bytes(
            *surface_nets(vol.astype(np.float32), dim=(2.0,) * 3))
        body = urllib.request.urlopen(base + "/mesh.ply", timeout=5).read()
        assert body.startswith(b"ply\nformat binary_little_endian")
        assert b"element face" in body[:200]
    finally:
        httpd.shutdown()


# --- rc persistence (reference: .kfusion_kinectrc) ---------------------

def test_rc_save_load_roundtrip(tmp_path):
    rc = str(tmp_path / "rc")
    argv = ["-i", "scene.raw", "-c", "2"]
    save_rc(argv, rc)
    assert load_rc(rc) == argv
    assert load_rc(str(tmp_path / "missing")) is None


# --- xprof2log (reference: thirdparty/nvprof2log.py) -------------------

def _fake_trace():
    return {"traceEvents": [
        {"ph": "M", "name": "process_name", "pid": 3,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 9,
         "args": {"name": "python host"}},
        {"ph": "X", "pid": 3, "name": "fusion.123", "dur": 250.0},
        {"ph": "X", "pid": 3, "name": "copy.4", "dur": 10.5},
        {"ph": "X", "pid": 9, "name": "hostframe", "dur": 9999.0},
        {"ph": "B", "pid": 3, "name": "notcomplete"},
    ]}


def test_xprof2log_device_filter_and_units(tmp_path):
    run = tmp_path / "plugins" / "profile" / "run1"
    run.mkdir(parents=True)
    with gzip.open(run / "host.trace.json.gz", "wt") as f:
        json.dump(_fake_trace(), f)
    out = io.StringIO()
    n = xprof2log.convert(str(tmp_path), out=out)
    lines = out.getvalue().strip().splitlines()
    assert n == 2 and len(lines) == 2
    names = {l.split()[0] for l in lines}
    assert names == {"fusion.123", "copy.4"}
    durs = {l.split()[0]: float(l.split()[1]) for l in lines}
    assert durs["fusion.123"] == pytest.approx(250e3)   # us -> ns

    # The emitted stream feeds check_kernels unchanged.
    agg = aggregate_kernel_log(lines)
    assert agg["fusion.123"][0] == pytest.approx(250e3)


def test_xprof2log_falls_back_without_device_metadata(tmp_path):
    trace = {"traceEvents": [
        {"ph": "X", "pid": 1, "name": "k", "dur": 1.0}]}
    p = tmp_path / "t.trace.json"
    p.write_text(json.dumps(trace))
    out = io.StringIO()
    assert xprof2log.convert(str(p), out=out) == 1


def test_kernel_timings_xprof_route(tmp_path, capsys):
    """KERNEL_TIMINGS=xprof on the fused tier: a trace window is
    captured mid-run and converted to the checkKernels stderr contract.
    On the CPU backend there are no device lanes, so the route must
    emit its explanatory notice instead of a megaline host dump
    (reference contract: the nvprof route, Makefile:67-72)."""
    from slambench_tpu.config import Configuration
    from slambench_tpu.frontend import benchmark as fb
    from slambench_tpu.io.synthetic import generate_dataset

    man = generate_dataset(str(tmp_path / "d"), n_frames=12,
                           image_size=(160, 120), dim=(4.8,) * 3,
                           amp=0.15)
    cfg = Configuration()
    cfg.input_file = man["raw"]
    cfg.log_file = str(tmp_path / "x.log")
    cfg.volume_resolution = (32, 32, 32)
    cfg.volume_size = man["dim"]
    cfg.initial_pos_factor = man["init_pos_factor"]
    cfg.camera = man["camera"]
    cfg.camera_overrided = True
    cfg.pyramid = (3, 2, 2)
    os.environ["KERNEL_TIMINGS"] = "xprof"
    try:
        summary = fb.run(cfg, fused=True, max_frames=12, quiet=True)
    finally:
        del os.environ["KERNEL_TIMINGS"]
    assert summary["frames"] == 12
    err = capsys.readouterr().err
    assert "xprof kernel attribution" in err
    # CPU backend: the no-device-lanes notice, not a host-event dump.
    assert "no device lanes" in err
