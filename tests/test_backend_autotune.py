"""Tests for the backend-selection host runtime (common_opencl analogue)
and the kernel-parameter autotuner (OCLWrapper tuning-route analogue)."""

import io

import jax
import numpy as np
import pytest

from slambench_tpu.eval.check_kernels import aggregate_kernel_log
from slambench_tpu.tools import autotune
from slambench_tpu.utils import backend


# --- backend selection (reference: common_opencl.cpp:31-183) -----------

def test_select_backend_unset_is_noop(monkeypatch):
    monkeypatch.delenv("SLAMBENCH_PLATFORM", raising=False)
    assert backend.select_backend() is None


def test_select_backend_sets_platform(monkeypatch):
    # The test session already runs on cpu (conftest); re-selecting cpu
    # exercises the env route without disturbing the backend.
    monkeypatch.setenv("SLAMBENCH_PLATFORM", "cpu")
    assert backend.select_backend() == "cpu"
    assert jax.default_backend() == "cpu"


def test_select_device_by_ordinal(monkeypatch):
    monkeypatch.setenv("SLAMBENCH_DEVICE", "3")
    try:
        dev = backend.select_device()
        assert dev is jax.devices()[3]
        # Uncommitted arrays land on the selected device.
        x = jax.numpy.zeros(4)
        assert list(x.devices())[0] is dev
    finally:
        jax.config.update("jax_default_device", None)


def test_select_device_out_of_range(monkeypatch, capsys):
    monkeypatch.setenv("SLAMBENCH_DEVICE", "99")
    assert backend.select_device() is None


def test_enable_jit_cache(tmp_path):
    path = str(tmp_path / "jitcache")
    try:
        assert backend.enable_jit_cache(path) == path
        assert jax.config.jax_compilation_cache_dir == path
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_device_report_lists_devices():
    out = io.StringIO()
    backend.device_report(out)
    text = out.getvalue()
    assert "platform: cpu" in text
    assert text.count("device ") == len(jax.devices())


def test_explain_error_table():
    hint = backend.explain_error(RuntimeError(
        "RESOURCE_EXHAUSTED: Out of memory allocating 536870912 bytes"))
    assert hint is not None and "volume-resolution" in hint
    assert backend.explain_error(ValueError("benign")) is None


# --- autotune sweeps (reference: OCLWrapper.cpp:77-132) -----------------

def test_autotune_reduce_sweep_emits_kernel_log_lines():
    out = io.StringIO()
    rows = autotune.sweep_reduce([128, 256], pixels=2560, iters=2, out=out)
    lines = out.getvalue().strip().splitlines()
    assert len(lines) == 2 and len(rows) == 2
    # Lines feed the check_kernels aggregator unchanged.
    agg = aggregate_kernel_log(lines)
    assert len(agg) == 2
    assert all(v.shape == (1,) and v[0] > 0 for v in agg.values())
    # Different tile heights, identical reduction values.
    assert rows[0][2] == pytest.approx(rows[1][2], rel=1e-5)


def test_autotune_mip_sweep_runs_on_cpu():
    out = io.StringIO()
    rows = autotune.sweep_mip([8, 16], resolution=32, iters=1, out=out)
    lines = out.getvalue().strip().splitlines()
    assert len(lines) == 2 and len(rows) == 2
    for line in lines:
        name, ns, pixels = line.split()
        assert name.startswith("raycast[mip_block=")
        assert float(ns) > 0 and int(pixels) == 240 * 320


def test_autotune_blocks_sweep_runs_on_cpu():
    out = io.StringIO()
    rows = autotune.sweep_blocks(["1x1x1", "4x4", "4x4x2"],
                                 resolution=32, iters=1, out=out)
    lines = out.getvalue().strip().splitlines()
    assert len(lines) == 3 and len(rows) == 3
    for line in lines:
        name, ns, voxels, vis = line.split()
        assert name.startswith("integrate[blocks=")
        assert float(ns) > 0 and int(voxels) == 32 ** 3
        assert vis.startswith("visible=")
    grids = [r[0] for r in rows]
    assert grids == [(1, 1, 1), (4, 4, 1), (4, 4, 2)]


def test_autotune_cli_reports_best(capsys):
    rc = autotune.main(["reduce", "--values", "128",
                        "--pixels", "1280", "--iters", "1"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "# best: reduce=128" in err


# --- per-frame dump helpers (reference: commons.h:520-567) --------------

def test_write_buffer_and_pose_roundtrip(tmp_path):
    from slambench_tpu.utils.dump import read_buffer, write_buffer, write_pose
    prefix = str(tmp_path / "vertex_")
    data = np.arange(12, dtype=np.float32).reshape(3, 4)
    n = write_buffer(prefix, 7, data, out=io.StringIO())
    assert n == 12
    got = read_buffer(prefix, 7, np.float32, (3, 4))
    np.testing.assert_array_equal(got, data)

    pprefix = str(tmp_path / "pose_")
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0.1, 0.2, 0.3)
    write_pose(pprefix, 3, pose, out=io.StringIO())
    binary = read_buffer(str(tmp_path / "BINARY_pose_"), 3,
                         np.float32, (4, 4))
    np.testing.assert_array_equal(binary, pose)
    text = np.loadtxt(pprefix + "3", dtype=np.float32)
    np.testing.assert_allclose(text, pose)
