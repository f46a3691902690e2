"""Instrumentation-layer tests: perfstats, kernel timers, comparators,
checkpoint helpers, trajectory formats."""

import io

import pytest

import numpy as np
import jax.numpy as jnp

from slambench_tpu.geometry import se3_exp
from slambench_tpu.eval.trajectory import ate_rmse, read_tum, write_tum
from slambench_tpu.utils.compare import (
    compare_float, compare_normal, compare_track_data,
)
from slambench_tpu.utils.perfstats import PerfStats, StatType
from slambench_tpu.utils.power import PowerMonitor
from slambench_tpu.utils.timers import KernelTimer


def test_perfstats_series_and_summary():
    ps = PerfStats()
    for i in range(5):
        ps.sample("tracking", 0.01 * (i + 1), StatType.TIME)
        ps.sample("X", float(i), StatType.DISTANCE)
    assert ps.keys == ["tracking", "X"]
    assert ps.last("tracking") == 0.05
    assert abs(ps.mean("tracking") - 0.03) < 1e-12
    out = io.StringIO()
    ps.print_all_data(out)
    text = out.getvalue()
    assert "tracking" in text and "mean" in text


def test_kernel_timer_format():
    out = io.StringIO()
    with KernelTimer("trackKernel", 320 * 240, stream=out,
                     enabled=True) as t:
        t.result = jnp.zeros((8,)) + 1
    line = out.getvalue().strip().split()
    assert line[0] == "trackKernel"
    assert int(line[1]) > 0
    assert line[2] == str(320 * 240)


def test_power_monitor_never_crashes():
    pm = PowerMonitor()
    pm.start()
    pm.sample()
    pm.sample()  # DUMMY mode in containers: no-ops, no exceptions


def test_power_total_energy_integrates_watts():
    """A synthetic 2 W series sampled at 1 s intervals must integrate to
    2 J/interval (reference: PowerMonitor.cpp:114-145 + processPowerRpt's
    power->energy integration)."""
    from slambench_tpu.utils.perfstats import StatType
    pm = PowerMonitor()
    pm.power_stats.reset()
    for t, w in ((10.0, 2.0), (11.0, 2.0), (12.0, 2.0)):
        pm.power_stats.sample("sample_t", t, StatType.TIME)
        pm.power_stats.sample("Power_pkg", w, StatType.POWER)
    assert pm.total_energy() == pytest.approx(4.0)
    assert pm.total_energy("pkg") == pytest.approx(4.0)
    assert pm.total_energy("nope") == 0.0


def test_power_sample_records_timestamps():
    pm = PowerMonitor()
    pm.start()
    pm.sample()
    pm.sample()
    assert len(pm.power_stats.get("sample_t")) == 2


def test_comparators_count_mismatches():
    out = io.StringIO()
    a = np.zeros(10, np.float32)
    b = a.copy()
    b[3] = 1.0
    assert compare_float("t", a, b, out=out) == 1
    assert compare_float("t", a, a, out=out) == 0

    # Normals: y/z ignored where reference x == -2 (commons.h:499-518).
    l = np.zeros((3, 4), np.float32)
    r = np.zeros((3, 4), np.float32)
    r[0, 1] = -2.0
    l[0, 1] = -2.0
    l[1, 1] = 9.0     # differing y under an invalid reference normal
    assert compare_normal("n", l, r, out=out) == 0

    d1 = {"result": np.ones((2, 2), np.int32),
          "error": np.zeros((2, 2), np.float32)}
    d2 = {"result": np.ones((2, 2), np.int32),
          "error": np.zeros((2, 2), np.float32)}
    d2["result"][0, 0] = -4
    assert compare_track_data("td", d1, d2, out=out) == 1


def test_tum_roundtrip_and_ate(tmp_path):
    poses = []
    for i in range(10):
        x = np.array([0.1 * i, 0.0, 0.02 * i, 0, 0.01 * i, 0], np.float32)
        poses.append(np.asarray(se3_exp(jnp.asarray(x))))
    poses = np.stack(poses)
    path = str(tmp_path / "traj.tum")
    write_tum(path, poses)
    pos = read_tum(path)
    np.testing.assert_allclose(pos, poses[:, :3, 3], atol=1e-5)
    # identical trajectories -> 0 error; shifted -> shift (unaligned)
    assert ate_rmse(pos, poses[:, :3, 3], align=False) < 1e-5
    shifted = poses[:, :3, 3] + np.array([0.5, 0, 0])
    assert abs(ate_rmse(shifted, poses[:, :3, 3], align=False) - 0.5) < 1e-6
    # ... and ~0 after alignment
    assert ate_rmse(shifted, poses[:, :3, 3], align=True) < 1e-6


def test_checkpoint_roundtrip(tmp_path):
    from slambench_tpu.pipeline import KFusion
    from slambench_tpu.utils.checkpoint import load_state, save_state
    kf = KFusion((32, 24), (16, 16, 16), (2.0,) * 3, (1.0, 1.0, 0.0),
                 (2, 2), (30.0, 30.0, 16.0, 12.0))
    st = kf.init_state()
    path = str(tmp_path / "ck.npz")
    save_state(path, st, 7)
    st2, frame = load_state(path)
    assert frame == 7
    import dataclasses
    for f in dataclasses.fields(st):
        np.testing.assert_array_equal(np.asarray(getattr(st, f.name)),
                                      np.asarray(getattr(st2, f.name)))
