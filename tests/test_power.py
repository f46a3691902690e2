"""PowerMonitor sensor backends against fixture sysfs trees, plus the
power-report energy integrator.

The reference PowerMonitor probes real ODROID INA231 / PAPI RAPL sensors
(reference: kfusion/src/PowerMonitor.cpp:53-159,188-221,225-474); these
tests drive each re-implemented backend through a synthetic sysfs tree
(constructor-injected roots) so the probe order, unit conversions and
energy integration are pinned without hardware.
"""

import os
import time

import numpy as np
import pytest

from slambench_tpu.utils.power import PowerMonitor, SensorType
from slambench_tpu.utils.perfstats import StatType


def _dummy(tmp_path):
    """A monitor constructed against empty roots — always DUMMY."""
    return PowerMonitor(odroid_nodes={}, rapl_root=str(tmp_path / "no"),
                        hwmon_root=str(tmp_path / "no"))


def test_dummy_when_no_sensors(tmp_path):
    pm = _dummy(tmp_path)
    assert pm.sensor == SensorType.DUMMY
    assert not pm.is_active()
    pm.start()
    pm.sample()
    # Only the timestamp series is recorded; no power rails.
    assert [k for k in pm.power_stats.keys if k != "sample_t"] == []


def test_odroid_fixture_tree(tmp_path):
    """INA231-style rails: sensor_W files hold instantaneous watts
    (reference: PowerMonitor.cpp:188-221)."""
    rails = {}
    for name, watts in (("a15", 1.25), ("gpu", 0.5)):
        d = tmp_path / f"INA231_{name}"
        d.mkdir()
        (d / "sensor_W").write_text(f"{watts}\n")
        rails[name] = str(d / "sensor_W")
    pm = PowerMonitor(odroid_nodes=rails,
                      rapl_root=str(tmp_path / "no"),
                      hwmon_root=str(tmp_path / "no"))
    assert pm.sensor == SensorType.ODROID
    pm.start()
    pm.sample()
    pm.sample()
    assert pm.power_stats.get("Power_a15") == [1.25, 1.25]
    assert pm.power_stats.get("Power_gpu") == [0.5, 0.5]


def test_rapl_fixture_tree(tmp_path):
    """powercap energy counters: watts = d(energy_uj)/dt
    (the PAPI-route counters, reference: PowerMonitor.cpp:225-474)."""
    zone = tmp_path / "intel-rapl:0"
    zone.mkdir()
    (zone / "name").write_text("package-0\n")
    (zone / "energy_uj").write_text("1000000\n")
    pm = PowerMonitor(odroid_nodes={}, rapl_root=str(tmp_path),
                      hwmon_root=str(tmp_path / "no"))
    assert pm.sensor == SensorType.RAPL
    pm.start()
    time.sleep(0.02)
    # 0.5 J consumed since start.
    (zone / "energy_uj").write_text("1500000\n")
    pm.sample()
    series = pm.power_stats.get("Power_package-0")
    assert len(series) == 1
    # watts = 0.5 J / elapsed; elapsed >= the 0.02 s sleep, and a loose
    # upper bound guards against unit slips (uJ vs J).
    assert 0.5 / 10.0 < series[0] < 0.5 / 0.02 * 1.1


def test_rapl_counter_wrap_skipped(tmp_path):
    zone = tmp_path / "intel-rapl:0"
    zone.mkdir()
    (zone / "name").write_text("package-0\n")
    (zone / "energy_uj").write_text("1000000\n")
    pm = PowerMonitor(odroid_nodes={}, rapl_root=str(tmp_path),
                      hwmon_root=str(tmp_path / "no"))
    pm.start()
    time.sleep(0.005)
    (zone / "energy_uj").write_text("500\n")      # wrapped backwards
    pm.sample()
    assert pm.power_stats.get("Power_package-0") == []


def test_hwmon_fixture_tree(tmp_path):
    """Generic hwmon rails: power*_input in microwatts, optional
    power*_label naming."""
    chip = tmp_path / "hwmon0"
    chip.mkdir()
    (chip / "name").write_text("board\n")
    (chip / "power1_input").write_text("12500000\n")   # 12.5 W
    (chip / "power1_label").write_text("cpu_rail\n")
    (chip / "power2_input").write_text("3000000\n")    # 3 W, no label
    pm = PowerMonitor(odroid_nodes={}, rapl_root=str(tmp_path / "no"),
                      hwmon_root=str(tmp_path))
    assert pm.sensor == SensorType.HWMON
    pm.start()
    pm.sample()
    assert pm.power_stats.get("Power_board_cpu_rail") == [12.5]
    assert pm.power_stats.get("Power_board_power2") == [3.0]


def test_probe_priority_odroid_over_hwmon(tmp_path):
    d = tmp_path / "ina"
    d.mkdir()
    (d / "sensor_W").write_text("1.0\n")
    chip = tmp_path / "hwmon0"
    chip.mkdir()
    (chip / "name").write_text("board\n")
    (chip / "power1_input").write_text("1000000\n")
    pm = PowerMonitor(odroid_nodes={"a15": str(d / "sensor_W")},
                      rapl_root=str(tmp_path / "no"),
                      hwmon_root=str(tmp_path))
    assert pm.sensor == SensorType.ODROID


def test_total_energy_integration(tmp_path):
    """total_energy = right-endpoint rectangle sum of watts over the
    recorded sample_t intervals."""
    pm = _dummy(tmp_path)
    # 3 samples, 1 s apart, constant 2 W: 2 intervals x 2 J = 4 J.
    for t, w in ((10.0, 2.0), (11.0, 2.0), (12.0, 2.0)):
        pm.power_stats.sample("sample_t", t, StatType.TIME)
        pm.power_stats.sample("Power_x", w, StatType.POWER)
    assert pm.total_energy() == pytest.approx(4.0)
    assert pm.total_energy("Power_x") == pytest.approx(4.0)
    assert pm.total_energy("nope") == 0.0


def test_process_power_rpt(tmp_path):
    """Synthetic power.rpt -> known joules (trapezoid rule), matching
    the reference Tcl integrator's semantics
    (reference: kfusion/thirdparty/processPowerRpt)."""
    from slambench_tpu.tools.process_power_rpt import (
        integrate_report, main,
    )
    rpt = tmp_path / "power.rpt"
    # t, railA (constant 2 W), railB (ramp 0->4 W over 2 s).
    rpt.write_text("t railA railB\n"
                   "0.0 2.0 0.0\n"
                   "1.0 2.0 2.0\n"
                   "2.0 2.0 4.0\n")
    out = integrate_report(str(rpt))
    assert out["railA"] == pytest.approx(4.0)     # 2 W x 2 s
    assert out["railB"] == pytest.approx(4.0)     # triangle: 0.5*2*4
    assert main([str(rpt)]) == 0
    assert main([]) == 1
