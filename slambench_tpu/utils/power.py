"""Power and energy monitoring.

Re-implementation of the reference PowerMonitor
(reference: kfusion/src/PowerMonitor.cpp, include/PowerMonitor.h): probes
platform sensors in priority order and samples them into its own
PerfStats. Sensor backends:

* ODROID INA231 sysfs nodes (A7/A15/GPU/DRAM rails,
  reference: PowerMonitor.cpp:188-221) — kept for interface parity;
* Intel RAPL via powercap sysfs (the PAPI path of the reference,
  reference: PowerMonitor.cpp:225-474, reads the same MSR-backed
  counters without requiring PAPI);
* generic Linux hwmon power rails (``/sys/class/hwmon/*/power*_input``,
  microwatts) — covers server boards/BMCs that expose instantaneous
  power without RAPL;
* DUMMY — no sensors, sampling is a no-op (reference:
  PowerMonitor.cpp:87-89,138-143).

The sysfs roots are constructor-injectable so each backend is testable
against a fixture tree (tests/test_power.py).
"""

from __future__ import annotations

import glob
import os
import time
from enum import Enum
from typing import Dict, Optional

from slambench_tpu.utils.perfstats import PerfStats, StatType


class SensorType(Enum):
    ODROID = "odroid"
    RAPL = "rapl"
    HWMON = "hwmon"
    DUMMY = "dummy"


_ODROID_NODES = {
    # name -> sysfs glob (reference: PowerMonitor.cpp:188-221)
    "a15": "/sys/bus/i2c/drivers/INA231/*0040/sensor_W",
    "a7": "/sys/bus/i2c/drivers/INA231/*0045/sensor_W",
    "gpu": "/sys/bus/i2c/drivers/INA231/*0044/sensor_W",
    "mem": "/sys/bus/i2c/drivers/INA231/*0041/sensor_W",
}

_RAPL_ROOT = "/sys/class/powercap"
_HWMON_ROOT = "/sys/class/hwmon"


class PowerMonitor:
    def __init__(self,
                 odroid_nodes: Optional[Dict[str, str]] = None,
                 rapl_root: str = _RAPL_ROOT,
                 hwmon_root: str = _HWMON_ROOT):
        self.power_stats = PerfStats()
        self._odroid: Dict[str, str] = {}
        self._rapl: Dict[str, str] = {}
        self._hwmon: Dict[str, str] = {}
        self._rapl_last: Dict[str, tuple] = {}

        for name, pattern in (odroid_nodes or _ODROID_NODES).items():
            hits = glob.glob(pattern)
            if hits:
                self._odroid[name] = hits[0]
        if not self._odroid:
            for zone in sorted(glob.glob(os.path.join(
                    rapl_root, "intel-rapl:*"))):
                name_file = os.path.join(zone, "name")
                energy_file = os.path.join(zone, "energy_uj")
                if os.path.exists(name_file) and os.access(energy_file,
                                                           os.R_OK):
                    try:
                        label = open(name_file).read().strip()
                        int(open(energy_file).read().strip())
                    except (OSError, ValueError):
                        continue
                    self._rapl[label] = energy_file
        if not self._odroid and not self._rapl:
            for chip in sorted(glob.glob(os.path.join(hwmon_root,
                                                      "hwmon*"))):
                try:
                    chip_name = open(os.path.join(chip,
                                                  "name")).read().strip()
                except OSError:
                    chip_name = os.path.basename(chip)
                for node in sorted(glob.glob(os.path.join(
                        chip, "power*_input"))):
                    try:
                        int(open(node).read().strip())
                    except (OSError, ValueError):
                        continue
                    rail = os.path.basename(node)[: -len("_input")]
                    label_file = os.path.join(chip, rail + "_label")
                    if os.path.exists(label_file):
                        try:
                            rail = open(label_file).read().strip()
                        except OSError:
                            pass
                    # Disambiguate colliding keys (two chips with the
                    # same name, or two rails sharing a label on one
                    # chip) — a dict overwrite would silently drop a
                    # rail from every sample and under-report energy.
                    key = f"{chip_name}_{rail}"
                    if key in self._hwmon:
                        key = f"{key}_{os.path.basename(chip)}_" \
                              f"{os.path.basename(node)[:-len('_input')]}"
                    self._hwmon[key] = node

        if self._odroid:
            self.sensor = SensorType.ODROID
        elif self._rapl:
            self.sensor = SensorType.RAPL
        elif self._hwmon:
            self.sensor = SensorType.HWMON
        else:
            self.sensor = SensorType.DUMMY

    def is_active(self) -> bool:
        return self.sensor != SensorType.DUMMY

    def start(self) -> None:
        self.power_stats.start()
        if self.sensor == SensorType.RAPL:
            now = time.monotonic()
            for label, path in self._rapl.items():
                try:
                    self._rapl_last[label] = (
                        int(open(path).read().strip()), now)
                except (OSError, ValueError):
                    pass

    def sample(self) -> None:
        """Sample all rails into power_stats
        (reference: PowerMonitor.cpp:114-145)."""
        # Record the sample timestamp so total_energy can integrate
        # watts over real intervals (the reference integrates its
        # power.rpt the same way, thirdparty/processPowerRpt).
        self.power_stats.sample("sample_t", time.monotonic(),
                                StatType.TIME)
        if self.sensor == SensorType.ODROID:
            for name, path in self._odroid.items():
                try:
                    w = float(open(path).read().strip())
                except (OSError, ValueError):
                    continue
                self.power_stats.sample("Power_" + name, w, StatType.POWER)
        elif self.sensor == SensorType.RAPL:
            now = time.monotonic()
            for label, path in self._rapl.items():
                try:
                    uj = int(open(path).read().strip())
                except (OSError, ValueError):
                    continue
                prev = self._rapl_last.get(label)
                self._rapl_last[label] = (uj, now)
                if prev is None or now <= prev[1]:
                    continue
                duj = uj - prev[0]
                if duj < 0:     # counter wrap
                    continue
                watts = (duj * 1e-6) / (now - prev[1])
                self.power_stats.sample("Power_" + label, watts,
                                        StatType.POWER)
        elif self.sensor == SensorType.HWMON:
            for name, path in self._hwmon.items():
                try:
                    uw = int(open(path).read().strip())
                except (OSError, ValueError):
                    continue
                self.power_stats.sample("Power_" + name, uw * 1e-6,
                                        StatType.POWER)
        # DUMMY: no-op.

    def total_energy(self, label: Optional[str] = None) -> float:
        """Integrated energy (J) from the sampled power series: right-
        endpoint rectangle rule against the sample_t timestamps recorded
        by ``sample()`` (reference: processPowerRpt integrates the
        power.rpt columns the same way)."""
        total = 0.0
        times = self.power_stats.get("sample_t")
        for key in self.power_stats.keys:
            if key == "sample_t" or (label and label not in key):
                continue
            samples = self.power_stats.get(key)
            if len(times) == len(samples) and len(samples) > 1:
                for i in range(1, len(samples)):
                    total += samples[i] * (times[i] - times[i - 1])
        return total
