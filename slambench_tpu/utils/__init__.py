"""Instrumentation: performance statistics, kernel timers, power/energy
monitoring, buffer comparators (the reference's L6 layer — perfstats.h,
PowerMonitor, TICK/TOCK macros, commons.h comparators)."""

from slambench_tpu.utils.perfstats import PerfStats, Stats
from slambench_tpu.utils.timers import KernelTimer, kernel_timings_enabled
from slambench_tpu.utils.power import PowerMonitor
from slambench_tpu.utils.compare import (
    compare_float, compare_float3, compare_matrix4, compare_normal,
    compare_track_data,
)
