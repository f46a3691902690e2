"""Device profiling: jax.profiler traces + per-phase timing helpers.

The TPU equivalent of the reference's four profiling routes
(reference: SURVEY.md §5.1 — TICK/TOCK stderr timing, OpenCL LD_PRELOAD
interposer, nvprof): ``trace()`` captures an xprof/perfetto trace of a
region (kernel-level attribution in the TensorBoard profiler), and
``PhaseTimer`` produces the reference's per-phase columns with device
fences.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, List, Optional

import jax


def device_trace_options():
    """ProfileOptions with host/python tracing OFF.

    The profiler's event buffer caps at ~1e6 events; a busy host lane
    (e.g. a scan dispatch on the tunneled endpoint) fills it and the
    DEVICE events — the ones kernel attribution needs — get dropped
    (measured: 999,963 host vs 37 device events in a capped trace).
    """
    o = jax.profiler.ProfileOptions()
    o.host_tracer_level = 0
    o.python_tracer_level = 0
    return o


@contextlib.contextmanager
def trace(logdir: str = "/tmp/slambench_tpu_trace",
          device_only: bool = False):
    """Capture a jax.profiler trace of the enclosed region.

    View with TensorBoard's profile plugin or perfetto. This is the
    kernel-level attribution path (the analogue of the reference's
    nvprof / OCLWrapper routes). ``device_only`` disables the host and
    python tracers (see :func:`device_trace_options`).
    """
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(
        logdir, profiler_options=device_trace_options()
        if device_only else None)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Per-phase wall timing with device fences, producing the
    reference benchmark's phase columns (reference: benchmark.cpp:
    117-170)."""

    PHASES = ("acquisition", "preprocessing", "tracking", "integration",
              "raycasting", "rendering")

    def __init__(self):
        self.samples: Dict[str, List[float]] = {p: [] for p in self.PHASES}
        self._last = time.monotonic()

    def reset(self) -> None:
        self._last = time.monotonic()

    def mark(self, phase: str, fence=None) -> float:
        """Record time since the previous mark under ``phase``; blocks on
        ``fence`` first (the reference's synchroniseDevices)."""
        if fence is not None:
            jax.block_until_ready(fence)
        now = time.monotonic()
        dt = now - self._last
        self._last = now
        self.samples.setdefault(phase, []).append(dt)
        return dt

    def summary(self) -> Dict[str, float]:
        return {p: (sum(v) / len(v) if v else 0.0)
                for p, v in self.samples.items()}
