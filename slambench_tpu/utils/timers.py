"""Per-kernel timing in the reference's TICK/TOCK stderr format.

The reference gates nanosecond per-kernel timing on the KERNEL_TIMINGS
environment variable and emits ``name duration_ns size`` lines to stderr
(reference: kfusion/src/cpp/kernels.cpp:16-37, 57; CUDA variant fences
the device in TOCK, cuda/kernels.cu:23-38). This module reproduces that
contract for jitted JAX computations: the context manager blocks on the
result (the device fence) and prints the identical line format, so
checkKernels-style tooling works unchanged.

For intra-step kernel attribution (phases fused into one dispatch), use
``jax.profiler`` traces instead — see utils/profiling.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

import jax


def kernel_timings_enabled() -> bool:
    """KERNEL_TIMINGS env gate (reference: cpp/kernels.cpp:69-70)."""
    return bool(os.environ.get("KERNEL_TIMINGS"))


class KernelTimer:
    """``with KernelTimer("track", size): result = fn()`` — prints
    ``track <ns> <size>`` to stderr when enabled, after fencing the
    device on the assigned result.

    Assign the value to be fenced to ``.result`` inside the block (or it
    times only host dispatch, like an un-fenced TOCK would).
    """

    def __init__(self, name: str, size: int = 0, stream=None,
                 enabled: Optional[bool] = None):
        self.name = name
        self.size = size
        self.stream = stream if stream is not None else sys.stderr
        self.enabled = (kernel_timings_enabled()
                        if enabled is None else enabled)
        self.result = None
        self.elapsed_ns = 0

    def __enter__(self):
        if self.enabled:
            self._t0 = time.monotonic_ns()
        return self

    def __exit__(self, *exc):
        if not self.enabled:
            return False
        if self.result is not None:
            jax.block_until_ready(self.result)
        self.elapsed_ns = time.monotonic_ns() - self._t0
        print(f"{self.name} {self.elapsed_ns} {self.size}",
              file=self.stream)
        return False


def timed(name: str, fn, *args, size: int = 0, **kwargs):
    """Run ``fn`` under a KernelTimer, fencing its output."""
    with KernelTimer(name, size) as t:
        t.result = fn(*args, **kwargs)
    return t.result
