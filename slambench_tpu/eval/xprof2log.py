"""Convert a jax.profiler (xprof) trace into ``name ns`` kernel lines.

Re-implementation of the reference's nvprof post-processor
(reference: kfusion/thirdparty/nvprof2log.py — converts
``nvprof --print-gpu-trace`` output into ``name nanoseconds`` lines for
checkKernels.py). Here the input is the Chrome-trace JSON that
``jax.profiler.start_trace`` / ``slambench_tpu.utils.profiling.trace``
writes (``plugins/profile/<run>/*.trace.json.gz``): every complete
('ph' == 'X') event on a device lane becomes one ``name duration_ns``
line, so ``slambench_tpu.eval.check_kernels`` consumes either stream.

CLI:
  python -m slambench_tpu.eval.xprof2log <trace_dir_or_file> [> kernels.log]

Accepts a profiler logdir (searched recursively for ``*.trace.json[.gz]``),
or a single trace file. ``--all`` keeps host-side lanes too (default:
device lanes only, identified by a pid/process name containing "TPU",
"GPU", or "/device:").
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from typing import Dict, Iterable, List, Tuple


def find_trace_files(path: str) -> List[str]:
    """A trace file itself, or every trace file under a profiler logdir."""
    if os.path.isfile(path):
        return [path]
    hits: List[str] = []
    for pat in ("*.trace.json.gz", "*.trace.json"):
        hits += glob.glob(os.path.join(path, "**", pat), recursive=True)
    return sorted(hits)


def load_trace(path: str) -> dict:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        return json.load(f)


def device_pids(trace: dict) -> set:
    """pids whose process_name metadata marks them as a device lane."""
    pids = set()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = str(ev.get("args", {}).get("name", ""))
            if any(tag in name for tag in ("TPU", "GPU", "/device:")):
                pids.add(ev.get("pid"))
    return pids


def kernel_events(trace: dict, device_only: bool = True
                  ) -> Iterable[Tuple[str, float]]:
    """Yield (name, duration_ns) for complete events.

    Chrome-trace durations are microseconds (reference nvprof2log.py
    scales its columns to ns the same way).
    """
    pids = device_pids(trace) if device_only else None
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if pids is not None and pids and ev.get("pid") not in pids:
            continue
        dur_us = ev.get("dur", 0)
        if dur_us <= 0:
            continue
        name = str(ev.get("name", "")).split("(")[0].strip()
        if not name:
            continue
        yield name, float(dur_us) * 1e3


def convert(path: str, device_only: bool = True, out=sys.stdout) -> int:
    """Write ``name ns`` lines for every kernel event found; returns the
    number of lines emitted."""
    n = 0
    files = find_trace_files(path)
    if not files:
        print(f"no *.trace.json[.gz] under {path}", file=sys.stderr)
        return 0
    for f in files:
        trace = load_trace(f)
        events = list(kernel_events(trace, device_only=device_only))
        if not events and device_only:
            # Trace without process metadata (e.g. CPU backend): fall back
            # to every lane rather than emitting nothing.
            events = list(kernel_events(trace, device_only=False))
        for name, ns in events:
            print(f"{name} {ns:.0f}", file=out)
            n += 1
    return n


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    device_only = True
    if "--all" in argv:
        device_only = False
        argv.remove("--all")
    if len(argv) != 1:
        print("usage: xprof2log [--all] <trace_dir_or_file>",
              file=sys.stderr)
        return 1
    convert(argv[0], device_only=device_only)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
