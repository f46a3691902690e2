"""Live multi-process (multi-"host") collective tests.

Spawns REAL OS processes that wire up ``jax.distributed`` against a
local coordinator and execute collectives over one global mesh — the
executed counterpart of SCALING.md's analytic multi-host account (the
reference has nothing distributed to mirror, SURVEY.md §5.8; these
tests validate the framework's own DCN design: parallel/distributed.py,
parallel/step.py, tools/distributed_probe.py).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(nproc: int, local_devices: int, extra=()):
    port = _free_port()
    procs = []
    env = dict(os.environ)
    # Subprocesses pick their own backend: CPU with `local_devices`
    # virtual devices each (CLAUDE.md: JAX_PLATFORM_NAME works; the
    # probe also forces the cpu platform via jax.config).
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=%d"
                        % local_devices)
    for pid in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "slambench_tpu.tools.distributed_probe",
             "--coordinator", f"localhost:{port}",
             "--num-processes", str(nproc),
             "--process-id", str(pid), *extra],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    return outs


def _parse(outs, nproc, n_global):
    for rc, out, err in outs:
        assert rc == 0, f"probe failed (rc={rc}):\n{out}\n{err[-2000:]}"
        rec = json.loads(out.strip().splitlines()[-1])
        assert rec["process_count"] == nproc
        assert rec["global_devices"] == n_global
        assert rec["psum"] == rec["psum_want"] == sum(range(n_global))
        assert rec["ring_ok"] is True
        yield rec


def test_two_process_collectives():
    """psum + ppermute across 2 processes x 2 devices (global mesh of 4):
    the ICP-reduction and halo-exchange transports, executed over the
    inter-process channel (gRPC standing in for DCN)."""
    outs = _spawn(nproc=2, local_devices=2)
    recs = list(_parse(outs, nproc=2, n_global=4))
    assert {r["process_id"] for r in recs} == {0, 1}


@pytest.mark.slow
def test_two_process_full_sharded_step():
    """One complete sharded pipeline step (every phase live, tiny
    shapes) over a mesh spanning 2 processes — the multi-host analogue
    of __graft_entry__.dryrun_multichip."""
    outs = _spawn(nproc=2, local_devices=2, extra=("--full-step",))
    for rec in _parse(outs, nproc=2, n_global=4):
        assert rec["full_step_pose_finite"] is True
