"""Multi-host initialization helpers.

On a multi-host pod slice, call ``initialize()`` once per process before
any mesh construction; ``jax.distributed`` wires the hosts (coordination
over DCN), after which ``jax.devices()`` spans the slice and the same
1-D mesh code (parallel/step.py) shards the TSDF across hosts — the ICP
psum and halo ppermute ride ICI within hosts and DCN across, exactly the
BASELINE multi-host configuration. Single-host (or this repo's CI)
silently no-ops.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    Returns True when multi-process mode is active."""
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0"))
    pid = process_id if process_id is not None else \
        int(os.environ.get("JAX_PROCESS_ID", "-1"))
    if not addr or nproc <= 1 or pid < 0:
        return False
    jax.distributed.initialize(coordinator_address=addr,
                               num_processes=nproc, process_id=pid)
    return True


def is_primary() -> bool:
    """Metrics/log aggregation goes to host 0 (SURVEY.md §5.5)."""
    return jax.process_index() == 0
