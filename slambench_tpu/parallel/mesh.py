"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "z",
              devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D mesh over ``n_devices`` (default: all available).

    The pipeline's single parallel axis shards both the TSDF z-extent and
    the image rows; on multi-host slices the same axis spans hosts so the
    ICP ``psum`` rides ICI within a host and DCN across.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def parse_mesh_spec(spec: str) -> int:
    """Parse the CLI ``--mesh axis:n`` extension; returns n (0 = all)."""
    if not spec:
        return 0
    if ":" in spec:
        return int(spec.split(":", 1)[1])
    return int(spec)
