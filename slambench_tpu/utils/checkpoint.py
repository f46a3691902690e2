"""Checkpoint / resume: serialize the whole pipeline state pytree.

A strict capability superset of the reference's volume dump
(reference: cpp/kernels.cpp:1006-1030 writes only the TSDF shorts): one
``.npz`` holds every state leaf (TSDF, weights, mip, poses, reference
maps, reduction, flags) plus the frame counter, so a run resumes
bit-exactly (tests/test_pipeline_e2e.py::test_checkpoint_resume_identical
asserts trajectory equality).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from slambench_tpu.pipeline import KFusionState


def save_state(path: str, state: KFusionState, frame: int) -> None:
    arrays = {f.name: np.asarray(getattr(state, f.name))
              for f in dataclasses.fields(state)}
    arrays["__frame__"] = np.asarray(frame, np.int64)
    np.savez_compressed(path, **arrays)


def load_state(path: str) -> Tuple[KFusionState, int]:
    with np.load(path) as z:
        frame = int(z["__frame__"])
        leaves = {k: jnp.asarray(z[k].copy()) for k in z.files
                  if k != "__frame__"}
    return KFusionState(**leaves), frame
