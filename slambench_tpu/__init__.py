"""slambench_tpu — a TPU-native dense-SLAM benchmark framework.

A from-scratch JAX/XLA/Pallas implementation of the full KinectFusion
dense-SLAM pipeline with the capabilities of SLAMBench (the reference
benchmark at domantasjurkus/slambench): bilateral-filtered depth pyramids,
projective-data-association ICP tracking with a fused normal-equations
reduction, TSDF volume integration, raycast surface prediction, dataset
readers, instrumentation and ATE accuracy evaluation — re-designed
TPU-first rather than ported.

Layer map (mirrors SURVEY.md §1):
  geometry/volume/params  — math & data substrate (L0/L1)
  ops/                    — the kernel contract, jnp oracle + Pallas (L2/L3)
  pipeline                — the KFusion state machine (L3/L4)
  io/                     — dataset readers & converters (L5/L9)
  utils/                  — instrumentation: perfstats, power, timers (L6)
  frontend/               — headless benchmark driver (L4)
  eval/                   — ATE / kernel-time evaluation (L8)
  parallel/               — device-mesh sharding of volume & image (new)
"""

__version__ = "0.1.0"

from slambench_tpu.config import Configuration, parse_args
from slambench_tpu.pipeline import KFusion, KFusionState
