"""Distributed execution over a TPU device mesh.

The reference is strictly single-device (SURVEY.md §2.4, §5.8 — no
MPI/NCCL/distributed code exists there); this package is the TPU-native
scaling layer demanded by BASELINE.json: TSDF map blocks sharded over a
``Mesh``, ICP normal equations reduced with ``psum`` over ICI, raycast
composited across z-slabs with halo exchange, all inside one
``shard_map``-decorated step.
"""

from slambench_tpu.parallel.mesh import make_mesh
from slambench_tpu.parallel.step import ShardedKFusion
