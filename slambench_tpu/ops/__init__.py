"""Compute kernels of the TPU-native KinectFusion pipeline.

Two backends implement the same kernel contract
(reference: kfusion/include/kernels.h:18-69):

* ``slambench_tpu.ops`` (this package) — pure vectorized jnp. This is the
  oracle backend, playing the role the sequential C++ backend plays in the
  reference (reference: kfusion/src/cpp/kernels.cpp): every other backend
  is validated against it buffer-by-buffer.
* ``slambench_tpu.ops.pallas`` — hand-written Pallas TPU kernels for the
  hot paths (fused track+reduce, TSDF integrate, raycast).
"""

from slambench_tpu.ops.preprocess import (
    mm2meters, bilateral_filter, half_sample_robust, make_gaussian,
)
from slambench_tpu.ops.vertex import depth2vertex, vertex2normal
from slambench_tpu.ops.track import track, reduce_track, track_and_reduce
from slambench_tpu.ops.solve import update_pose, check_pose
from slambench_tpu.ops.integrate import integrate
from slambench_tpu.ops.raycast import raycast
from slambench_tpu.ops.render import (
    render_depth, render_track, render_volume, render_normal,
)
