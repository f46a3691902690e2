"""Higher-level SLAM models built on the KinectFusion core.

The reference has exactly one model (frame-to-model KinectFusion); this
package adds the beyond-reference layer demanded by BASELINE.json config
5: a keyframe pose graph with Gauss-Newton optimization and a
distributed-reduction-ready bundle-adjustment structure.
"""

from slambench_tpu.models.posegraph import PoseGraph, optimize_pose_graph
from slambench_tpu.models.keyframes import KeyframeStore, PoseGraphKFusion
