"""Evaluation: ATE against ground-truth trajectories and per-kernel
timing statistics — the reference's checkPos.py / checkKernels.py layer
(reference: kfusion/thirdparty/checkPos.py, checkKernels.py)."""

from slambench_tpu.eval.check_pos import (
    compute_ate, load_gt_trajectory, parse_benchmark_log,
)
from slambench_tpu.eval.check_kernels import aggregate_kernel_log
