"""ATE evaluation tests (reference contract: thirdparty/checkPos.py)."""

import numpy as np

from slambench_tpu.eval.check_pos import (
    compute_ate, load_gt_trajectory, parse_benchmark_log,
)
from slambench_tpu.eval.check_kernels import aggregate_kernel_log


def _write_log(path, rows):
    header = ("frame\tacquisition\tpreprocessing\ttracking\tintegration"
              "\traycasting\trendering\tcomputation\ttotal    \tX          "
              "\tY          \tZ         \ttracked   \tintegrated")
    with open(path, "w") as f:
        f.write(header + "\n")
        for r in rows:
            f.write("%d\t" % r[0]
                    + "\t".join("%.7f" % v for v in r[1:12])
                    + "\t%d        \t%d\n" % (r[12], r[13]))


def test_parse_and_ate_zero_for_perfect_track(tmp_path):
    n = 10
    rows = []
    gt_lines = []
    for i in range(n):
        x, y, z = 0.01 * i, 0.02 * i, -0.005 * i
        rows.append([i] + [0.001] * 8 + [x, y, z] + [1, 1])
        gt_lines.append("%d %f %f %f 0 0 0 1" % (i + 1, x, -y, z))
    log_p = str(tmp_path / "b.log")
    gt_p = str(tmp_path / "gt.txt")
    _write_log(log_p, rows)
    open(gt_p, "w").write("\n".join(gt_lines) + "\n")

    log = parse_benchmark_log(log_p)
    assert len(log["frame"]) == n
    gt = load_gt_trajectory(gt_p)
    ate = compute_ate(log, gt)
    np.testing.assert_allclose(ate["ATE"], 0.0, atol=1e-6)
    assert int(ate["dropped"]) == 0


def test_dropped_frame_padding(tmp_path):
    # Frames 0,1,4 -> 2 dropped, padded with the last valid pose
    # (reference: checkPos.py:53-57).
    rows = [
        [0] + [0.001] * 8 + [0.0, 0.0, 0.0] + [1, 1],
        [1] + [0.001] * 8 + [0.1, 0.0, 0.0] + [1, 1],
        [4] + [0.001] * 8 + [0.4, 0.0, 0.0] + [1, 1],
    ]
    gt_lines = ["%d %f 0 0 0 0 0 1" % (i + 1, 0.1 * i) for i in range(5)]
    log_p = str(tmp_path / "b.log")
    gt_p = str(tmp_path / "gt.txt")
    _write_log(log_p, rows)
    open(gt_p, "w").write("\n".join(gt_lines) + "\n")

    ate = compute_ate(parse_benchmark_log(log_p), load_gt_trajectory(gt_p))
    assert int(ate["dropped"]) == 2
    assert len(ate["ATE"]) == 5
    # Padded frames 2,3 hold x=0.1 while gt moves on: error grows.
    np.testing.assert_allclose(ate["ATE"][:2], 0.0, atol=1e-6)
    assert ate["ATE"][2] > 0.05 and ate["ATE"][3] > 0.1
    np.testing.assert_allclose(ate["ATE"][4], 0.0, atol=1e-6)


def test_y_axis_flip_convention(tmp_path):
    # kfusion y and gt y have opposite signs (reference: checkPos.py:104).
    rows = [[i] + [0.001] * 8 + [0.0, 0.1 * i, 0.0] + [1, 1]
            for i in range(3)]
    gt_lines = ["%d 0 %f 0 0 0 0 1" % (i + 1, -0.1 * i) for i in range(3)]
    log_p, gt_p = str(tmp_path / "b.log"), str(tmp_path / "gt.txt")
    _write_log(log_p, rows)
    open(gt_p, "w").write("\n".join(gt_lines) + "\n")
    ate = compute_ate(parse_benchmark_log(log_p), load_gt_trajectory(gt_p))
    np.testing.assert_allclose(ate["ATE"], 0.0, atol=1e-6)


def test_resume_banner_parity(tmp_path, capsys):
    """CLI banner is field-for-field the reference's
    (checkPos.py:87-95): position counts, working position, untracked
    count, trajectory-shift notice."""
    from slambench_tpu.eval.check_pos import main
    rows = [
        [0] + [0.001] * 8 + [0.0, 0.0, 0.0] + [0, 1],   # untracked
        [1] + [0.001] * 8 + [0.1, 0.0, 0.0] + [1, 1],
        [4] + [0.001] * 8 + [0.4, 0.0, 0.0] + [1, 1],   # 2 dropped
    ]
    gt_lines = ["%d %f 0 0 0 0 0 1" % (i + 1, 0.1 * i) for i in range(7)]
    log_p, gt_p = str(tmp_path / "b.log"), str(tmp_path / "gt.txt")
    _write_log(log_p, rows)
    open(gt_p, "w").write("\n".join(gt_lines) + "\n")
    assert main([log_p, gt_p]) == 0
    out = capsys.readouterr().out
    assert "KFusion valid frames 3,  dropped frames: 2" in out
    assert "KFusion result        : 5 positions." in out
    assert "NUIM  result        : 7 positions." in out
    assert "Working position is : 5" in out
    # 1 row with tracked==0, minus the reference's -4 initialization
    # (checkPos.py:33) reproduced for banner parity.
    assert "Untracked frames: -3" in out
    assert "Shift KFusion trajectory..." in out


def test_kernel_log_aggregation():
    lines = [
        "trackKernel 120000 320",
        "track 80000 320",
        "reduceKernel 50000 512",
        "integrateKernel 3000000 65536",
        "garbage line",
    ]
    agg = aggregate_kernel_log(lines)
    assert len(agg["track"]) == 2          # unified cpp/jnp names
    assert len(agg["reduce"]) == 1
    assert agg["integrate"][0] == 3000000
