"""PoseGraphKFusion end-to-end: keyframing + graph growth on the
synthetic sequence, and frontend run() API coverage."""

import numpy as np
import jax.numpy as jnp
import pytest

from slambench_tpu.io.readers import RawDepthReader
from slambench_tpu.io.synthetic import generate_dataset
from slambench_tpu.models.keyframes import KeyframeStore, PoseGraphKFusion
from slambench_tpu.pipeline import KFusion


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("synth_kf"))
    return generate_dataset(out, n_frames=30, image_size=(160, 120),
                            dim=(4.8,) * 3, amp=0.3, period=24)


def test_posegraph_kfusion_end_to_end(dataset):
    man = dataset
    rd = RawDepthReader(man["raw"])
    init = [f * d for f, d in zip(man["init_pos_factor"], man["dim"])]
    kf = KFusion((160, 120), (64,) * 3, man["dim"], init, (10, 5, 4),
                 man["camera"])
    slam = PoseGraphKFusion(
        kf, KeyframeStore(trans_threshold=0.08, rot_threshold=0.08),
        optimize_every=3)
    state = kf.init_state()
    for frame in range(30):
        d = rd.read_next_depth_frame()
        state = slam.process_frame(
            state, jnp.asarray(np.ascontiguousarray(d)), frame)

    # The fast orbit must have promoted several keyframes and linked them.
    assert len(slam.store.keyframes) >= 3
    assert len(slam.graph.edges) >= len(slam.store.keyframes) - 1

    traj = slam.corrected_trajectory()
    assert traj.shape == (30, 4, 4)
    # Corrected trajectory stays a valid rigid-motion sequence and close
    # to ground truth.
    errs = np.linalg.norm(traj[:, :3, 3] - man["poses"][:30, :3, 3], axis=1)
    assert errs.mean() < 0.08
    for T in traj[::7]:
        np.testing.assert_allclose(T[:3, :3] @ T[:3, :3].T, np.eye(3),
                                   atol=1e-4)


def test_loop_closure_fires_and_corrects(tmp_path_factory):
    """A trajectory that PROVABLY revisits (orbit period 22 < 44 frames;
    io/synthetic.orbit_trajectory repeats exactly after one period) must
    (a) create non-consecutive pose-graph edges via the snapshot-ICP
    loop-closure path — through BOTH acceptance gates (inlier fraction
    AND the point-plane RMS bound the tracker itself uses,
    models/keyframes.py / ops/solve.check_pose) — and (b) reduce the
    trajectory error on the tail, where odometry drift has accumulated.
    Coarse 48^3 volume (10 cm voxels) makes the drift worth correcting."""
    out = str(tmp_path_factory.mktemp("synth_lc"))
    n, period = 44, 22
    man = generate_dataset(out, n_frames=n, image_size=(160, 120),
                           dim=(4.8,) * 3, amp=0.3, period=period)
    rd = RawDepthReader(man["raw"])
    init = [f * d for f, d in zip(man["init_pos_factor"], man["dim"])]
    kf = KFusion((160, 120), (48,) * 3, man["dim"], init, (10, 5, 4),
                 man["camera"])
    slam = PoseGraphKFusion(
        kf, KeyframeStore(trans_threshold=0.08, rot_threshold=0.08),
        optimize_every=3)
    state = kf.init_state()
    for frame in range(n):
        d = rd.read_next_depth_frame()
        state = slam.process_frame(
            state, jnp.asarray(np.ascontiguousarray(d)), frame)

    n_loops = sum(1 for (i, j, _T, _w) in slam.graph.edges
                  if abs(i - j) > 1)
    assert n_loops >= 1, "revisiting orbit produced no loop closures"

    raw = np.stack(slam._trajectory)
    corr = slam.corrected_trajectory()
    gt = man["poses"][:n, :3, 3]
    tail = slice(n // 2, n)
    e_raw = np.linalg.norm(raw[:, :3, 3] - gt, axis=1)[tail].mean()
    e_corr = np.linalg.norm(corr[:, :3, 3] - gt, axis=1)[tail].mean()
    # Measured on this scene: 0.049 -> 0.038 m (a 23% tail improvement);
    # the assertion only requires strict improvement.
    assert e_corr < e_raw, (e_corr, e_raw)


def test_frontend_keyframes_flag(dataset, tmp_path):
    """--keyframes CLI route: pose-graph backend drives the frame loop
    and exports raw + corrected TUM trajectories next to the log."""
    from slambench_tpu.config import Configuration
    from slambench_tpu.eval.trajectory import read_tum
    from slambench_tpu.frontend import benchmark as fb

    man = dataset
    cfg = Configuration()
    cfg.input_file = man["raw"]
    cfg.log_file = str(tmp_path / "kf.log")
    cfg.volume_resolution = (32, 32, 32)
    cfg.volume_size = man["dim"]
    cfg.initial_pos_factor = man["init_pos_factor"]
    cfg.camera = man["camera"]
    cfg.camera_overrided = True
    cfg.pyramid = (4, 3, 3)
    summary = fb.run(cfg, max_frames=12, quiet=True, keyframes=True)
    assert summary["frames"] == 12
    pg = summary["posegraph"]
    assert len(pg.store.keyframes) >= 1
    raw = read_tum(cfg.log_file + ".kf_raw.tum")
    corr = read_tum(cfg.log_file + ".kf_corrected.tum")
    assert raw.shape == (12, 3) and corr.shape == (12, 3)
    # Corrections are rigid adjustments of a working odometry: the two
    # exports stay within centimetres of each other on a short clip.
    assert np.abs(raw - corr).max() < 0.2


def test_frontend_run_api(dataset, tmp_path):
    from slambench_tpu.config import Configuration
    from slambench_tpu.frontend import benchmark as fb

    man = dataset
    cfg = Configuration()
    cfg.input_file = man["raw"]
    cfg.log_file = str(tmp_path / "out.log")
    cfg.volume_resolution = (32, 32, 32)
    cfg.volume_size = man["dim"]
    cfg.initial_pos_factor = man["init_pos_factor"]
    cfg.camera = man["camera"]
    cfg.camera_overrided = True
    cfg.pyramid = (4, 3, 3)
    summary = fb.run(cfg, fused=True, max_frames=8, quiet=True)
    assert summary["frames"] == 8
    # The log must parse through the reference-contract evaluator.
    from slambench_tpu.eval.check_pos import (
        compute_ate, load_gt_trajectory, parse_benchmark_log,
    )
    log = parse_benchmark_log(cfg.log_file)
    assert len(log["frame"]) == 8
    ate = compute_ate(log, load_gt_trajectory(man["gt"]))
    assert len(ate["ATE"]) == 8
