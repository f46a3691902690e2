"""End-to-end golden-trajectory test: the reference's accuracy gate
(reference: Makefile:46-72 + checkPos.py bounds, README.md:374-380),
driven by the synthetic ground-truth dataset instead of the wget'd
ICL-NUIM files (no network in this environment)."""

import numpy as np
import jax.numpy as jnp
import pytest

from slambench_tpu.io.readers import RawDepthReader
from slambench_tpu.io.synthetic import generate_dataset
from slambench_tpu.pipeline import KFusion


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("synth"))
    return generate_dataset(out, n_frames=30, image_size=(160, 120),
                            dim=(4.8, 4.8, 4.8), amp=0.12)


def _run(dataset, n_frames=30, vol_res=64, backend="auto", **kw):
    man = dataset
    rd = RawDepthReader(man["raw"])
    W, H = man["image_size"]
    init = [f * d for f, d in zip(man["init_pos_factor"], man["dim"])]
    kf = KFusion((W, H), (vol_res,) * 3, man["dim"], init,
                 (10, 5, 4), man["camera"], backend=backend, **kw)
    state = kf.init_state()
    errs, tracked = [], []
    for frame in range(n_frames):
        d = rd.read_next_depth_frame()
        if d is None:
            break
        state = kf.process_frame(state, jnp.asarray(np.ascontiguousarray(d)),
                                 frame)
        errs.append(np.linalg.norm(
            np.asarray(state.pose[:3, 3]) - man["poses"][frame, :3, 3]))
        tracked.append(bool(state.tracked))
    return np.asarray(errs), np.asarray(tracked), state, kf


def test_synthetic_trajectory_ate(dataset):
    errs, tracked, state, kf = _run(dataset)
    # 64^3 over 4.8 m => 7.5 cm voxels; sub-voxel tracking required.
    assert errs.mean() < 0.06, f"mean ATE {errs.mean():.4f} m"
    assert errs.max() < 0.15, f"max ATE {errs.max():.4f} m"
    # Bootstrap frames are untracked (no reference maps before frame 4).
    assert not tracked[0]
    assert tracked[4:].all(), "lost tracking mid-sequence"


def test_pallas_backend_e2e(dataset):
    """Full pipeline with backend='pallas' (Pallas reduce + bilateral,
    interpreter off-TPU): trajectory must match the XLA backend closely —
    the buffer-level parity tests live in test_pallas.py, this is the
    end-to-end gate VERDICT r1 asked for."""
    errs_x, tracked_x, _, _ = _run(dataset, n_frames=14)
    errs_p, tracked_p, _, _ = _run(dataset, n_frames=14, backend="pallas")
    assert tracked_p[4:].all()
    np.testing.assert_allclose(errs_p, errs_x, atol=2e-3)


def test_cv_motion_model_e2e(dataset):
    """Constant-velocity ICP warm start: the trajectory must stay inside
    the same accuracy gate as the reference-style previous-pose start
    (the prediction only moves the ICP *initial guess*; convergence is
    to the same optimum on this smooth clip)."""
    errs, tracked, _, _ = _run(dataset, motion_model="cv")
    assert errs.mean() < 0.06, f"mean ATE {errs.mean():.4f} m"
    assert tracked[4:].all(), "cv warm start lost tracking"


def test_blocked_integrate_e2e(dataset, monkeypatch):
    """Pipeline with the frustum-culled 8x8x2 block integrate forced on
    (the TPU default; CPU default is monolithic): same gate, and the
    trajectory must match the monolithic run to sub-voxel."""
    monkeypatch.setenv("SLAMBENCH_INTEGRATE_BLOCKS", "8x8x2")
    errs_b, tracked_b, _, kf = _run(dataset, n_frames=14)
    assert kf.integrate_block_grid == (8, 8, 2)
    monkeypatch.setenv("SLAMBENCH_INTEGRATE_BLOCKS", "0")
    errs_m, tracked_m, _, kf2 = _run(dataset, n_frames=14)
    assert kf2.integrate_block_grid == (1, 1, 1)
    assert tracked_b[4:].all()
    np.testing.assert_allclose(errs_b, errs_m, atol=2e-3)


def test_scan_batched_frames_match_per_frame(dataset):
    """compute_frames_scan (dispatch batching for the tunneled
    endpoint) vs per-frame dispatch: same fused step, same order, only
    the dispatch granularity differs. Measured: NOT bit-identical —
    XLA contracts FMAs differently inside the scan body than in the
    standalone jit (max 5.7e-6 m pose drift over 7 frames, the same
    ulp class as the blocked-integrate contract). On the TSDF the pose
    ulps surface as (measured, 64^3/7 frames): 0.29% of voxels off by
    1 LSB (rounding), 5 voxels beyond 2 LSB and ONE knife-edge voxel
    whose ``diff > -mu`` update mask flipped (1665 LSB) — so the
    assert is 0.1 mm on positions, <2% voxels off at all, <1e-4 of
    them beyond 2 LSB."""
    man = dataset
    init = [f * d for f, d in zip(man["init_pos_factor"], man["dim"])]
    args = ((160, 120), (64, 64, 64), man["dim"], init, (10, 5, 4),
            man["camera"])
    rd = RawDepthReader(man["raw"])
    frames = [jnp.asarray(np.ascontiguousarray(rd.read_next_depth_frame()))
              for _ in range(12)]

    def boot(kf):
        s = kf.init_state()
        for f in range(5):
            s = kf.compute_frame(s, frames[f], tracking_on=True,
                                 integrate_frame=True,
                                 force_integrate=(f <= 3),
                                 raycast_on=(f > 2))
        return s

    kf1 = KFusion(*args, backend="fast")
    s1 = boot(kf1)
    poses1 = []
    for f in range(5, 12):
        s1 = kf1.compute_frame(s1, frames[f], tracking_on=True,
                               integrate_frame=True, force_integrate=False,
                               raycast_on=True)
        poses1.append(np.asarray(s1.pose[:3, 3]))

    kf2 = KFusion(*args, backend="fast")
    s2 = boot(kf2)
    s2, outs = kf2.compute_frames_scan(s2, jnp.stack(frames[5:12]))
    np.testing.assert_allclose(np.asarray(outs["pos"]),
                               np.asarray(poses1), atol=1e-4)
    assert np.asarray(outs["tracked"]).all()
    assert np.asarray(outs["integrated"]).all()
    d = np.abs(np.asarray(s2.tsdf, np.int32) - np.asarray(s1.tsdf, np.int32))
    assert (d > 0).mean() < 0.02, f"{(d > 0).mean():.4f} voxels differ"
    assert (d > 2).mean() < 1e-4, f"{(d > 2).sum()} voxels beyond 2 LSB"


def test_integrate_blocks_env_forms(monkeypatch):
    """SLAMBENCH_INTEGRATE_BLOCKS accepts NZ / NZxNY / NZxNYxNX and
    rejects malformed values loudly."""
    args = ((16, 12), (16,) * 3, (2.0,) * 3, (1, 1, 0), (2, 2),
            (30.0, 30.0, 8.0, 6.0))
    for blk, want in (("8", (8, 1, 1)), ("8x4", (8, 4, 1)),
                      ("8x4x2", (8, 4, 2))):
        monkeypatch.setenv("SLAMBENCH_INTEGRATE_BLOCKS", blk)
        assert KFusion(*args).integrate_block_grid == want
    monkeypatch.setenv("SLAMBENCH_INTEGRATE_BLOCKS", "8x4x2x1")
    with pytest.raises(ValueError, match="INTEGRATE_BLOCKS"):
        KFusion(*args)


def test_motion_model_validation():
    with pytest.raises(ValueError):
        KFusion((16, 12), (16,) * 3, (2.0,) * 3, (1, 1, 0), (2, 2),
                (30.0, 30.0, 8.0, 6.0), motion_model="accel")


def test_backend_validation():
    with pytest.raises(ValueError):
        KFusion((16, 12), (16,) * 3, (2.0,) * 3, (1, 1, 0), (2, 2),
                (30.0, 30.0, 8.0, 6.0), backend="palas")


def test_bootstrap_semantics(dataset):
    # Frames 0..3 must force integration regardless of tracking
    # (reference: cpp/kernels.cpp:994 'frame <= 3').
    man = dataset
    rd = RawDepthReader(man["raw"])
    W, H = man["image_size"]
    init = [f * d for f, d in zip(man["init_pos_factor"], man["dim"])]
    kf = KFusion((W, H), (32, 32, 32), man["dim"], init, (3, 2, 2),
                 man["camera"])
    state = kf.init_state()
    for frame in range(4):
        d = rd.read_next_depth_frame()
        state = kf.process_frame(state, jnp.asarray(np.ascontiguousarray(d)),
                                 frame)
        assert bool(state.integrated)
    # The volume must now contain a surface (weights written).
    assert int((np.asarray(state.weight) > 0).sum()) > 100


def test_checkpoint_resume_identical(dataset):
    """Serializing the state pytree and resuming must reproduce the same
    trajectory (capability superset of the reference's volume dump,
    SURVEY.md §5.4)."""
    import dataclasses
    man = dataset
    rd = RawDepthReader(man["raw"])
    W, H = man["image_size"]
    init = [f * d for f, d in zip(man["init_pos_factor"], man["dim"])]
    kf = KFusion((W, H), (32, 32, 32), man["dim"], init, (4, 3, 3),
                 man["camera"])
    state = kf.init_state()
    depths = []
    for frame in range(12):
        d = rd.read_next_depth_frame()
        depths.append(np.ascontiguousarray(d))
        state = kf.process_frame(state, jnp.asarray(depths[-1]), frame)
        if frame == 5:
            saved = {f.name: np.asarray(getattr(state, f.name))
                     for f in dataclasses.fields(state)}
    final_pose = np.asarray(state.pose)

    # Resume from the frame-5 snapshot.
    from slambench_tpu.pipeline import KFusionState
    state2 = KFusionState(**{k: jnp.asarray(v.copy()) for k, v in saved.items()})
    for frame in range(6, 12):
        state2 = kf.process_frame(state2, jnp.asarray(depths[frame]), frame)
    np.testing.assert_allclose(np.asarray(state2.pose), final_pose,
                               atol=1e-6)


def test_rated_scan_matches_per_frame(dataset):
    """compute_frames_scan_rated (dispatch batching for rate-gated
    schedules, e.g. the reference Makefile's -r 2) vs per-frame
    dispatch: same gates per frame, same ulp-class contract as the
    steady-state scan test above."""
    man = dataset
    init = [f * d for f, d in zip(man["init_pos_factor"], man["dim"])]
    args = ((160, 120), (64, 64, 64), man["dim"], init, (10, 5, 4),
            man["camera"])
    rd = RawDepthReader(man["raw"])
    frames = [jnp.asarray(np.ascontiguousarray(rd.read_next_depth_frame()))
              for _ in range(12)]

    def boot(kf):
        s = kf.init_state()
        for f in range(4):
            s = kf.compute_frame(s, frames[f], tracking_on=True,
                                 integrate_frame=(f % 2 == 0),
                                 force_integrate=(f <= 3),
                                 raycast_on=(f > 2))
        return s

    kf1 = KFusion(*args, backend="fast")
    s1 = boot(kf1)
    poses1, integ1 = [], []
    for f in range(4, 12):
        s1 = kf1.compute_frame(s1, frames[f], tracking_on=True,
                               integrate_frame=(f % 2 == 0),
                               force_integrate=False, raycast_on=True)
        poses1.append(np.asarray(s1.pose[:3, 3]))
        integ1.append(bool(s1.integrated))

    kf2 = KFusion(*args, backend="fast")
    s2 = boot(kf2)
    stacked = jnp.stack(frames[4:12]).reshape(4, 2, 120, 160)
    s2, outs = kf2.compute_frames_scan_rated(
        s2, stacked, tracking_rate=1, integration_rate=2, phase=0)
    np.testing.assert_allclose(np.asarray(outs["pos"]),
                               np.asarray(poses1), atol=1e-4)
    # The integrate gate alternates exactly like the per-frame -r 2 run.
    np.testing.assert_array_equal(np.asarray(outs["integrated"]),
                                  np.asarray(integ1))
    d = np.abs(np.asarray(s2.tsdf, np.int32) - np.asarray(s1.tsdf, np.int32))
    assert (d > 0).mean() < 0.02
    assert (d > 2).mean() < 1e-4
