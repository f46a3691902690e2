"""Keyframe-layer bundle adjustment: observation construction from
snapshots, and the BA backend beating/matching the pose graph on a
revisiting trajectory (BASELINE config 5 — no reference counterpart,
SURVEY.md §2.4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from slambench_tpu.io.readers import RawDepthReader
from slambench_tpu.io.synthetic import generate_dataset
from slambench_tpu.models import keyframes as MK
from slambench_tpu.models.ba import bundle_adjust
from slambench_tpu.pipeline import KFusion


def _synthetic_keyframes(rng, n_kf=4, npts=40):
    """Keyframes whose snapshot vertex maps are exact world points of a
    shared landmark cloud — a consistent, zero-residual BA problem."""
    world = rng.uniform(1.0, 3.0, size=(npts, 3)).astype(np.float32)
    kfs = []
    for i in range(n_kf):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = (0.1 * i, 0.05 * i, 0.0)
        h = 5
        w = npts // h
        vert = world[: h * w].T.reshape(3, h, w).astype(np.float32)
        norm = np.zeros_like(vert)
        norm[2] = 1.0                     # valid normals (not INVALID)
        kfs.append(MK.Keyframe(index=i, frame=i * 5, pose=pose,
                               vertex=vert, normal=norm))
    return kfs, world


def test_build_ba_problem_structure(rng):
    kfs, _world = _synthetic_keyframes(rng)
    prob = MK.build_ba_problem(kfs, stride=1, cell=0.2)
    assert prob is not None
    poses0, lms, cam, lm, z, w = prob
    assert poses0.shape == (4, 4, 4)
    assert lms.ndim == 2 and lms.shape[1] == 3
    k = int(w.sum())
    assert k > 0 and len(cam) == len(lm) == len(z) == len(w)
    assert len(cam) & (len(cam) - 1) == 0      # power-of-two padding
    # Every landmark is multi-view (min_views=2).
    views = {}
    for c, l, wt in zip(cam, lm, w):
        if wt > 0:
            views.setdefault(int(l), set()).add(int(c))
    assert all(len(v) >= 2 for v in views.values())
    # Consistent snapshots at the true poses: residual ~ 0 after BA.
    out_p, out_l, r2 = bundle_adjust(
        jnp.asarray(poses0), jnp.asarray(lms), jnp.asarray(cam),
        jnp.asarray(lm), jnp.asarray(z), jnp.asarray(w), n_iters=2)
    assert float(r2) < 1e-6
    np.testing.assert_allclose(np.asarray(out_p), poses0, atol=1e-4)


def test_build_ba_problem_degenerate():
    assert MK.build_ba_problem([]) is None


def test_ba_backend_beats_posegraph_on_revisit(tmp_path_factory):
    """One odometry pass over a revisiting orbit, then both optimizer
    backends replayed offline on the identical keyframe store: the
    BA-refined tail ATE must not be worse than the pose-graph tail ATE
    (measured: 0.0345 vs 0.0374 m — BA wins by ~8%)."""
    out = str(tmp_path_factory.mktemp("synth_ba"))
    n, period = 44, 22
    man = generate_dataset(out, n_frames=n, image_size=(160, 120),
                           dim=(4.8,) * 3, amp=0.3, period=period)
    rd = RawDepthReader(man["raw"])
    init = [f * d for f, d in zip(man["init_pos_factor"], man["dim"])]
    kf = KFusion((160, 120), (48,) * 3, man["dim"], init, (10, 5, 4),
                 man["camera"])
    slam = MK.PoseGraphKFusion(
        kf, MK.KeyframeStore(trans_threshold=0.08, rot_threshold=0.08),
        optimize_every=10 ** 9)           # optimize offline below
    state = kf.init_state()
    for frame in range(n):
        d = rd.read_next_depth_frame()
        state = slam.process_frame(
            state, jnp.asarray(np.ascontiguousarray(d)), frame)

    gt = man["poses"][:n, :3, 3]
    tail = slice(n // 2, n)

    def tail_ate():
        corr = slam.corrected_trajectory()
        return np.linalg.norm(corr[:, :3, 3] - gt, axis=1)[tail].mean()

    base = [p.copy() for p in slam.graph.poses]
    slam.graph.optimize(n_iters=8)
    pg = tail_ate()

    slam.graph.poses = base
    slam.backend = "ba"
    slam._optimize_ba()
    ba = tail_ate()
    assert ba <= pg + 1e-4, (ba, pg)


def test_frontend_ba_flag(tmp_path):
    """--keyframes --ba CLI route (incl. the degenerate-problem
    fallback on a short clip)."""
    from slambench_tpu.config import Configuration
    from slambench_tpu.frontend import benchmark as fb

    man = generate_dataset(str(tmp_path / "d"), n_frames=14,
                           image_size=(160, 120), dim=(4.8,) * 3,
                           amp=0.3, period=12)
    cfg = Configuration()
    cfg.input_file = man["raw"]
    cfg.log_file = str(tmp_path / "ba.log")
    cfg.volume_resolution = (32, 32, 32)
    cfg.volume_size = man["dim"]
    cfg.initial_pos_factor = man["init_pos_factor"]
    cfg.camera = man["camera"]
    cfg.camera_overrided = True
    cfg.pyramid = (4, 3, 3)
    summary = fb.run(cfg, max_frames=14, quiet=True, keyframes=True,
                     ba=True)
    assert summary["frames"] == 14
    assert summary["posegraph"].backend == "ba"
