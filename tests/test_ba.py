"""Schur-complement bundle adjustment tests, incl. the sharded
(collective-reduced) path on the virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from slambench_tpu.geometry import se3_exp
from slambench_tpu.models.ba import bundle_adjust, make_observations
from slambench_tpu.parallel.mesh import make_mesh


def _problem(rng, n_cams=6, n_lms=24, pose_noise=0.05, lm_noise=0.05):
    gt_poses = []
    for i in range(n_cams):
        x = np.array([0.5 * i, 0.1 * np.sin(i), 0.0,
                      0, 0.05 * i, 0], np.float32)
        gt_poses.append(np.asarray(se3_exp(jnp.asarray(x))))
    gt_lms = rng.uniform(-1, 1, size=(n_lms, 3)).astype(np.float32)
    gt_lms[:, 2] += 3.0     # in front of the cameras

    cam, lm, z, w = make_observations(gt_poses, gt_lms)

    noisy_poses = []
    for i, Tp in enumerate(gt_poses):
        if i == 0:
            noisy_poses.append(Tp)   # gauge anchor stays exact
            continue
        n = np.asarray(se3_exp(jnp.asarray(
            (pose_noise * rng.normal(size=6)).astype(np.float32))))
        noisy_poses.append(Tp @ n)
    noisy_lms = gt_lms + lm_noise * rng.normal(size=gt_lms.shape
                                               ).astype(np.float32)
    return (np.stack(gt_poses), gt_lms, np.stack(noisy_poses), noisy_lms,
            cam, lm, z, w)


def test_ba_converges_to_ground_truth(rng):
    gt_p, gt_l, p0, l0, cam, lm, z, w = _problem(rng)
    out_p, out_l, r2 = bundle_adjust(
        jnp.asarray(p0), jnp.asarray(l0), jnp.asarray(cam),
        jnp.asarray(lm), jnp.asarray(z), jnp.asarray(w), n_iters=8)
    out_p, out_l = np.asarray(out_p), np.asarray(out_l)
    pos_err = np.linalg.norm(out_p[:, :3, 3] - gt_p[:, :3, 3], axis=1)
    lm_err = np.linalg.norm(out_l - gt_l, axis=1)
    assert pos_err.max() < 1e-3, pos_err
    assert lm_err.max() < 1e-3, lm_err
    assert float(r2) < 1e-6


def test_ba_padding_inert(rng):
    gt_p, gt_l, p0, l0, cam, lm, z, w = _problem(rng, n_cams=4, n_lms=12)
    # Append garbage zero-weight observations.
    cam2 = np.concatenate([cam, np.zeros(7, np.int32)])
    lm2 = np.concatenate([lm, np.zeros(7, np.int32)])
    z2 = np.concatenate([z, 99 * np.ones((7, 3), np.float32)])
    w2 = np.concatenate([w, np.zeros(7, np.float32)])
    a_p, a_l, _ = bundle_adjust(jnp.asarray(p0), jnp.asarray(l0),
                                jnp.asarray(cam), jnp.asarray(lm),
                                jnp.asarray(z), jnp.asarray(w), n_iters=4)
    b_p, b_l, _ = bundle_adjust(jnp.asarray(p0), jnp.asarray(l0),
                                jnp.asarray(cam2), jnp.asarray(lm2),
                                jnp.asarray(z2), jnp.asarray(w2), n_iters=4)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(b_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_l), np.asarray(b_l), atol=1e-5)


def test_ba_camera_landmark_padding_inert(rng):
    """Identity-pose camera / zero landmark padding (the keyframes
    backend's N/M power-of-two capacity tiers, models/keyframes.py
    _optimize_ba) must not move the real solution: padded blocks have
    no observations, so under per-block damping their update is exactly
    zero and the Schur system is block-diagonal across the split."""
    gt_p, gt_l, p0, l0, cam, lm, z, w = _problem(rng, n_cams=4, n_lms=12)
    p0_pad = np.concatenate(
        [p0, np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))])
    l0_pad = np.concatenate([l0, np.zeros((4, 3), np.float32)])
    a_p, a_l, _ = bundle_adjust(jnp.asarray(p0), jnp.asarray(l0),
                                jnp.asarray(cam), jnp.asarray(lm),
                                jnp.asarray(z), jnp.asarray(w),
                                n_iters=4, n_cg=24)
    b_p, b_l, _ = bundle_adjust(jnp.asarray(p0_pad), jnp.asarray(l0_pad),
                                jnp.asarray(cam), jnp.asarray(lm),
                                jnp.asarray(z), jnp.asarray(w),
                                n_iters=4, n_cg=24)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(b_p)[:4],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_l), np.asarray(b_l)[:12],
                               atol=1e-5)
    # Padded entries stay exactly where they started.
    np.testing.assert_array_equal(np.asarray(b_p)[4:],
                                  np.tile(np.eye(4, dtype=np.float32),
                                          (4, 1, 1)))
    np.testing.assert_array_equal(np.asarray(b_l)[12:],
                                  np.zeros((4, 3), np.float32))


def test_ba_sharded_matches_single(rng):
    """Observation-sharded BA over an 8-device mesh: one psum assembles
    the normal equations; result must match the single-device solve."""
    gt_p, gt_l, p0, l0, cam, lm, z, w = _problem(rng, n_cams=4, n_lms=16)
    # Pad observations to a multiple of 8.
    K = len(cam)
    pad = (-K) % 8
    cam = np.concatenate([cam, np.zeros(pad, np.int32)])
    lm = np.concatenate([lm, np.zeros(pad, np.int32)])
    z = np.concatenate([z, np.zeros((pad, 3), np.float32)])
    w = np.concatenate([w, np.zeros(pad, np.float32)])

    single_p, single_l, _ = bundle_adjust(
        jnp.asarray(p0), jnp.asarray(l0), jnp.asarray(cam),
        jnp.asarray(lm), jnp.asarray(z), jnp.asarray(w), n_iters=4)

    mesh = make_mesh(8)
    fn = jax.jit(jax.shard_map(
        lambda P0, L0, c, l, zz, ww: bundle_adjust(
            P0, L0, c, l, zz, ww, n_iters=4, axis_name="z"),
        mesh=mesh,
        in_specs=(P(), P(), P("z"), P("z"), P("z"), P("z")),
        out_specs=(P(), P(), P()),
        check_vma=False))
    sh_p, sh_l, _ = fn(jnp.asarray(p0), jnp.asarray(l0), jnp.asarray(cam),
                       jnp.asarray(lm), jnp.asarray(z), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(sh_p), np.asarray(single_p),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(sh_l), np.asarray(single_l),
                               atol=1e-4)
