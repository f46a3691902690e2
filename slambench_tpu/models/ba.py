"""Bundle adjustment with Schur-complement landmark marginalization,
distributed over observation shards.

Beyond-reference layer (BASELINE.json: "distributed bundle adjustment via
Schur-complement reduction over collectives"). Problem form: camera-to-
world poses ``T_i``, world landmarks ``X_l``, and 3-D observations
``z_{il}`` of landmark ``l`` in camera ``i``'s frame (the natural
measurement model for depth-camera SLAM — back-projected depth pixels).
Residual ``r = T_i^{-1} X_l - z`` with analytic Jacobians
``J_cam = [-I | hat(p)]`` (right perturbation) and ``J_lm = R_i^T``.

One Gauss-Newton step:
  1. **Per-observation products** (sharded axis): every device computes
     ``J^T J`` / ``J^T r`` contributions for its observation slice and
     ``segment_sum``s them into per-camera ``Hcc``, per-landmark ``Hll``
     and per-(camera, landmark) ``Hcl`` blocks.
  2. **Collective assembly**: one ``psum`` over the mesh completes the
     blocks (the only communication — the classic distributed-BA
     reduction).
  3. **Schur complement** (replicated): ``S = Hcc - Hcl Hll^-1 Hlc``
     eliminates all landmarks; the reduced 6N x 6N camera system is
     solved with damping + a gauge prior, then landmarks back-substitute
     locally.

Capacities are static (jit-friendly); zero-weight observations are
inert padding.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from slambench_tpu.geometry import mat4mul, rigid_inverse, se3_exp


def _hat(v):
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
    ], axis=-2)


@functools.partial(
    jax.jit, static_argnames=("n_iters", "axis_name"))
def bundle_adjust(poses: jax.Array,        # [N, 4, 4]
                  landmarks: jax.Array,    # [M, 3]
                  obs_cam: jax.Array,      # [K] int32
                  obs_lm: jax.Array,       # [K] int32
                  obs_z: jax.Array,        # [K, 3] camera-frame points
                  obs_w: jax.Array,        # [K] weights (0 = padding)
                  n_iters: int = 5,
                  damping: float = 1e-4,
                  prior_weight: float = 1e6,
                  axis_name: Optional[str] = None
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (poses, landmarks, final weighted squared residual)."""
    N = poses.shape[0]
    M = landmarks.shape[0]
    hp = jax.lax.Precision.HIGHEST

    def gn_step(carry, _):
        poses, landmarks = carry

        Ti = poses[obs_cam]                          # [K, 4, 4]
        Rt = jnp.swapaxes(Ti[:, :3, :3], 1, 2)        # [K, 3, 3] R^T
        t = Ti[:, :3, 3]
        X = landmarks[obs_lm]                        # [K, 3]
        p = jnp.einsum("kab,kb->ka", Rt, X - t, precision=hp)
        r = (p - obs_z) * obs_w[:, None]

        # J_cam = [-I | hat(p)]  (3x6);  J_lm = R^T  (3x3).
        Jc = jnp.concatenate(
            [-jnp.broadcast_to(jnp.eye(3), (p.shape[0], 3, 3)),
             _hat(p)], axis=2)                       # [K, 3, 6]
        Jl = Rt                                      # [K, 3, 3]
        w = obs_w[:, None, None]

        Hcc_k = w * jnp.einsum("kai,kaj->kij", Jc, Jc, precision=hp)
        Hll_k = w * jnp.einsum("kai,kaj->kij", Jl, Jl, precision=hp)
        Hcl_k = w * jnp.einsum("kai,kaj->kij", Jc, Jl, precision=hp)
        bc_k = jnp.einsum("kai,ka->ki", Jc, r, precision=hp)
        bl_k = jnp.einsum("kai,ka->ki", Jl, r, precision=hp)

        Hcc = jax.ops.segment_sum(Hcc_k, obs_cam, N)         # [N, 6, 6]
        Hll = jax.ops.segment_sum(Hll_k, obs_lm, M)          # [M, 3, 3]
        bc = jax.ops.segment_sum(bc_k, obs_cam, N)           # [N, 6]
        bl = jax.ops.segment_sum(bl_k, obs_lm, M)            # [M, 3]
        # Cross blocks: dense [N, M, 6, 3] via joint segment ids.
        joint = obs_cam * M + obs_lm
        Hcl = jax.ops.segment_sum(Hcl_k, joint, N * M).reshape(N, M, 6, 3)
        r2 = jnp.sum(r * r)

        if axis_name is not None:
            Hcc = jax.lax.psum(Hcc, axis_name)
            Hll = jax.lax.psum(Hll, axis_name)
            Hcl = jax.lax.psum(Hcl, axis_name)
            bc = jax.lax.psum(bc, axis_name)
            bl = jax.lax.psum(bl, axis_name)
            r2 = jax.lax.psum(r2, axis_name)

        # Landmark marginalization (Schur).
        Hll_d = Hll + damping * jnp.eye(3)
        Hll_inv = jnp.linalg.inv(Hll_d)                       # [M, 3, 3]
        # S = blockdiag(Hcc) - Hcl Hll^-1 Hlc
        HclW = jnp.einsum("imab,mbc->imac", Hcl, Hll_inv,
                          precision=hp)                       # [N, M, 6, 3]
        S_off = jnp.einsum("imac,jmdc->ijad", HclW, Hcl,
                           precision=hp)                      # [N, N, 6, 6]
        S = -S_off
        diag = jnp.arange(N)
        S = S.at[diag, diag].add(Hcc)
        b_red = bc - jnp.einsum("imac,mc->ia", HclW, bl, precision=hp)

        # Gauge prior + damping; dense solve of the reduced system.
        S = S.at[0, 0].add(prior_weight * jnp.eye(6))
        Sd = S.transpose(0, 2, 1, 3).reshape(6 * N, 6 * N)
        Sd = Sd + damping * jnp.eye(6 * N)
        dc = jnp.linalg.solve(Sd, -b_red.reshape(-1)).reshape(N, 6)

        # Back-substitute landmarks:
        # dl = Hll^-1 (-bl - Hlc dc)
        Hlc_dc = jnp.einsum("imab,ia->mb", Hcl, dc, precision=hp)
        dl = jnp.einsum("mbc,mc->mb", Hll_inv, -bl - Hlc_dc, precision=hp)

        new_poses = jax.vmap(lambda T, d: mat4mul(T, se3_exp(d)))(poses, dc)
        new_landmarks = landmarks + dl
        return (new_poses, new_landmarks), r2

    (poses, landmarks), r2s = jax.lax.scan(
        gn_step, (poses, landmarks), None, length=n_iters)
    return poses, landmarks, r2s[-1]


def make_observations(poses, landmarks, noise=0.0, rng=None):
    """Test helper: perfect (optionally noisy) camera-frame observations
    of every landmark from every pose."""
    import numpy as np
    N = len(poses)
    M = len(landmarks)
    cam, lm, z = [], [], []
    for i in range(N):
        Ti = np.linalg.inv(poses[i])
        for l in range(M):
            p = Ti[:3, :3] @ landmarks[l] + Ti[:3, 3]
            if noise and rng is not None:
                p = p + noise * rng.normal(size=3)
            cam.append(i)
            lm.append(l)
            z.append(p)
    return (np.asarray(cam, np.int32), np.asarray(lm, np.int32),
            np.asarray(z, np.float32),
            np.ones(len(cam), np.float32))
