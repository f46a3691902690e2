"""Bundle adjustment with Schur-complement landmark marginalization,
distributed over observation shards — SPARSE formulation.

Beyond-reference layer (BASELINE.json: "distributed bundle adjustment via
Schur-complement reduction over collectives"). Problem form: camera-to-
world poses ``T_i``, world landmarks ``X_l``, and 3-D observations
``z_{il}`` of landmark ``l`` in camera ``i``'s frame (the natural
measurement model for depth-camera SLAM — back-projected depth pixels).
Residual ``r = T_i^{-1} X_l - z`` with analytic Jacobians
``J_cam = [-I | hat(p)]`` (right perturbation) and ``J_lm = R_i^T``.

One Gauss-Newton step (everything O(K) in the observation count — no
``[N, M]`` or ``[N, N]`` dense blocks are ever materialized, so the
formulation scales to realistic keyframe/landmark counts, unlike the
round-4 dense assembly this replaces):

  1. **Per-observation products** (sharded axis): every device computes
     the 6x6/3x3 diagonal blocks ``Hcc``/``Hll`` and gradient terms for
     its observation slice via ``segment_sum``; the 6x3 cross blocks
     ``Hcl_k`` stay PER-OBSERVATION (sparse — one block per edge of the
     camera-landmark bipartite graph).
  2. **Collective assembly**: one ``psum`` over the mesh completes the
     diagonal blocks and gradients (the classic distributed-BA
     reduction). The cross blocks never need a global form.
  3. **Matrix-free Schur solve**: the reduced camera system
     ``S dc = -b_red`` with ``S = blkdiag(Hcc) - Hcl Hll^-1 Hlc`` is
     solved by preconditioned conjugate gradients where each ``S @ x``
     product is two sparse scatter/gather passes over the observation
     edges (+ one ``psum`` pair when sharded); the preconditioner is
     the inverse block diagonal. Landmarks then back-substitute locally.

Capacities are static (jit-friendly); zero-weight observations are
inert padding.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from slambench_tpu.geometry import mat4mul, se3_exp


def _hat(v):
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
    ], axis=-2)


@functools.partial(
    jax.jit, static_argnames=("n_iters", "n_cg", "axis_name"))
def bundle_adjust(poses: jax.Array,        # [N, 4, 4]
                  landmarks: jax.Array,    # [M, 3]
                  obs_cam: jax.Array,      # [K] int32
                  obs_lm: jax.Array,       # [K] int32
                  obs_z: jax.Array,        # [K, 3] camera-frame points
                  obs_w: jax.Array,        # [K] weights (0 = padding)
                  n_iters: int = 5,
                  damping: float = 1e-4,
                  prior_weight: float = 1e6,
                  n_cg: int = 0,
                  axis_name: Optional[str] = None
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (poses, landmarks, final weighted squared residual).

    ``n_cg``: conjugate-gradient iterations for the reduced camera
    system (0 = ``min(6N, 64)``; with the block-Jacobi preconditioner
    the system converges far before the 6N exact-arithmetic bound).
    """
    N = poses.shape[0]
    M = landmarks.shape[0]
    hp = jax.lax.Precision.HIGHEST
    if n_cg <= 0:
        n_cg = min(6 * N, 64)

    def psum(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

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
        # Sparse cross blocks: one [6, 3] block per observation edge.
        Hcl_k = w * jnp.einsum("kai,kaj->kij", Jc, Jl, precision=hp)
        bc_k = jnp.einsum("kai,ka->ki", Jc, r, precision=hp)
        bl_k = jnp.einsum("kai,ka->ki", Jl, r, precision=hp)

        Hcc = psum(jax.ops.segment_sum(Hcc_k, obs_cam, N))   # [N, 6, 6]
        Hll = psum(jax.ops.segment_sum(Hll_k, obs_lm, M))    # [M, 3, 3]
        bc = psum(jax.ops.segment_sum(bc_k, obs_cam, N))     # [N, 6]
        bl = psum(jax.ops.segment_sum(bl_k, obs_lm, M))      # [M, 3]
        r2 = psum(jnp.sum(r * r))

        # Landmark marginalization (Schur), matrix-free.
        Hll_d = Hll + damping * jnp.eye(3)
        Hll_inv = jnp.linalg.inv(Hll_d)                       # [M, 3, 3]

        def S_mv(x):                                  # x: [N, 6] replicated
            # y_l = sum_k Hcl_k^T x_{cam_k}  (scatter to landmarks)
            y = psum(jax.ops.segment_sum(
                jnp.einsum("kab,ka->kb", Hcl_k, x[obs_cam],
                           precision=hp), obs_lm, M))         # [M, 3]
            z = jnp.einsum("mbc,mc->mb", Hll_inv, y, precision=hp)
            # w_i = sum_k Hcl_k z_{lm_k}  (gather back to cameras)
            wv = psum(jax.ops.segment_sum(
                jnp.einsum("kab,kb->ka", Hcl_k, z[obs_lm],
                           precision=hp), obs_cam, N))        # [N, 6]
            Sx = jnp.einsum("nab,nb->na", Hcc, x, precision=hp) - wv
            Sx = Sx + damping * x
            return Sx.at[0].add(prior_weight * x[0])

        # Reduced gradient: b_red = bc - Hcl Hll^-1 bl (sparse pass).
        zb = jnp.einsum("mbc,mc->mb", Hll_inv, bl, precision=hp)
        b_red = bc - psum(jax.ops.segment_sum(
            jnp.einsum("kab,kb->ka", Hcl_k, zb[obs_lm], precision=hp),
            obs_cam, N))

        # Block-Jacobi preconditioner: inverse of S's diagonal blocks
        # (exactly Hcc + damping + prior — the Hcl Hll^-1 Hlc diagonal
        # contribution is dropped, standard for Schur-CG).
        P_blk = Hcc + damping * jnp.eye(6)
        P_blk = P_blk.at[0].add(prior_weight * jnp.eye(6))
        P_inv = jnp.linalg.inv(P_blk)                        # [N, 6, 6]

        def prec(x):
            return jnp.einsum("nab,nb->na", P_inv, x, precision=hp)

        # Preconditioned CG on S dc = -b_red (fixed iteration count —
        # jit-friendly; a vanishing residual makes further iterations
        # inert via the eps-guarded step sizes).
        b = -b_red
        x0 = jnp.zeros_like(b)
        r0 = b
        z0 = prec(r0)
        p0 = z0
        rz0 = jnp.sum(r0 * z0)

        def cg_step(cg, _):
            x, rr, z, pk, rz = cg
            Sp = S_mv(pk)
            alpha = rz / jnp.maximum(jnp.sum(pk * Sp), 1e-30)
            x = x + alpha * pk
            rr = rr - alpha * Sp
            z = prec(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            pk = z + beta * pk
            return (x, rr, z, pk, rz_new), rz_new

        (dc, _, _, _, _), _ = jax.lax.scan(
            cg_step, (x0, r0, z0, p0, rz0), None, length=n_cg)

        # Back-substitute landmarks: dl = Hll^-1 (-bl - Hlc dc).
        Hlc_dc = psum(jax.ops.segment_sum(
            jnp.einsum("kab,ka->kb", Hcl_k, dc[obs_cam], precision=hp),
            obs_lm, M))
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
