"""Core geometry: camera intrinsics, rigid transforms, SE(3) exponential,
and the 6x6 normal-equations solve.

TPU-native equivalents of the reference's math substrate
(reference: kfusion/include/commons.h:317-412). Everything here is pure
jnp, float32, and jittable; the SE(3) exponential reproduces TooN's
`SE3<>::exp` three-branch Taylor structure and the solve reproduces
`TooN::GR_SVD::backsub` with its 1e6 condition clamp
(reference: commons.h:398-404).

Conventions
-----------
* ``Matrix4``: a ``[4, 4]`` float32 array, row-major, same layout as the
  reference's ``sMatrix4`` (reference: commons.h:317-319).
* Point/vector maps are stored component-first: shape ``[3, ...]`` so that
  the trailing (pixel) dimensions map onto the TPU's (sublane, lane) tiling
  instead of padding a 3-wide minor dimension to 128 lanes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_camera_matrix(k: jax.Array) -> jax.Array:
    """4x4 projection matrix from intrinsics ``k = (fx, fy, cx, cy)``.

    Reference: commons.h:343-350 ``getCameraMatrix``.
    """
    fx, fy, cx, cy = k[0], k[1], k[2], k[3]
    z = jnp.zeros((), jnp.float32)
    o = jnp.ones((), jnp.float32)
    return jnp.stack([
        jnp.stack([fx, z, cx, z]),
        jnp.stack([z, fy, cy, z]),
        jnp.stack([z, z, o, z]),
        jnp.stack([z, z, z, o]),
    ]).astype(jnp.float32)


def get_inverse_camera_matrix(k: jax.Array) -> jax.Array:
    """Inverse projection matrix (reference: commons.h:352-359)."""
    fx, fy, cx, cy = k[0], k[1], k[2], k[3]
    z = jnp.zeros((), jnp.float32)
    o = jnp.ones((), jnp.float32)
    return jnp.stack([
        jnp.stack([1.0 / fx, z, -cx / fx, z]),
        jnp.stack([z, 1.0 / fy, -cy / fy, z]),
        jnp.stack([z, z, o, z]),
        jnp.stack([z, z, z, o]),
    ]).astype(jnp.float32)


def mat4mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """4x4 (or any small) matrix product at full float32 precision.

    On TPU, plain ``@`` runs the MXU at bf16 input precision by default —
    a ~2^-12 relative error that would quantize pose translations to
    ~0.5 mm per composition. All pose/intrinsics compositions go through
    this helper instead.
    """
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def transform(m: jax.Array, v: jax.Array) -> jax.Array:
    """Apply the affine part of a Matrix4 to points ``v`` of shape [3, ...].

    Equivalent to the reference's ``Matrix4 * float3`` operator
    (reference: commons.h:331-336): rotation plus translation, ignoring the
    bottom row. Written as explicit VPU arithmetic (not a matmul) so the
    TPU keeps full f32 precision and XLA fuses it into neighbours.
    """
    return jnp.stack([
        m[0, 0] * v[0] + m[0, 1] * v[1] + m[0, 2] * v[2] + m[0, 3],
        m[1, 0] * v[0] + m[1, 1] * v[1] + m[1, 2] * v[2] + m[1, 3],
        m[2, 0] * v[0] + m[2, 1] * v[1] + m[2, 2] * v[2] + m[2, 3],
    ])


def rotate(m: jax.Array, v: jax.Array) -> jax.Array:
    """Apply only the rotation/linear part of a Matrix4 to [3, ...] vectors.

    Reference: commons.h:338-341 ``rotate``.
    """
    return jnp.stack([
        m[0, 0] * v[0] + m[0, 1] * v[1] + m[0, 2] * v[2],
        m[1, 0] * v[0] + m[1, 1] * v[1] + m[1, 2] * v[2],
        m[2, 0] * v[0] + m[2, 1] * v[1] + m[2, 2] * v[2],
    ])


def get_translation(m: jax.Array) -> jax.Array:
    """Translation column of a Matrix4 (reference: commons.h:321-323)."""
    return m[:3, 3]


def inverse(m: jax.Array) -> jax.Array:
    """4x4 matrix inverse (reference: commons.h:365-371, TooN gaussian
    elimination)."""
    return jnp.linalg.inv(m)


def rigid_inverse(m: jax.Array) -> jax.Array:
    """Closed-form inverse of a rigid (SE(3)) Matrix4: [R^T, -R^T t].

    Poses in this pipeline are always rigid, so the hot-path inversions
    (``inverse(pose)``, ``inverse(raycastPose)``) use this exact form
    instead of a general LU solve.
    """
    R = m[:3, :3]
    t = m[:3, 3]
    Rt = R.T
    ti = -jnp.matmul(Rt, t, precision=jax.lax.Precision.HIGHEST)
    top = jnp.concatenate([Rt, ti[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32)
    return jnp.concatenate([top, bottom], axis=0)


def cross3(a: jax.Array, b: jax.Array) -> jax.Array:
    """Cross product for component-first [3, ...] arrays."""
    return jnp.stack([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


def dot3(a: jax.Array, b: jax.Array) -> jax.Array:
    """Component-first dot product: [3, ...] x [3, ...] -> [...]."""
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def length3(a: jax.Array) -> jax.Array:
    return jnp.sqrt(dot3(a, a))


def normalize3(a: jax.Array) -> jax.Array:
    """v / |v|; like the reference's CUDA-math ``normalize`` this produces
    non-finite values for zero-length input (callers gate on length)."""
    return a * jax.lax.rsqrt(dot3(a, a))


def _hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric cross-product matrix of a 3-vector."""
    z = jnp.zeros((), w.dtype)
    return jnp.stack([
        jnp.stack([z, -w[2], w[1]]),
        jnp.stack([w[2], z, -w[0]]),
        jnp.stack([-w[1], w[0], z]),
    ])


def se3_exp(x: jax.Array) -> jax.Array:
    """SE(3) exponential map -> Matrix4, TooN convention.

    ``x`` is a 6-vector ``[u, w]`` with translation generator ``u`` first and
    rotation generator ``w`` last, exactly as consumed by the reference's
    ``TooN::SE3<> delta(x)`` in ``updatePoseKernel``
    (reference: cpp/kernels.cpp:765-767). Reproduces TooN's closed form:

        R = I + A [w]x + B [w]x^2
        t = u + B (w x u) + C (w x (w x u))

    with A = sin(t)/t, B = (1-cos(t))/t^2, C = (1-A)/t^2 and Taylor
    fallbacks for small angles (TooN se3.h `SE3::exp` / so3.h
    `rodrigues_so3_exp`).
    """
    x = x.astype(jnp.float32)
    u = x[:3]
    w = x[3:]
    theta_sq = jnp.dot(w, w)
    theta = jnp.sqrt(theta_sq)

    # Taylor series for small theta; exact trig otherwise. Computed with a
    # clamped-safe theta to avoid NaN in the unused branch.
    safe_theta_sq = jnp.maximum(theta_sq, 1e-12)
    safe_theta = jnp.sqrt(safe_theta_sq)
    small = theta_sq < 1e-8
    mid = theta_sq < 1e-6

    a_small = 1.0 - theta_sq / 6.0
    b_small = jnp.float32(0.5)
    c_mid = (1.0 / 6.0) * (1.0 - theta_sq / 20.0)
    a_mid = 1.0 - theta_sq * c_mid
    b_mid = 0.5 - 0.25 * (1.0 / 6.0) * theta_sq

    a_big = jnp.sin(safe_theta) / safe_theta
    b_big = (1.0 - jnp.cos(safe_theta)) / safe_theta_sq
    c_big = (1.0 - a_big) / safe_theta_sq

    A = jnp.where(small, a_small, jnp.where(mid, a_mid, a_big))
    B = jnp.where(small, b_small, jnp.where(mid, b_mid, b_big))
    C = jnp.where(small, 1.0 / 6.0, jnp.where(mid, c_mid, c_big))

    wxu = jnp.cross(w, u)
    t_small = u + 0.5 * wxu
    t_full = u + B * wxu + C * jnp.cross(w, wxu)
    t = jnp.where(small, t_small, t_full)

    hw = _hat(w)
    hw2 = jnp.matmul(hw, hw, precision=jax.lax.Precision.HIGHEST)
    R = jnp.eye(3, dtype=jnp.float32) + A * hw + B * hw2

    top = jnp.concatenate([R, t[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32)
    return jnp.concatenate([top, bottom], axis=0)


def se3_log(T: jax.Array) -> jax.Array:
    """SE(3) logarithm -> 6-vector [u, w], inverse of ``se3_exp``
    (TooN convention; used by the pose-graph layer, which has no
    reference counterpart).

    Rotation log via the trace formula with small-angle Taylor fallback;
    translation via V^-1 t with V from the exp closed form.
    """
    R = T[:3, :3]
    t = T[:3, 3]
    cos_theta = jnp.clip((jnp.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    theta_sq = theta * theta

    w_skew = 0.5 * jnp.stack([R[2, 1] - R[1, 2],
                              R[0, 2] - R[2, 0],
                              R[1, 0] - R[0, 1]])
    # w = theta / (2 sin theta) * (R - R^T)^vee ; Taylor near 0.
    small = theta < 1e-5
    sin_theta = jnp.sin(theta)
    scale = jnp.where(small,
                      1.0 + theta_sq / 6.0,
                      theta / jnp.where(sin_theta == 0, 1.0, sin_theta))
    w = w_skew * scale

    hw = _hat(w)
    hw2 = jnp.matmul(hw, hw, precision=jax.lax.Precision.HIGHEST)
    # V^-1 = I - hw/2 + (1/theta^2)(1 - A/(2B)) hw^2
    safe_sq = jnp.maximum(theta_sq, 1e-12)
    A = jnp.sin(theta) / jnp.sqrt(safe_sq)
    B = (1.0 - jnp.cos(theta)) / safe_sq
    coef = jnp.where(small, 1.0 / 12.0,
                     (1.0 - A / (2.0 * jnp.where(B == 0, 1.0, B))) / safe_sq)
    Vinv = jnp.eye(3, dtype=jnp.float32) - 0.5 * hw + coef * hw2
    u = jnp.matmul(Vinv, t, precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([u, w])


def translation_pose(t: jax.Array) -> jax.Array:
    """Pure-translation Matrix4, the reference's initial pose
    ``toMatrix4(SE3(makeVector(x, y, z, 0, 0, 0)))``
    (reference: kernels.h:106-109)."""
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, 3].set(jnp.asarray(t, jnp.float32))


def make_jtj(tri: jax.Array) -> jax.Array:
    """Expand the 21 upper-triangular values into a symmetric 6x6 matrix.

    Reference: commons.h:380-395 ``makeJTJ`` — row-major upper triangle:
    row 0 gets v[0:6], row 1 cols 1.. gets v[6:11], etc.
    """
    iu = jnp.triu_indices(6)
    C = jnp.zeros((6, 6), jnp.float32).at[iu].set(tri)
    return C + jnp.triu(C, 1).T


def sym_eigh6_jacobi(C: jax.Array, sweeps: int = 6):
    """Eigendecomposition of a symmetric 6x6 by fixed-count cyclic Jacobi
    rotations — fully unrolled scalar/vector arithmetic that XLA fuses
    into the surrounding graph.

    ``jnp.linalg.eigh`` on TPU dispatches a heavyweight batched
    factorization kernel (~ms for a 6x6 — it sits inside the per-ICP-
    iteration solve, reference: cpp/kernels.cpp:759-775); six Jacobi
    sweeps reach f32 machine precision for 6x6 symmetric matrices at a
    few thousand flops. Returns (eigenvalues [6], eigenvectors [6, 6]
    column-major like eigh).
    """
    A = C.astype(jnp.float32)
    V = jnp.eye(6, dtype=jnp.float32)
    for _ in range(sweeps):
        for p in range(5):
            for q in range(p + 1, 6):
                app = A[p, p]
                aqq = A[q, q]
                apq = A[p, q]
                # Stable rotation computation; |apq| ~ 0 -> identity.
                small = jnp.abs(apq) < 1e-30
                safe_apq = jnp.where(small, 1.0, apq)
                theta = 0.5 * (aqq - app) / safe_apq
                sign_t = jnp.where(theta >= 0, 1.0, -1.0)
                t = sign_t / (jnp.abs(theta)
                              + jnp.sqrt(theta * theta + 1.0))
                t = jnp.where(small, 0.0, t)
                c = 1.0 / jnp.sqrt(t * t + 1.0)
                s = t * c

                Ap = A[p, :]
                Aq = A[q, :]
                A = A.at[p, :].set(c * Ap - s * Aq)
                A = A.at[q, :].set(s * Ap + c * Aq)
                Ap = A[:, p]
                Aq = A[:, q]
                A = A.at[:, p].set(c * Ap - s * Aq)
                A = A.at[:, q].set(s * Ap + c * Aq)
                Vp = V[:, p]
                Vq = V[:, q]
                V = V.at[:, p].set(c * Vp - s * Vq)
                V = V.at[:, q].set(s * Vp + c * Vq)
    return jnp.diagonal(A), V


def solve_normal_equations(vals: jax.Array) -> jax.Array:
    """Solve ``(J^T J) x = J^T e`` from the packed 27-vector.

    ``vals[0:6]`` is J^T e, ``vals[6:27]`` the upper triangle of J^T J
    (reference: commons.h:397-404 ``solve``). The reference SVD-solves with
    ``svd.backsub(b, 1e6)``: singular values whose ratio to the largest
    exceeds 1e6 are zeroed (TooN GR_SVD::get_inv_diag). J^T J is symmetric
    PSD, so an eigendecomposition is the same factorization; we reproduce
    the identical condition clamp. An all-zero system yields x = 0, which is
    what GR_SVD produces as well (0 * 1e6 > 0 is false).
    """
    b = vals[:6]
    C = make_jtj(vals[6:27])
    lam, V = sym_eigh6_jacobi(C)
    s = jnp.abs(lam)
    smax = jnp.max(s)
    inv = jnp.where(s * 1e6 > smax, 1.0 / jnp.where(s == 0, 1.0, s), 0.0)
    inv = jnp.where(s == 0, 0.0, inv)
    hp = jax.lax.Precision.HIGHEST
    return jnp.matmul(V, inv * jnp.matmul(V.T, b, precision=hp), precision=hp)
