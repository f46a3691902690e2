"""TSDF volume integration (depth-map fusion).

TPU-native equivalent of ``integrateKernel``
(reference: kfusion/src/cpp/kernels.cpp:628-673). The reference marches
each (x, y) voxel column along z with incrementally-accumulated positions;
here every voxel's camera-space position is computed in closed form from
the affine structure ``pos(x, y, z) = M [x, y, z, 1]^T`` — numerically
tighter than the reference's running sums and fully data-parallel over the
[Z, Y, X] grid. Per-voxel depth lookups are a single gather from the
(small, VMEM-resident under Pallas) depth image.

Because voxel updates are purely local, this op needs NO communication
when the volume is sharded along z across a device mesh: each shard
integrates its slab against the (replicated) depth image.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from slambench_tpu import params
from slambench_tpu.volume import Dim3, pack_tsdf, take_flat, voxel_centers_axis


def integrate(tsdf: jax.Array,
              weight: jax.Array,
              depth: jax.Array,
              inv_track: jax.Array,
              K: jax.Array,
              mu: float,
              max_weight: float = params.MAX_WEIGHT,
              dim: Dim3 = (2.0, 2.0, 2.0),
              z_offset=0,
              z_total: int = 0,
              zs_centers: jax.Array = None,
              ys_centers: jax.Array = None,
              xs_centers: jax.Array = None) -> Tuple[jax.Array, jax.Array]:
    """Fuse one depth frame into the TSDF.

    Args mirror the reference call ``integrateKernel(vol, depth, size,
    inverse(pose), getCameraMatrix(k), mu, maxweight)``
    (reference: cpp/kernels.cpp:995-996). ``z_offset``/``z_total`` support
    sharded slabs: the local ``tsdf[z]`` plane corresponds to global voxel
    index ``z + z_offset`` of a ``z_total``-deep volume (0 => unsharded);
    ``z_offset`` may be a traced scalar. Frustum-culled blocks must pass
    the PRE-SLICED ``*s_centers`` overrides instead (see below) to keep
    bit-identity with the monolithic call.

    Update rule per voxel (reference: cpp/kernels.cpp:645-669):
      skip if camera-space z < 1e-4, projected pixel outside the image, or
      depth == 0; else diff = (depth - cam_z) * norm_correction;
      if diff > -mu: value <- clamp((w*v + min(1, diff/mu)) / (w+1), -1, 1),
      w <- min(w + 1, maxweight).
    """
    sz, sy, sx = tsdf.shape
    H, W = depth.shape
    z_total = z_total or sz

    # ``*_centers`` overrides (frustum-culled blocks) carry PRE-SLICED
    # world coordinates so the arithmetic below folds/fuses exactly as
    # in the monolithic call — keeping blocked integration bit-identical
    # (a traced ``arange + offset`` changes XLA's FMA contraction by
    # 1 ulp on knife-edge voxels; measured, tests/test_ops.py).
    xs = xs_centers if xs_centers is not None else \
        voxel_centers_axis(sx, dim[0])                      # [sx]
    ys = ys_centers if ys_centers is not None else \
        voxel_centers_axis(sy, dim[1])                      # [sy]
    zs_global = zs_centers if zs_centers is not None else (
        jnp.arange(sz, dtype=jnp.float32) + z_offset + 0.5) * (
        dim[2] / z_total)                                   # [sz]

    # World voxel centre -> camera space, broadcast [sz, sy, sx].
    X = xs[None, None, :]
    Y = ys[None, :, None]
    Z = zs_global[:, None, None]

    M = inv_track
    px = M[0, 0] * X + M[0, 1] * Y + M[0, 2] * Z + M[0, 3]
    py = M[1, 0] * X + M[1, 1] * Y + M[1, 2] * Z + M[1, 3]
    pz = M[2, 0] * X + M[2, 1] * Y + M[2, 2] * Z + M[2, 3]

    cx = K[0, 0] * px + K[0, 1] * py + K[0, 2] * pz + K[0, 3]
    cy = K[1, 0] * px + K[1, 1] * py + K[1, 2] * pz + K[1, 3]
    cz = K[2, 0] * px + K[2, 1] * py + K[2, 2] * pz + K[2, 3]

    u = cx / cz + 0.5
    v = cy / cz + 0.5

    in_front = pz >= 1e-4                                    # near plane (cpp:647)
    in_img = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)

    ui = jnp.clip(u.astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, H - 1)
    d = take_flat(depth.reshape(-1), vi * W + ui)

    # Euclidean-ray length correction (cpp:657-661).
    corr = jnp.sqrt(1.0 + (px / pz) ** 2 + (py / pz) ** 2)
    diff = (d - cz) * corr

    update = in_front & in_img & (d != 0) & (diff > -mu)

    sdf = jnp.minimum(1.0, diff / mu)
    w = weight.astype(jnp.float32)
    val = tsdf.astype(jnp.float32) * params.TSDF_INV_SCALE
    new_val = jnp.clip((w * val + sdf) / (w + 1.0), -1.0, 1.0)
    new_w = jnp.minimum(w + 1.0, max_weight)

    tsdf_out = jnp.where(update, pack_tsdf(new_val), tsdf)
    weight_out = jnp.where(update, new_w.astype(weight.dtype), weight)
    return tsdf_out, weight_out


def block_visibility(n_z: int, n_y: int,
                     dim: Dim3,
                     inv_track: jax.Array,
                     K: jax.Array,
                     depth: jax.Array,
                     mu: float,
                     z0_world: float = 0.0,
                     z1_world: float = None,
                     n_x: int = 1) -> jax.Array:
    """[n_z * n_y * n_x] bool: False only when the (z, y, x) volume block
    provably contains NO voxel the integrate update rule can touch.

    The reference integrate streams every voxel unconditionally
    (reference: cpp/kernels.cpp:628-673); on TPU the per-voxel depth
    gather dominates (PROFILE.md §2), so culling whole blocks against
    the camera frustum is the one XLA-expressible way to skip it.

    The cull is EXACT up to an explicit conservative slack (never
    skips an updatable voxel): each frustum face is a half-space linear
    in camera coordinates, so if all 8 corners of a block's AABB fall
    outside one face, every interior point does too, and for each face
    the corresponding update precondition then fails for every voxel:
      * near:  ``pz >= 1e-4``  (in_front),
      * image: ``0 <= u <= W-1``, ``0 <= v <= H-1`` (in_img; points with
        ``cz <= 0`` fail in_front instead, so the linear form
        ``cx + 0.5*cz >= 0`` etc. is sufficient either way),
      * far:   ``diff > -mu`` needs ``cz < d + mu/corr <= max(depth)+mu``
        (corr >= 1), so ``cz >= max(depth)+mu`` everywhere kills it.

    Slack: the corner evaluations here use the fused ``K @ inv_track``
    product while :func:`integrate` projects voxels two-stage, so the
    two round differently by a few f32 ulps. Each face test therefore
    carries a margin far above that ulp scale (0.5 pixel*m on the image
    forms whose magnitudes are ~1e2-1e3; 1e-5 m on near/far) — a
    knife-edge voxel within the margin keeps its block live instead of
    risking the monolithic-vs-blocked parity contract.
    """
    H, W = depth.shape
    # Block AABB corner grid in world space: [n_z, n_y, n_x, 8, 3].
    # z0_world/z1_world bound the LOCAL z extent (a sharded slab; they
    # may be traced scalars). Default: the full volume [0, dim_z].
    if z1_world is None:
        z1_world = dim[2]
    ez = z0_world + jnp.arange(n_z + 1, dtype=jnp.float32) * (
        (z1_world - z0_world) / n_z)
    ey = jnp.arange(n_y + 1, dtype=jnp.float32) * (dim[1] / n_y)
    ex = jnp.arange(n_x + 1, dtype=jnp.float32) * (dim[0] / n_x)
    zc = jnp.stack([ez[:-1], ez[1:]], -1)                  # [n_z, 2]
    yc = jnp.stack([ey[:-1], ey[1:]], -1)                  # [n_y, 2]
    xc = jnp.stack([ex[:-1], ex[1:]], -1)                  # [n_x, 2]

    M = K @ inv_track                                       # [4, 4]
    # Corner coords broadcast to [n_z, n_y, n_x, 2(z), 2(y), 2(x)].
    Z = zc[:, None, None, :, None, None]
    Y = yc[None, :, None, None, :, None]
    X = xc[None, None, :, None, None, :]
    cx = M[0, 0] * X + M[0, 1] * Y + M[0, 2] * Z + M[0, 3]
    cy = M[1, 0] * X + M[1, 1] * Y + M[1, 2] * Z + M[1, 3]
    cz = M[2, 0] * X + M[2, 1] * Y + M[2, 2] * Z + M[2, 3]

    dmax = jnp.max(depth)
    eps_z = 1e-5                # near/far slack (meters)
    eps_i = 0.5                 # image-face slack (pixel*m forms)
    corner_ok = jnp.stack([
        cz >= 1e-4 - eps_z,                                # near
        cz < dmax + mu + eps_z,                            # far
        cx + 0.5 * cz >= -eps_i,                           # u >= 0
        (W - 1.5) * cz - cx >= -eps_i,                     # u <= W-1
        cy + 0.5 * cz >= -eps_i,                           # v >= 0
        (H - 1.5) * cz - cy >= -eps_i,                     # v <= H-1
    ])                                          # [6, n_z, n_y, n_x, 2,2,2]
    # Visible unless some face has ALL corners outside it.
    any_corner = jnp.any(
        corner_ok.reshape(6, n_z, n_y, n_x, 8), axis=-1)
    return jnp.all(any_corner, axis=0).reshape(n_z * n_y * n_x)


def integrate_blocks(tsdf: jax.Array,
                     weight: jax.Array,
                     depth: jax.Array,
                     inv_track: jax.Array,
                     K: jax.Array,
                     mu: float,
                     max_weight: float = params.MAX_WEIGHT,
                     dim: Dim3 = (2.0, 2.0, 2.0),
                     n_z: int = 8,
                     n_y: int = 1,
                     n_x: int = 1,
                     z_offset=0,
                     z_total: int = 0) -> Tuple[jax.Array, jax.Array]:
    """Frustum-culled integrate: ``lax.fori_loop`` over (z, y, x) volume
    blocks, each integrated under a ``lax.cond`` visibility gate so
    off-frustum blocks skip their per-voxel depth gathers entirely.
    The x subdivision matters: a (z, y) block spans the volume's whole x
    extent, so the frustum (an x-bounded wedge at any given z, y) culls
    far more at x granularity — measured 50% -> ~35% live voxels at
    8x8x2 on the bench scene (PROFILE.md §7). A per-block projected-rect
    depth-max refinement (Hi-Z) was prototyped and measured to add <1%
    over the pure frustum cull on this scene, so it is not shipped.

    The cull itself is exact (see :func:`block_visibility`): every voxel
    an update could touch is integrated with the same update rule, so the
    result matches :func:`integrate` to the project's integrate contract
    (identical weights; tsdf within 1 int16 LSB on knife-edge voxels —
    XLA contracts the voxel->camera multiply-adds into FMAs differently
    inside the loop body, the same 1-ulp class of drift the reference's
    own C++-vs-CUDA backends exhibit). Asserted by tests/test_ops.py.
    The blocks live in a ``dynamic_update_slice`` loop so XLA updates the
    volume in place; culled blocks cost nothing (cond pass-through).
    """
    sz, sy, sx = tsdf.shape
    if sz % n_z or sy % n_y or sx % n_x:
        raise ValueError(f"volume {tsdf.shape} not divisible into "
                         f"{n_z}x{n_y}x{n_x} (z, y, x) blocks")
    bz, by, bx = sz // n_z, sy // n_y, sx // n_x
    z_total = z_total or sz
    vz = dim[2] / z_total                    # world size of one z voxel
    visible = block_visibility(n_z, n_y, dim, inv_track, K, depth, mu,
                               z0_world=z_offset * vz,
                               z1_world=(z_offset + sz) * vz, n_x=n_x)
    zs_full = (jnp.arange(sz, dtype=jnp.float32) + z_offset + 0.5) * vz \
        if z_total != sz else voxel_centers_axis(sz, dim[2])
    ys_full = voxel_centers_axis(sy, dim[1])
    xs_full = voxel_centers_axis(sx, dim[0])

    def body(b, carry):
        t, w = carry
        iz, iy, ix = b // (n_y * n_x), (b // n_x) % n_y, b % n_x
        z0, y0, x0 = iz * bz, iy * by, ix * bx

        def do(c):
            tc, wc = c
            ts = jax.lax.dynamic_slice(tc, (z0, y0, x0), (bz, by, bx))
            ws = jax.lax.dynamic_slice(wc, (z0, y0, x0), (bz, by, bx))
            ts, ws = integrate(
                ts, ws, depth, inv_track, K, mu, max_weight, dim,
                zs_centers=jax.lax.dynamic_slice(zs_full, (z0,), (bz,)),
                ys_centers=jax.lax.dynamic_slice(ys_full, (y0,), (by,)),
                xs_centers=jax.lax.dynamic_slice(xs_full, (x0,), (bx,)))
            return (jax.lax.dynamic_update_slice(tc, ts, (z0, y0, x0)),
                    jax.lax.dynamic_update_slice(wc, ws, (z0, y0, x0)))

        return jax.lax.cond(visible[b], do, lambda c: c, carry)

    return jax.lax.fori_loop(0, n_z * n_y * n_x, body, (tsdf, weight))
