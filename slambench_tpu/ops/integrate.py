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
              z_offset: int = 0,
              z_total: int = 0) -> Tuple[jax.Array, jax.Array]:
    """Fuse one depth frame into the TSDF.

    Args mirror the reference call ``integrateKernel(vol, depth, size,
    inverse(pose), getCameraMatrix(k), mu, maxweight)``
    (reference: cpp/kernels.cpp:995-996). ``z_offset``/``z_total`` support
    sharded slabs: the local ``tsdf[z]`` plane corresponds to global voxel
    index ``z + z_offset`` of a ``z_total``-deep volume (0 => unsharded).

    Update rule per voxel (reference: cpp/kernels.cpp:645-669):
      skip if camera-space z < 1e-4, projected pixel outside the image, or
      depth == 0; else diff = (depth - cam_z) * norm_correction;
      if diff > -mu: value <- clamp((w*v + min(1, diff/mu)) / (w+1), -1, 1),
      w <- min(w + 1, maxweight).
    """
    sz, sy, sx = tsdf.shape
    H, W = depth.shape
    z_total = z_total or sz

    xs = voxel_centers_axis(sx, dim[0])                     # [sx]
    ys = voxel_centers_axis(sy, dim[1])                     # [sy]
    zs_global = (jnp.arange(sz, dtype=jnp.float32) + z_offset + 0.5) * (
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
