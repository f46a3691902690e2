"""Back-projection of depth to a vertex map and normal estimation.

TPU-native equivalents of ``depth2vertexKernel`` and
``vertex2normalKernel`` (reference: kfusion/src/cpp/kernels.cpp:200-249).
Vertex/normal maps are component-first ``[3, H, W]`` float32 arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from slambench_tpu import params
from slambench_tpu.geometry import cross3, normalize3


def depth2vertex(depth: jax.Array, inv_k: jax.Array) -> jax.Array:
    """Back-project a depth image through K^-1 into camera-space points.

    Reference: cpp/kernels.cpp:200-218 — ``vertex = depth * rotate(invK,
    (x, y, 1))`` for positive depth, zero otherwise. The pixel centre
    convention (no +0.5) follows the reference exactly.
    """
    H, W = depth.shape
    x = jnp.arange(W, dtype=jnp.float32)[None, :]
    y = jnp.arange(H, dtype=jnp.float32)[:, None]
    # rotate(invK, (x, y, 1)) with invK rows (1/fx, 0, -cx/fx) etc.
    rx = inv_k[0, 0] * x + inv_k[0, 1] * y + inv_k[0, 2]
    ry = inv_k[1, 0] * x + inv_k[1, 1] * y + inv_k[1, 2]
    rz = jnp.broadcast_to(inv_k[2, 2], (H, W))
    ray = jnp.stack([
        jnp.broadcast_to(rx, (H, W)),
        jnp.broadcast_to(ry, (H, W)),
        rz,
    ])
    vert = depth[None] * ray
    return jnp.where(depth[None] > 0, vert, 0.0)


def vertex2normal(vertex: jax.Array) -> jax.Array:
    """Central-difference cross-product normals with hole marking.

    Reference: cpp/kernels.cpp:220-249 — neighbours are clamped at the
    image border; if any of the four neighbours has ``z == 0`` the output
    normal is marked invalid (x component = -2). The sign convention
    ``normalize(cross(dyv, dxv))`` is preserved.
    """
    _, H, W = vertex.shape

    left = jnp.concatenate([vertex[:, :, :1], vertex[:, :, :-1]], axis=2)
    right = jnp.concatenate([vertex[:, :, 1:], vertex[:, :, -1:]], axis=2)
    up = jnp.concatenate([vertex[:, :1, :], vertex[:, :-1, :]], axis=1)
    down = jnp.concatenate([vertex[:, 1:, :], vertex[:, -1:, :]], axis=1)

    invalid = ((left[2] == 0) | (right[2] == 0)
               | (up[2] == 0) | (down[2] == 0))

    dxv = right - left
    dyv = down - up
    n = normalize3(cross3(dyv, dxv))

    marker = jnp.stack([
        jnp.full((H, W), params.INVALID, jnp.float32),
        jnp.zeros((H, W), jnp.float32),
        jnp.zeros((H, W), jnp.float32),
    ])
    return jnp.where(invalid[None], marker, n)
