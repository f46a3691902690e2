"""Raycast surface prediction: per-pixel ray/AABB clip + two-speed
TSDF march to the zero crossing.

TPU-native equivalent of the reference's shared ``raycast`` device
function and ``raycastKernel`` (reference: kfusion/src/cpp/kernels.cpp:
674-757). The reference's divergent per-ray while loop becomes a lockstep
masked march over the whole image inside ``lax.while_loop``: every live
ray advances with its own adaptive step (0.75*mu until the TSDF drops
below 0.8, then the fine voxel step), rays retire as they hit or leave
the far plane, and the loop exits when all rays are done. Iteration count
is additionally bounded by the worst-case fine-step traversal.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from slambench_tpu import params
from slambench_tpu.geometry import get_translation, length3, normalize3
from slambench_tpu.volume import Dim3, grad, interp


def camera_rays(view: jax.Array, image_size: Tuple[int, int]
                ) -> Tuple[jax.Array, jax.Array]:
    """(origin [3], unnormalized direction [3, H, W]) of all camera rays:
    ``direction = rotate(view, (x, y, 1))``
    (reference: cpp/kernels.cpp:678-679)."""
    H, W = image_size
    origin = get_translation(view)
    x = jnp.arange(W, dtype=jnp.float32)[None, :]
    y = jnp.arange(H, dtype=jnp.float32)[:, None]
    direction = jnp.stack([
        jnp.broadcast_to(view[0, 0] * x + view[0, 1] * y + view[0, 2], (H, W)),
        jnp.broadcast_to(view[1, 0] * x + view[1, 1] * y + view[1, 2], (H, W)),
        jnp.broadcast_to(view[2, 0] * x + view[2, 1] * y + view[2, 2], (H, W)),
    ])
    return origin, direction


def ray_box_clip(origin: jax.Array, direction: jax.Array, dim: Dim3,
                 near_plane: float, far_plane: float
                 ) -> Tuple[jax.Array, jax.Array]:
    """Per-ray (tnear, tfar) against the volume AABB [0, dim]
    (reference: cpp/kernels.cpp:684-700, incl. the reference's
    fmaxf(fmaxf(x,y), fmaxf(x,z)) reassociation)."""
    o = origin.reshape(3, 1, 1)
    dim_a = jnp.array(dim, jnp.float32).reshape(3, 1, 1)
    inv_r = 1.0 / direction
    tbot = -inv_r * o
    ttop = inv_r * (dim_a - o)
    tmin = jnp.minimum(ttop, tbot)
    tmax = jnp.maximum(ttop, tbot)
    largest_tmin = jnp.maximum(jnp.maximum(tmin[0], tmin[1]),
                               jnp.maximum(tmin[0], tmin[2]))
    smallest_tmax = jnp.minimum(jnp.minimum(tmax[0], tmax[1]),
                                jnp.minimum(tmax[0], tmax[2]))
    tnear = jnp.maximum(largest_tmin, near_plane)
    tfar = jnp.minimum(smallest_tmax, far_plane)
    return tnear, tfar


def masked_march(sample, tnear: jax.Array, tfar: jax.Array,
                 step: float, large_step: float, max_iters: int
                 ) -> jax.Array:
    """Lockstep adaptive two-speed march to the TSDF zero crossing.

    ``sample(t)`` evaluates the TSDF along each ray at parameter ``t``
    (arrays of the ray-grid shape). Implements the reference's per-ray
    loop semantics exactly (reference: cpp/kernels.cpp:702-721): start at
    ``tnear`` with ``large_step``; entering f <= 0 means "already inside,
    don't render"; on f_tt < 0 refine ``t + stepsize*f_tt/(f_t - f_tt)``
    using the pre-update stepsize and previous sample. Returns ``t_hit``
    (0 where no hit). Rays retire individually; the loop exits when all
    are done or at ``max_iters``.
    """
    active = tnear < tfar
    f_t0 = sample(tnear)
    marching = active & (f_t0 > 0)

    zero = jnp.zeros_like(tnear)
    init = dict(
        t=tnear,
        f_t=f_t0,
        stepsize=jnp.full_like(tnear, large_step),
        done=~marching,
        t_hit=zero,
        iters=jnp.int32(0),
    )

    def cond(s):
        return jnp.any(~s["done"]) & (s["iters"] < max_iters)

    def body(s):
        f_tt = sample(s["t"])
        live = ~s["done"]
        is_hit = live & (f_tt < 0.0)
        t_ref = s["t"] + s["stepsize"] * f_tt / (s["f_t"] - f_tt)
        t_hit = jnp.where(is_hit, t_ref, s["t_hit"])

        cont = live & ~is_hit
        new_step = jnp.where(f_tt < 0.8, step, s["stepsize"])
        stepsize = jnp.where(cont, new_step, s["stepsize"])
        f_t = jnp.where(cont, f_tt, s["f_t"])
        t = jnp.where(cont, s["t"] + new_step, s["t"])
        done = s["done"] | is_hit | (cont & (t >= tfar))
        return dict(t=t, f_t=f_t, stepsize=stepsize, done=done,
                    t_hit=t_hit, iters=s["iters"] + 1)

    return jax.lax.while_loop(cond, body, init)["t_hit"]


def raycast(tsdf: jax.Array,
            dim: Dim3,
            view: jax.Array,
            image_size: Tuple[int, int],
            near_plane: float,
            far_plane: float,
            step: float,
            large_step: float) -> Tuple[jax.Array, jax.Array]:
    """March all rays of a virtual camera through the TSDF.

    ``view`` maps pixel homogeneous coords to world rays
    (``raycast_pose @ K^-1``, reference: cpp/kernels.cpp:979-981). Returns
    ``(hit_pos [3, H, W], hit_t [H, W])``; ``hit_t > 0`` marks a hit
    (the reference's ``hit.w > 0``).
    """
    origin, direction = camera_rays(view, image_size)
    o = origin.reshape(3, 1, 1)
    tnear, tfar = ray_box_clip(origin, direction, dim, near_plane, far_plane)

    def sample(t):
        return interp(tsdf, dim, o + direction * t[None])

    # Upper bound: worst case a ray crosses the whole clip range at the
    # fine step (the adaptive march makes typical counts far smaller).
    max_iters = int((far_plane - near_plane) / step) + 2
    t_hit = masked_march(sample, tnear, tfar, step, large_step, max_iters)
    hit_pos = o + direction * t_hit[None]
    hit_pos = jnp.where(t_hit[None] > 0, hit_pos, 0.0)
    return hit_pos, t_hit


def raycast_maps(tsdf: jax.Array,
                 dim: Dim3,
                 view: jax.Array,
                 image_size: Tuple[int, int],
                 near_plane: float = params.NEAR_PLANE,
                 far_plane: float = params.FAR_PLANE,
                 step: float = 0.0078125,
                 large_step: float = 0.075) -> Tuple[jax.Array, jax.Array]:
    """Full ``raycastKernel``: vertex + normal reference maps.

    Reference: cpp/kernels.cpp:726-757 — on a hit the normal is the
    normalized TSDF gradient (INVALID marker if the gradient vanishes); on
    a miss vertex = 0 and normal = (INVALID, 0, 0).
    """
    H, W = image_size
    hit_pos, t_hit = raycast(tsdf, dim, view, image_size,
                             near_plane, far_plane, step, large_step)
    g = grad(tsdf, dim, hit_pos)
    glen = length3(g)
    normal = normalize3(g)

    hit = t_hit > 0
    invalid = jnp.stack([
        jnp.full((H, W), params.INVALID, jnp.float32),
        jnp.zeros((H, W), jnp.float32),
        jnp.zeros((H, W), jnp.float32),
    ])
    normal = jnp.where((hit & (glen != 0))[None], normal, invalid)
    vertex = jnp.where(hit[None], hit_pos, 0.0)
    return vertex, normal
