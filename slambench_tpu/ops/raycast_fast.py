"""Accelerated raycast: min-mip empty-space skipping + nearest-sample
marching + trilinear secant refinement.

The oracle march (ops/raycast.py) reproduces the reference's per-sample
trilinear loop exactly — 8 volume gathers per ray per step. This version
restructures the work for the TPU's memory system while keeping the hit
positions accurate to the same trilinear zero crossing:

1. A conservative **min-mip**: the volume min-pooled over overlapping
   ``(m+1)^3`` windows at stride ``m`` (the +1 overlap bounds all 8
   corners of any trilinear sample whose base voxel lies in the cell).
   ``mip >= 0`` proves a whole cell is crossing-free, so the ray jumps to
   the cell exit with a single 65 KB-table gather — no trilinear sample.
   Cells are only skipped when provably empty: no surface the reference
   march would hit can be missed.
2. In occupied cells the march samples the **nearest** voxel (1 gather
   instead of 8), stepping with the reference's two-speed schedule
   (large_step until f < 0.8, then the fine voxel step). A sign change in
   the nearest-sampled TSDF brackets the trilinear crossing to within a
   voxel.
3. The bracket is polished with 3 **false-position iterations on the
   true trilinear interpolant**, recovering the reference's sub-voxel hit
   accuracy; normals come from the same central-difference gradient.

Per 240x320 frame this replaces ~1000 volume gathers/ray with ~40-80.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from slambench_tpu import params
from slambench_tpu.geometry import length3, normalize3
from slambench_tpu.ops.raycast import camera_rays, ray_box_clip
from slambench_tpu.volume import Dim3, grad, interp, take_flat

# Mip cell edge in voxels. Env-overridable for tuning sweeps (the TPU
# analogue of the reference's OCLWrapper work-group-size overrides,
# OCLWrapper.cpp:77-132): larger cells shrink the skip table but make
# emptiness proofs coarser. Swept by slambench_tpu.tools.autotune;
# measured on the shared v5e endpoint, 8 wins end-to-end (16 wins only
# on surface-free ray distributions).
MIP_BLOCK = int(os.environ.get("SLAMBENCH_MIP_BLOCK", "8"))


def make_min_mip(tsdf: jax.Array, m: int = MIP_BLOCK) -> jax.Array:
    """Overlapped min-pool of the raw int16 TSDF: cell (i,j,k) holds the
    min over voxels [i*m, i*m+m] x ... (inclusive upper edge => +1
    overlap). Min is separable, so the (m+1)^3 window runs as three 1-D
    passes — (m+1)*3 compares per cell instead of (m+1)^3.
    """
    out = tsdf
    for axis in range(3):
        win = [1, 1, 1]
        stride = [1, 1, 1]
        pad = [(0, 0), (0, 0), (0, 0)]
        win[axis] = m + 1
        stride[axis] = m
        pad[axis] = (0, m)
        out = jax.lax.reduce_window(
            out, jnp.int16(32767), jax.lax.min,
            window_dimensions=tuple(win),
            window_strides=tuple(stride),
            padding=pad)
    return out


# Chebyshev-distance skip radius cap, in level-1 cells (so up to
# (SKIP_MAX_D-1)*MIP_BLOCK voxels are cleared per skip-table lookup).
SKIP_MAX_D = int(os.environ.get("SLAMBENCH_SKIP_MAX_D", "7"))


def make_skip_mip(mip: jax.Array, max_d: int = SKIP_MAX_D) -> jax.Array:
    """L∞ (chebyshev) distance transform of the level-1 min-mip's
    occupancy: ``skip[c] = 0`` when cell ``c`` may contain a crossing
    (``mip < 0``), else the chebyshev cell-distance to the nearest such
    cell, capped at ``max_d``.

    A ray standing in a cell with ``skip == d >= 1`` can safely jump to
    the exit of the (2(d-1)+1)^3-cell ball centred on its cell: every
    cell in that ball is provably crossing-free (the level-1 (m+1)-window
    overlap already bounds all trilinear samples). Ball exits land on
    cell boundaries, so — like the level-1/level-2 hops — skips are
    phase-free: the march enters the first occupied cell along the ray
    at the same t no matter which skip ladder got it there, keeping fast
    / sharded / dist-skip hit positions identical (the property the
    4-shard ULP-exactness test pins down).

    Cost: ``max_d - 1`` 3^3 min-pools over the (tiny) mip grid, rebuilt
    per raycast from the state's mip — no extra pipeline state. This
    replaced the round-2 two-level mip ladder (removed once measured
    slower, see PROFILE.md §6): one skip-table gather per march substep
    instead of level-1 + level-2 gathers, with jumps up to
    ``(max_d-1)*m`` voxels instead of ``m*m2``.
    """
    big = jnp.int32(max_d)
    dist = jnp.where(mip < 0, jnp.int32(0), big)
    for _ in range(max_d - 1):
        nb = -jax.lax.reduce_window(
            -dist, -big, jax.lax.max,
            window_dimensions=(3, 3, 3), window_strides=(1, 1, 1),
            padding=[(1, 1)] * 3)
        dist = jnp.minimum(dist, nb + 1)
    return dist.astype(jnp.int8)


def raycast_fast(tsdf: jax.Array,
                 mip: jax.Array,
                 dim: Dim3,
                 view: jax.Array,
                 image_size: Tuple[int, int],
                 near_plane: float,
                 far_plane: float,
                 step: float,
                 large_step: float,
                 m: int = MIP_BLOCK,
                 t_init: jax.Array | None = None,
                 nscan: int | None = None,
                 fp_iters: int | None = None
                 ) -> Tuple[jax.Array, jax.Array]:
    """Accelerated raycast; same contract as ops.raycast.raycast.

    ``t_init`` (optional, [H, W]) is a per-ray lower bound on the hit
    distance — the temporal warm start: the previous frame's hit
    distances min-pooled and shrunk by a pose-motion margin (computed by
    the caller). Marching starts at ``max(tnear, t_init)``. For a static
    scene with a correctly-margined bound this skips straight to near
    the surface.
    """
    H, W = image_size
    sz, sy, sx = tsdf.shape
    origin, direction = camera_rays(view, image_size)
    o = origin.reshape(3, 1, 1)
    tnear, tfar = ray_box_clip(origin, direction, dim, near_plane, far_plane)
    if t_init is not None:
        tnear = jnp.clip(jnp.maximum(tnear, t_init), None, tfar)

    voxel_np = np.array([dim[0] / sx, dim[1] / sy, dim[2] / sz],
                        np.float32)
    flat_vol = tsdf.reshape(-1)
    mzb, myb, mxb = mip.shape
    # Chebyshev skip table: derived from the mip on the fly (tiny — 32^3
    # int8 at 256^3/defaults), so it needs no pipeline state.
    skip = make_skip_mip(mip)
    flat_skip = skip.reshape(-1)

    # Concatenated (volume ++ skip) table so each march substep resolves
    # BOTH per-t lookups with one stacked gather (see mip_march).
    nvox = sx * sy * sz
    flat_cat = jnp.concatenate([flat_vol, flat_skip.astype(jnp.int16)])

    def make_samplers(dirs):
        """March samplers bound to a ray-direction array [3, ...] (the
        full grid, or a compacted straggler subset — the per-ray math is
        identical either way, which keeps two-phase results
        bit-identical to the single-phase march)."""
        nd = dirs.ndim - 1
        voxel = jnp.asarray(voxel_np).reshape(3, *([1] * nd))
        limit = jnp.array([sx - 1, sy - 1, sz - 1],
                          jnp.int32).reshape(3, *([1] * nd))

        def voxel_idx(pos):
            return jnp.clip((pos / voxel).astype(jnp.int32), 0, limit)

        def sample_t(t):
            idx = voxel_idx(o + dirs * t[None])
            vflat = (idx[2] * sy + idx[1]) * sx + idx[0]
            b = idx // m
            bx = jnp.clip(b[0], 0, mxb - 1)
            by = jnp.clip(b[1], 0, myb - 1)
            bz = jnp.clip(b[2], 0, mzb - 1)
            sflat = nvox + (bz * myb + by) * mxb + bx
            both = take_flat(flat_cat, jnp.stack([vflat, sflat]))
            return (both[0].astype(jnp.float32) * params.TSDF_INV_SCALE,
                    both[1].astype(jnp.int32))

        def dist_exit_t(t, d):
            pos = o + dirs * t[None]
            idx = voxel_idx(pos)
            b = (idx // m).astype(jnp.float32)
            r = (d - 1).astype(jnp.float32)
            cell_lo = (b - r) * (m * voxel)
            cell_hi = (b + r + 1.0) * (m * voxel)
            dd = jnp.where(dirs == 0, 1e-20, dirs)
            t_axis = jnp.where(dd > 0, (cell_hi - pos) / dd,
                               (cell_lo - pos) / dd)
            dt = jnp.minimum(jnp.minimum(t_axis[0], t_axis[1]), t_axis[2])
            return t + jnp.maximum(dt, 0.0) + 0.25 * step

        return sample_t, dist_exit_t

    sample_t, dist_exit_t = make_samplers(direction)

    def tri_t(t):
        return interp(tsdf, dim, o + direction * t[None])

    def tri_batch(ts):
        """Trilinear field at a [K, H, W] batch of per-ray t values —
        one interp call = one stacked gather for all K scan points."""
        pos = o.reshape(3, 1, 1, 1) + direction[:, None] * ts[None]
        return interp(tsdf, dim, pos)

    diag = (dim[0] ** 2 + dim[1] ** 2 + dim[2] ** 2) ** 0.5
    max_iters = int(diag / (m * min(dim) / max(sx, sy, sz))) \
        + int(3.0 * (0.8 / 0.75) * large_step / step) \
        + int((far_plane - near_plane) / large_step) + 16

    if MARCH_COMPACT and MARCH_PHASE1 < max_iters:
        out = march_two_phase(make_samplers, direction,
                              sample_t, dist_exit_t,
                              tnear, tfar, step, large_step, max_iters)
    else:
        out = mip_march(sample_t, dist_exit_t, tnear, tfar,
                        step, large_step, max_iters)
    t_hit = rescan_refine(tri_t, out, step,
                          nscan=RAYCAST_NSCAN if nscan is None else nscan,
                          fp_iters=(RAYCAST_REFINE_ITERS
                                    if fp_iters is None else fp_iters),
                          tri_batch=tri_batch)

    hit_pos = o + direction * t_hit[None]
    hit_pos = jnp.where(t_hit[None] > 0, hit_pos, 0.0)
    return hit_pos, t_hit


# March sub-steps unrolled per while_loop iteration. On the tunneled
# endpoint each loop iteration carries a large fixed overhead (the
# device-wide `any` sync + small-op dispatch), so amortizing K steps per
# iteration wins even though converged rays idle for up to K-1 steps.
# Env-overridable for tuning sweeps (OCLWrapper work-group analogue).
MARCH_UNROLL = max(1, int(os.environ.get("SLAMBENCH_MARCH_UNROLL", "4")))

# Two-phase straggler compaction (round 4). The march is LOCKSTEP: every
# substep gathers for ALL rays, so its cost is set by the LONGEST ray —
# measured on the bench scene the per-ray substep count is mean 11.7 /
# p99 24 / max 54 (tools/march_census.py), i.e. the last ~1% of rays
# (wall-grazing paths crawling through crossing-bearing cells at the
# reference two-speed schedule) DOUBLE the march cost. Phase 1 runs
# MARCH_PHASE1 substeps full-width; the unfinished rays are then
# compacted into a npix/MARCH_SLOT_FRAC-slot array and finish there at
# 1/SLOT_FRAC the per-substep cost. Per-ray math is identical
# (elementwise ops on gathered state), so results are bit-identical to
# the single-phase march; if stragglers overflow the slots (pathological
# scene), a full-width fallback branch preserves exactness.
MARCH_COMPACT = os.environ.get("SLAMBENCH_MARCH_COMPACT", "1") == "1"
MARCH_PHASE1 = int(os.environ.get("SLAMBENCH_MARCH_PHASE1", "24"))
MARCH_SLOT_FRAC = max(1, int(os.environ.get("SLAMBENCH_MARCH_SLOTS", "8")))


def march_two_phase(make_samplers, direction,
                    sample_t, dist_exit_t,
                    tnear, tfar, step: float, large_step: float,
                    max_iters: int) -> dict:
    """Lockstep march in two phases: full-width for MARCH_PHASE1
    substeps, then the straggler rays compacted into a small fixed-size
    set (cumsum compaction; gather state in, scatter results out).
    Returns a march-state dict with the fields rescan_refine consumes
    (t, t_prev, hit)."""
    npix = int(np.prod(tnear.shape))
    slots = max(128, -(-npix // MARCH_SLOT_FRAC) // 128 * 128)
    fields = ("t", "t_prev", "f_prev", "stepsize", "done", "hit")

    out = mip_march(sample_t, dist_exit_t, tnear, tfar,
                    step, large_step, MARCH_PHASE1)
    live = ~out["done"]
    n_live = jnp.sum(live)

    def finish_full(out):
        o2 = mip_march(sample_t, dist_exit_t, tnear, tfar,
                       step, large_step, max_iters, init=out)
        return o2["t"], o2["t_prev"], o2["hit"]

    def finish_compact(out):
        # Slot assignment by prefix sum; dead lanes land in a garbage
        # bin past the slot range.
        lv = live.reshape(-1)
        pos = jnp.cumsum(lv.astype(jnp.int32)) - 1
        P = -(-npix // 128) * 128

        def pad1(x, v):
            return x if P == npix else jnp.pad(x, (0, P - npix),
                                               constant_values=v)

        scat = pad1(jnp.where(lv, pos, slots), slots).reshape(-1, 128)
        rid = pad1(jnp.arange(npix, dtype=jnp.int32), 0).reshape(-1, 128)
        ids = jnp.full((slots + 1,), npix, jnp.int32)
        ids = ids.at[scat].set(rid, mode="drop")[:slots]
        ids2 = ids.reshape(-1, 128)          # [slots/128, 128] ray ids
        pad_mask = ids2 >= npix              # unfilled slots
        safe = jnp.minimum(ids2, npix - 1)

        sub = {k: take_flat(out[k].reshape(-1), safe) for k in fields}
        sub["done"] = sub["done"] | pad_mask
        dir_c = direction.reshape(3, -1)[:, safe]
        tfar_c = take_flat(tfar.reshape(-1), safe)
        s2, de2 = make_samplers(dir_c)
        o2 = mip_march(s2, de2, sub["t"], tfar_c, step, large_step,
                       max_iters, init=sub)

        def back(full, vals):
            return full.reshape(-1).at[ids2].set(
                vals, mode="drop").reshape(full.shape)

        return (back(out["t"], o2["t"]),
                back(out["t_prev"], o2["t_prev"]),
                back(out["hit"], o2["hit"]))

    t, t_prev, hit = jax.lax.cond(n_live <= slots,
                                  finish_compact, finish_full, out)
    return dict(t=t, t_prev=t_prev, hit=hit)


def mip_march(sample_t, dist_exit_t, tnear, tfar,
              step: float, large_step: float, max_iters: int,
              unroll: int = MARCH_UNROLL,
              init: dict | None = None) -> dict:
    """The skip-table nearest-sample march, parameterized over the
    per-t samplers so the single-volume and sharded-slab raycasts share
    one implementation. Returns the march state dict (hit, t, t_prev).

    ``sample_t(t) -> (f, d)`` fetches the nearest TSDF sample AND the
    chebyshev skip distance with ONE stacked gather against a
    concatenated (volume ++ skip) table: at ray populations a gather is
    per-OP-cost dominated on this TPU (PROFILE.md §3), so fusing the
    two per-substep lookups halves the march's gather-op count.

    ``unroll`` sub-steps run per ``while_loop`` iteration; the masked
    update rules make the unrolled body produce bit-identical results to
    the step-per-iteration loop.

    Skip structure (every march iteration gathers for ALL rays — done
    lanes included, lockstep vectors — so the longest ray sets the
    cost): ``dist_t``/``dist_exit_t`` sample a chebyshev-distance table
    (make_skip_mip) — ONE gather yields both emptiness (d >= 1) and the
    guaranteed-empty ball to jump through, with jumps growing with
    distance from the surface. (The round-2 level-1/level-2 min-mip
    ladder this replaced lived behind the same sampler interface;
    removed once measured slower, PROFILE.md §6.)

    Skips land on cell boundaries, so the t at which the march enters
    the first occupied cell along a ray — and therefore the bracket the
    refine stage polishes — is independent of the skip ladder that got
    it there (phase-free hops; pinned by the fast-vs-slab ULP-exactness
    test).

    ``init``: resume from a prior march state (the straggler-compaction
    second phase) instead of starting at ``tnear``; ``iters`` restarts
    at 0 so ``max_iters`` is the additional budget."""
    if init is None:
        f_t0, _ = sample_t(tnear)
        active = tnear < tfar
        marching = active & (f_t0 > 0)

        init = dict(
            t=tnear,
            t_prev=tnear,
            f_prev=f_t0,
            stepsize=jnp.full_like(tnear, large_step),
            done=~marching,
            hit=jnp.zeros(tnear.shape, bool),
            iters=jnp.int32(0),
        )
    else:
        init = dict(init, iters=jnp.int32(0))

    def cond(s):
        return jnp.any(~s["done"]) & (s["iters"] < max_iters)

    def substep(s):
        live = ~s["done"]
        f_tt, d_val = sample_t(s["t"])
        empty = d_val >= 1               # provably no crossing in the cell

        is_hit = live & ~empty & (f_tt < 0.0)
        hit = s["hit"] | is_hit

        # Empty cell: jump to the skip-ball exit; occupied:
        # reference stepping.
        new_step = jnp.where(f_tt < 0.8, step, s["stepsize"])
        t_step = s["t"] + new_step
        t_skip = jnp.maximum(dist_exit_t(s["t"], d_val), t_step)
        t_next = jnp.where(empty, t_skip, t_step)

        cont = live & ~is_hit
        stepsize = jnp.where(cont & ~empty, new_step, s["stepsize"])
        f_prev = jnp.where(cont & ~empty, f_tt, s["f_prev"])
        t_prev = jnp.where(cont & ~empty, s["t"], s["t_prev"])
        t = jnp.where(cont, t_next, s["t"])
        done = s["done"] | is_hit | (cont & (t >= tfar))
        return dict(t=t, t_prev=t_prev, f_prev=f_prev, stepsize=stepsize,
                    done=done, hit=hit, iters=s["iters"])

    def body(s):
        for _ in range(unroll):
            s = substep(s)
        return dict(s, iters=s["iters"] + unroll)

    return jax.lax.while_loop(cond, body, init)


# Refinement budget: the rescan subdivision count and the number of
# false-position polish iterations. Each unit is one trilinear
# evaluation = 8 volume gathers for EVERY ray — at 320x240 the refine
# stage is ~half the raycast's gather population (PROFILE.md §2), so
# these are the raycast's main cost knobs. Swept on hardware by
# tools/autotune (OCLWrapper work-group-override analogue); accuracy
# guard: the fast-vs-oracle parity tests + the bench ATE gate.
#   Sweep evidence (tools/autotune refine, undulating-wall scene):
#   (8,4) and (4,3) agree to <1e-4 voxel; (3,2) drifts 1e-4 voxel.
#   Defaults (4,2) keep a margin over the measured floor at 7 trilinear
#   evaluations instead of the round-1 11.
RAYCAST_NSCAN = int(os.environ.get("SLAMBENCH_RAYCAST_NSCAN", "4"))
RAYCAST_REFINE_ITERS = int(os.environ.get("SLAMBENCH_RAYCAST_REFINE", "2"))


def rescan_refine(tri_t, out: dict, step: float,
                  nscan: int = RAYCAST_NSCAN,
                  fp_iters: int = RAYCAST_REFINE_ITERS,
                  tri_batch=None) -> jax.Array:
    """Re-bracket the nearest-sample crossing on the true trilinear field
    with a short uniform scan over [t_prev, t + step], then polish with
    ``fp_iters`` false-position iterations. Returns t_hit (0 where no
    hit). Total trilinear evaluations: nscan + 1 + fp_iters.

    ``tri_batch`` (optional): evaluates the field at a [K, H, W] batch
    of t values in one call — the whole rescan then costs ONE stacked
    gather op instead of nscan + 1 (per-op-dominated gathers,
    PROFILE.md §3). Scan values are bit-identical either way (the batch
    is elementwise-broadcast of the same arithmetic)."""
    hit = out["hit"]
    ta = out["t_prev"]
    tb = out["t"] + step
    dtm = (tb - ta) / nscan

    if tri_batch is not None:
        fs = tri_batch(jnp.stack([ta + dtm * j if j else ta
                                  for j in range(nscan + 1)]))
        f_at = [fs[j] for j in range(nscan + 1)]
    else:
        f_at = None

    f_run = f_at[0] if f_at is not None else tri_t(ta)
    t0 = ta
    f0 = f_run
    t1 = tb
    f1 = jnp.zeros_like(f_run)
    found = jnp.zeros_like(hit)
    fj = f_run
    for j in range(1, nscan + 1):
        tj = ta + dtm * j
        fj = f_at[j] if f_at is not None else tri_t(tj)
        cross = ~found & (f_run > 0) & (fj < 0)
        t0 = jnp.where(cross, ta + dtm * (j - 1.0), t0)
        f0 = jnp.where(cross, f_run, f0)
        t1 = jnp.where(cross, tj, t1)
        f1 = jnp.where(cross, fj, f1)
        found = found | cross
        f_run = fj
    # No-crossing default bracket endpoint: the scan's final (tb)
    # evaluation — no separate tri_t(tb) dispatch needed.
    f1 = jnp.where(found, f1, fj)

    def refine(carry, _):
        t0, f0, t1, f1 = carry
        denom = f0 - f1
        tm = t1 + jnp.where(denom == 0, 0.0, (t1 - t0) * f1 / denom)
        fm = tri_t(tm)
        neg = fm < 0
        t1n = jnp.where(neg, tm, t1)
        f1n = jnp.where(neg, fm, f1)
        t0n = jnp.where(neg, t0, tm)
        f0n = jnp.where(neg, f0, fm)
        return (t0n, f0n, t1n, f1n), None

    (t0r, f0r, t1r, f1r), _ = jax.lax.scan(refine, (t0, f0, t1, f1),
                                           None, length=fp_iters)
    denom = f0r - f1r
    t_ref = t1r + jnp.where(denom == 0, 0.0, (t1r - t0r) * f1r / denom)
    # No trilinear crossing in the rescan window (rare grazing case):
    # keep the nearest-sample crossing position.
    t_hit = jnp.where(found, t_ref, out["t"])
    return jnp.where(hit, t_hit, 0.0)


def warm_start_bound(prev_t_hit: jax.Array,
                     pose_delta: jax.Array,
                     far_plane: float = params.FAR_PLANE,
                     large_step: float = 0.075,
                     pool: int = 8) -> jax.Array:
    """Per-ray hit-distance lower bound from the previous frame.

    ``prev_t_hit`` is the last raycast's t map (0 = miss); ``pose_delta``
    = ``inv(prev_pose) @ pose``. Misses and pixels near misses get no
    bound (0). The bound is the 8x8-neighbourhood min (covering pixel
    reassociation under small rotations) minus a rigid-motion margin
    ``|t| + |angle| * far + 2*large_step`` — conservative for any static
    scene."""
    trans = jnp.linalg.norm(pose_delta[:3, 3])
    # Rotation angle bound from the trace.
    cos_a = jnp.clip((jnp.trace(pose_delta[:3, :3]) - 1.0) * 0.5, -1.0, 1.0)
    angle = jnp.arccos(cos_a)
    margin = trans + angle * far_plane + 2.0 * large_step

    guarded = jnp.where(prev_t_hit > 0, prev_t_hit, 0.0)
    pooled = -jax.lax.reduce_window(
        -guarded, -jnp.inf, jax.lax.max,
        window_dimensions=(pool, pool), window_strides=(pool, pool),
        padding="VALID")
    H, W = prev_t_hit.shape
    up = jnp.repeat(jnp.repeat(pooled, pool, axis=0), pool, axis=1)
    up = up[:H, :W]
    return jnp.maximum(up - margin, 0.0)


def raycast_fast_maps(tsdf: jax.Array,
                      mip: jax.Array,
                      dim: Dim3,
                      view: jax.Array,
                      image_size: Tuple[int, int],
                      near_plane: float = params.NEAR_PLANE,
                      far_plane: float = params.FAR_PLANE,
                      step: float = 0.0078125,
                      large_step: float = 0.075,
                      t_init: jax.Array | None = None
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Vertex + normal reference maps (+ the hit-distance map for the
    next frame's warm start); contract of reference:
    cpp/kernels.cpp:726-757."""
    H, W = image_size
    hit_pos, t_hit = raycast_fast(tsdf, mip, dim, view, image_size,
                                  near_plane, far_plane, step, large_step,
                                  t_init=t_init)
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
    return vertex, normal, t_hit
