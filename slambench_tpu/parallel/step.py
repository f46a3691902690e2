"""The sharded KinectFusion step: one ``shard_map`` over a 1-D mesh.

Parallel decomposition (the TPU-native answer to BASELINE.json's
multi-host configs; nothing like this exists in the reference, which is
single-device — SURVEY.md §2.4):

* **TSDF z-slabs** — ``tsdf``/``weight`` are sharded on their leading
  (z) axis. Integration is embarrassingly parallel: each device fuses the
  replicated depth image into its own slab (no communication).
* **Slab-composite raycast with halo exchange** — every device marches
  the full ray grid, but each ray only over the t-interval in which it
  traverses that device's slab (entered one ``large_step`` early so
  boundary-spanning zero crossings are caught). Two halo bundles of
  boundary z-planes travel once per frame via ``ppermute``; per-ray hits
  combine with a ``pmin`` over the mesh and the owning slab contributes
  the surface normal via masked ``psum``. Total collective traffic per
  frame: 2 halo bundles + 2 full-image psum/pmin — all ICI.
* **ICP row-sharding + psum** — tracking pyramids are row-padded to the
  mesh size; each device associates its row block against the (psum-
  replicated) reference maps and reduces its partial normal equations;
  one 32-float ``psum`` per ICP iteration completes the Gram matrix and
  every device solves the 6x6 system identically (replicated pose, no
  host round-trip).

* **Row-sharded preprocessing** — the bilateral filter (the expensive
  preprocess op) runs on each device's row band of the output, cut from
  the replicated mm2meters result with a wrapped 2-row apron (the
  reference's uint-wraparound border bug reproduced across band seams),
  then one ~300 KB ``all_gather`` re-replicates the filtered depth for
  integration and the pyramids. This removes the replicated-preprocess
  Amdahl term that capped projected 8-chip efficiency (SCALING.md).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slambench_tpu import params
from slambench_tpu.geometry import (
    get_camera_matrix, get_inverse_camera_matrix, mat4mul, rigid_inverse,
)
from slambench_tpu.ops.integrate import integrate, integrate_blocks
from slambench_tpu.ops.preprocess import bilateral_filter, mm2meters
from slambench_tpu.ops.raycast import camera_rays, ray_box_clip
from slambench_tpu.ops.solve import check_pose, update_pose
from slambench_tpu.ops.track import reduce_track, track
from slambench_tpu.ops.vertex import depth2vertex, vertex2normal
from slambench_tpu.pipeline import KFusion, KFusionState
from slambench_tpu.volume import take_flat
from slambench_tpu.geometry import length3, normalize3


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class ShardedKFusion(KFusion):
    """KFusion over a device mesh. Drop-in replacement: same state pytree
    (tsdf/weight device-sharded), same phase semantics."""

    def __init__(self, *args, mesh: Mesh, **kwargs):
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.n_shards = mesh.devices.size
        super().__init__(*args, **kwargs)

        sx, sy, sz = self.volume_resolution
        if sz % self.n_shards != 0:
            raise ValueError(
                f"volume z ({sz}) must divide by mesh size ({self.n_shards})")
        self.slab_z = sz // self.n_shards
        # Halo: the back-extended march (one large_step) plus the
        # interp/grad support (2 voxels).
        vz = self.volume_dimensions[2] / sz
        self.halo = min(int(math.ceil(0.75 * self.mu / vz)) + 2, self.slab_z)

        self._state_spec = KFusionState(
            tsdf=P(self.axis), weight=P(self.axis), mip=P(),
            prev_t_hit=P(),
            pose=P(), old_pose=P(), raycast_pose=P(),
            ref_vertex=P(), ref_normal=P(),
            float_depth=P(), scaled_depth0=P(),
            track_result=P(), reduction=P(),
            tracked=P(), integrated=P(),
        )
        self._stepper = self._make_sharded_step()
        self._sharded_step = jax.jit(
            self._stepper, donate_argnums=0,
            static_argnames=("tracking_on", "integrate_frame",
                             "force_integrate", "raycast_on"))

    # ------------------------------------------------------------------ #

    def init_state(self) -> KFusionState:
        state = super().init_state()
        specs = dataclasses.asdict(self._state_spec)
        shardings = {
            k: NamedSharding(self.mesh, spec) for k, spec in specs.items()
        }
        return KFusionState(**{
            f.name: jax.device_put(getattr(state, f.name),
                                   shardings[f.name])
            for f in dataclasses.fields(state)
        })

    # ----------------------- per-device building blocks ---------------- #

    def _halo_exchange(self, slab: jax.Array) -> jax.Array:
        """Extend a [slab_z, Y, X] slab with ``halo`` planes from each
        neighbour (circular ppermute; edge slabs never index into the
        wrapped planes because global z is clamped first)."""
        h = self.halo
        n = self.n_shards
        if n == 1:
            return jnp.concatenate([slab[:h], slab, slab[-h:]], axis=0)
        up = [(i, (i - 1) % n) for i in range(n)]    # send to smaller index
        down = [(i, (i + 1) % n) for i in range(n)]
        top = jax.lax.ppermute(slab[:h], self.axis, down)     # from z-1 side
        bottom = jax.lax.ppermute(slab[-h:], self.axis, up)   # from z+1 side
        return jnp.concatenate([top, slab, bottom], axis=0)

    def _slab_interp(self, ext: jax.Array, z0_ext, pos: jax.Array
                     ) -> jax.Array:
        """Trilinear interp against an extended slab: global voxel coords
        (full-volume size), z localized by ``z0_ext``."""
        sx, sy, sz = self.volume_resolution
        dim = self.volume_dimensions
        nd = pos.ndim - 1
        size = jnp.array([sx, sy, sz], jnp.float32).reshape(3, *([1] * nd))
        dim_a = jnp.array(dim, jnp.float32).reshape(3, *([1] * nd))
        scaled = pos * size / dim_a - 0.5
        base = jnp.floor(scaled)
        factor = scaled - base
        base = base.astype(jnp.int32)
        limit = jnp.array([sx - 1, sy - 1, sz - 1], jnp.int32).reshape(
            3, *([1] * nd))
        lower = jnp.clip(base, 0, limit)
        upper = jnp.clip(base + 1, 0, limit)
        ext_z = ext.shape[0]

        def local_z(zg):
            return jnp.clip(zg - z0_ext, 0, ext_z - 1)

        flatW = ext.reshape(-1)
        sy_, sx_ = ext.shape[1], ext.shape[2]

        lx, ly, lz = lower[0], lower[1], lower[2]
        ux, uy, uz = upper[0], upper[1], upper[2]
        fx, fy, fz = factor[0], factor[1], factor[2]
        # All 8 corners in one stacked gather (gathers are per-op-cost
        # dominated at ray populations, PROFILE.md §3/§9); values and
        # blend order identical to 8 separate fetches.
        corners = [(lx, ly, lz), (ux, ly, lz), (lx, uy, lz), (ux, uy, lz),
                   (lx, ly, uz), (ux, ly, uz), (lx, uy, uz), (ux, uy, uz)]
        idx8 = jnp.stack([(local_z(zg) * sy_ + y) * sx_ + x
                          for x, y, zg in corners])
        c = take_flat(flatW, idx8).astype(jnp.float32)
        (c000, c100, c010, c110, c001, c101, c011, c111) = [
            c[i] for i in range(8)]
        v = (((c000 * (1 - fx) + c100 * fx) * (1 - fy)
              + (c010 * (1 - fx) + c110 * fx) * fy)
             * (1 - fz)
             + ((c001 * (1 - fx) + c101 * fx) * (1 - fy)
                + (c011 * (1 - fx) + c111 * fx) * fy)
             * fz)
        return v * params.TSDF_INV_SCALE

    def _slab_raycast(self, tsdf_slab: jax.Array, view: jax.Array
                      ) -> Tuple[jax.Array, jax.Array]:
        """Slab-composited raycast; returns replicated (vertex, normal)
        full-image maps. Uses the same chebyshev-skip nearest-sample
        march as the single-device fast backend
        (ops/raycast_fast.mip_march + make_skip_mip), with the skip
        table built from a slab-local min-mip of the halo-extended slab.

        Slab-boundary soundness of the distance transform: the
        transform treats cells beyond the extended slab as empty, which
        is only unsound for volume that is OUTSIDE this shard's march
        interval — every t in [my_tnear, my_tfar] has its z inside the
        halo-extended slab (the halo covers the large_step entry
        margin), and cells of a skip ball inside the extended slab are
        provably crossing-free from local data. Crossings beyond the
        slab belong to (and are found by) the neighbouring shard; the
        pmin composition keeps the first hit."""
        from slambench_tpu.ops.raycast_fast import (
            MIP_BLOCK, make_skip_mip, mip_march, rescan_refine,
        )

        H, W = self.H, self.W
        sx, sy, sz = self.volume_resolution
        dim = self.volume_dimensions
        vz = dim[2] / sz
        idx = jax.lax.axis_index(self.axis)
        z0 = idx * self.slab_z                       # first global plane
        z0_ext = z0 - self.halo
        large_step = 0.75 * self.mu

        ext = self._halo_exchange(tsdf_slab)
        m = MIP_BLOCK

        # Slab-local overlapped min-mip of the extended slab (separable).
        mip_local = ext
        for axis in range(3):
            win = [1, 1, 1]
            stride = [1, 1, 1]
            pad = [(0, 0)] * 3
            win[axis] = m + 1
            stride[axis] = m
            pad[axis] = (0, m)
            mip_local = jax.lax.reduce_window(
                mip_local, jnp.int16(32767), jax.lax.min,
                window_dimensions=tuple(win), window_strides=tuple(stride),
                padding=pad)
        mzb, myb, mxb = mip_local.shape
        flat_skip = make_skip_mip(mip_local).reshape(-1)
        flat_ext = ext.reshape(-1)
        ext_z = ext.shape[0]
        # Concatenated (slab ++ skip) table: one stacked gather per
        # march substep (same fusion as the single-chip sampler).
        n_ext = flat_ext.shape[0]
        flat_cat = jnp.concatenate([flat_ext,
                                    flat_skip.astype(jnp.int16)])

        origin, direction = camera_rays(view, (H, W))
        o = origin.reshape(3, 1, 1)
        tnear, tfar = ray_box_clip(origin, direction, dim,
                                   params.NEAR_PLANE, params.FAR_PLANE)

        # Ray ∩ slab z-interval [z0*vz, (z0+slab_z)*vz), entered one
        # large_step early to catch boundary-spanning crossings.
        zlo = z0.astype(jnp.float32) * vz
        zhi = (z0 + self.slab_z).astype(jnp.float32) * vz
        dz = jnp.where(direction[2] == 0, 1e-20, direction[2])
        t1 = (zlo - origin[2]) / dz
        t2 = (zhi - origin[2]) / dz
        t_enter = jnp.minimum(t1, t2)
        t_exit = jnp.maximum(t1, t2)
        my_tnear = jnp.maximum(tnear, t_enter - large_step)
        my_tfar = jnp.minimum(tfar, t_exit)

        voxel = jnp.array([dim[0] / sx, dim[1] / sy, vz],
                          jnp.float32).reshape(3, 1, 1)
        limit = jnp.array([sx - 1, sy - 1, sz - 1],
                          jnp.int32).reshape(3, 1, 1)

        def local_idx(t):
            """Global-clamped voxel index, z localized to the ext slab."""
            pos = o + direction * t[None]
            gi = jnp.clip((pos / voxel).astype(jnp.int32), 0, limit)
            lz = jnp.clip(gi[2] - z0_ext, 0, ext_z - 1)
            return gi[0], gi[1], lz

        def sample_t(t):
            x, y, lz = local_idx(t)
            vflat = (lz * sy + y) * sx + x
            bx = jnp.clip(x // m, 0, mxb - 1)
            by = jnp.clip(y // m, 0, myb - 1)
            bz = jnp.clip(lz // m, 0, mzb - 1)
            sflat = n_ext + (bz * myb + by) * mxb + bx
            both = take_flat(flat_cat, jnp.stack([vflat, sflat]))
            return (both[0].astype(jnp.float32) * params.TSDF_INV_SCALE,
                    both[1].astype(jnp.int32))

        def dist_exit_t(t, d_val):
            """Exit of the (2(d-1)+1)^3-cell guaranteed-empty ball; cell
            bounds in world space — z cells live on the ext-local grid
            (offset z0_ext planes from the global origin)."""
            pos = o + direction * t[None]
            x, y, lz = local_idx(t)
            bx = (x // m).astype(jnp.float32)
            by = (y // m).astype(jnp.float32)
            bz = (lz // m).astype(jnp.float32)
            r = (d_val - 1).astype(jnp.float32)
            vx_, vy_ = dim[0] / sx, dim[1] / sy
            cell = jnp.array([m * vx_, m * vy_, m * vz],
                             jnp.float32).reshape(3, 1, 1)
            base = jnp.stack([bx * (m * vx_),
                              by * (m * vy_),
                              (bz * m + z0_ext) * vz])
            lo = base - r * cell
            hi = base + (r + 1.0) * cell
            d = jnp.where(direction == 0, 1e-20, direction)
            t_axis = jnp.where(d > 0, (hi - pos) / d, (lo - pos) / d)
            dt = jnp.minimum(jnp.minimum(t_axis[0], t_axis[1]), t_axis[2])
            return t + jnp.maximum(dt, 0.0) + 0.25 * self.step

        def tri_t(t):
            return self._slab_interp(ext, z0_ext,
                                     o + direction * t[None])

        max_iters = int((params.FAR_PLANE - params.NEAR_PLANE)
                        / self.step) + 2
        out = mip_march(sample_t, dist_exit_t, my_tnear, my_tfar,
                        self.step, large_step, max_iters)
        t_hit_local = rescan_refine(tri_t, out, self.step)

        # First hit across slabs.
        t_inf = jnp.where(t_hit_local > 0, t_hit_local, jnp.inf)
        t_min = jax.lax.pmin(t_inf, self.axis)
        t_hit = jnp.where(jnp.isfinite(t_min), t_min, 0.0)

        hit_pos = o + direction * t_hit[None]
        hit = t_hit > 0

        # Owning slab (by hit z) contributes the gradient normal.
        hz = hit_pos[2]
        own = hit & (hz >= zlo) & (hz < zhi)
        # Top slab owns hits at/above its upper edge; bottom below.
        own = own | (hit & (idx == self.n_shards - 1) & (hz >= zhi))
        own = own | (hit & (idx == 0) & (hz < zlo))
        g = self._slab_grad(ext, z0_ext, hit_pos)
        g = jnp.where(own[None], g, 0.0)
        g = jax.lax.psum(g, self.axis)

        glen = length3(g)
        normal = normalize3(g)
        invalid = jnp.stack([
            jnp.full((H, W), params.INVALID, jnp.float32),
            jnp.zeros((H, W), jnp.float32),
            jnp.zeros((H, W), jnp.float32),
        ])
        normal = jnp.where((hit & (glen != 0))[None], normal, invalid)
        vertex = jnp.where(hit[None], hit_pos, 0.0)
        return vertex, normal

    def _slab_grad(self, ext: jax.Array, z0_ext, pos: jax.Array
                   ) -> jax.Array:
        """Central-difference gradient against an extended slab (same
        scheme as volume.grad, reference: commons.h:215-301)."""
        sx, sy, sz = self.volume_resolution
        dim = self.volume_dimensions
        nd = pos.ndim - 1
        size = jnp.array([sx, sy, sz], jnp.float32).reshape(3, *([1] * nd))
        dim_a = jnp.array(dim, jnp.float32).reshape(3, *([1] * nd))
        limit = jnp.array([sx - 1, sy - 1, sz - 1], jnp.int32).reshape(
            3, *([1] * nd))
        scaled = pos * size / dim_a - 0.5
        base = jnp.floor(scaled)
        factor = scaled - base
        base = base.astype(jnp.int32)
        ll = jnp.clip(base - 1, 0, limit)
        lo = jnp.clip(base, 0, limit)
        up = jnp.clip(base + 1, 0, limit)
        uu = jnp.clip(base + 2, 0, limit)
        fx, fy, fz = factor[0], factor[1], factor[2]

        ext_z = ext.shape[0]
        sy_, sx_ = ext.shape[1], ext.shape[2]
        flatW = ext.reshape(-1)

        def _flat(x, y, zg):
            zl = jnp.clip(zg - z0_ext, 0, ext_z - 1)
            return (zl * sy_ + y) * sx_ + x

        def trilerp(sample):
            c000 = sample(0, 0, 0); c100 = sample(1, 0, 0)
            c010 = sample(0, 1, 0); c110 = sample(1, 1, 0)
            c001 = sample(0, 0, 1); c101 = sample(1, 0, 1)
            c011 = sample(0, 1, 1); c111 = sample(1, 1, 1)
            return (((c000 * (1 - fx) + c100 * fx) * (1 - fy)
                     + (c010 * (1 - fx) + c110 * fx) * fy) * (1 - fz)
                    + ((c001 * (1 - fx) + c101 * fx) * (1 - fy)
                       + (c011 * (1 - fx) + c111 * fx) * fy) * fz)

        xs = (lo[0], up[0]); ys = (lo[1], up[1]); zs = (lo[2], up[2])
        # 32-distinct-point dedup of the 48 stencil endpoints — see
        # volume.grad for the derivation (bit-identical results) — all
        # fetched with ONE stacked gather (PROFILE.md §9).
        sel3 = [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]
        flats = (
            [_flat(xs[i], ys[j], zs[k]) for i, j, k in sel3]
            + [_flat((ll[0], uu[0])[a], ys[j], zs[k]) for a, j, k in sel3]
            + [_flat(xs[i], (ll[1], uu[1])[b], zs[k]) for i, b, k in sel3]
            + [_flat(xs[i], ys[j], (ll[2], uu[2])[c]) for i, j, c in sel3])
        vals = take_flat(flatW, jnp.stack(flats)).astype(jnp.float32)
        C = {k: vals[n] for n, k in enumerate(sel3)}
        XW = {k: vals[8 + n] for n, k in enumerate(sel3)}
        YW = {k: vals[16 + n] for n, k in enumerate(sel3)}
        ZW = {k: vals[24 + n] for n, k in enumerate(sel3)}
        gx = trilerp(lambda i, j, k: (C[1, j, k] - XW[0, j, k]) if i == 0
                     else (XW[1, j, k] - C[0, j, k]))
        gy = trilerp(lambda i, j, k: (C[i, 1, k] - YW[i, 0, k]) if j == 0
                     else (YW[i, 1, k] - C[i, 0, k]))
        gz = trilerp(lambda i, j, k: (C[i, j, 1] - ZW[i, j, 0]) if k == 0
                     else (ZW[i, j, 1] - C[i, j, 0]))
        g = jnp.stack([gx, gy, gz])
        return g * (dim_a / size) * (0.5 * params.TSDF_INV_SCALE)

    # --------------------------- sharded step -------------------------- #

    def _sharded_preprocessing(self, state: KFusionState,
                               input_depth: jax.Array) -> KFusionState:
        """mm->m conversion (replicated — a strided cast, ~1 MB) +
        row-sharded bilateral filter.

        Each device filters its ``H/n`` output-row band, cut from the
        replicated mm2meters result with a ``RADIUS``-row apron whose
        out-of-image rows reproduce the reference's uint-wraparound
        CLAMP border bug exactly: a negative row offset wraps to a huge
        uint and clamps to H-1, so EVERY above-image neighbour reads the
        bottom row (cpp/kernels.cpp:173-180 via
        ops/preprocess.bilateral_filter; the crop discards the band-edge
        handling the filter itself applies, so only these apron rows
        feed border pixels). One image-sized ``all_gather`` then
        re-replicates the filtered depth for the pyramid build and the
        slab-local integrate. Falls back to the replicated path when the
        rows don't divide or under the Pallas tier."""
        n, axis = self.n_shards, self.axis
        H = self.H
        if n == 1 or H % n or self.backend == "pallas":
            return self._preprocessing(state, input_depth)
        in_h, in_w = input_depth.shape
        ratio = in_w // self.W
        fd = mm2meters(input_depth, ratio)
        hb = H // n
        r = params.RADIUS
        idx = jax.lax.axis_index(axis)
        rows = idx * hb + jnp.arange(-r, hb + r)
        # uint-wraparound clamp: negative -> H-1 (not a modular wrap).
        rows = jnp.where(rows < 0, H - 1, jnp.minimum(rows, H - 1))
        band_ext = jnp.take(fd, rows, axis=0)
        band = bilateral_filter(band_ext, self.gaussian, params.E_DELTA,
                                r)[r:-r]
        sd0 = jax.lax.all_gather(band, axis, axis=0, tiled=True)
        return dataclasses.replace(state, float_depth=fd,
                                   scaled_depth0=sd0)

    def _make_sharded_step(self):
        axis = self.axis
        n = self.n_shards

        def device_step(state: KFusionState, input_depth: jax.Array, *,
                        tracking_on: bool, integrate_frame: bool,
                        force_integrate: bool, raycast_on: bool
                        ) -> KFusionState:
            # ---- preprocessing (row-sharded bilateral) ---------------- #
            state = self._sharded_preprocessing(state, input_depth)

            # ---- tracking: row-sharded ICP with psum ------------------ #
            if tracking_on:
                state = self._sharded_tracking(state)
            else:
                state = dataclasses.replace(state,
                                            tracked=jnp.asarray(False))

            # ---- integration: slab-local ------------------------------ #
            pose, ok = check_pose(state.pose, state.old_pose,
                                  state.reduction, (self.H, self.W))
            should = (ok & integrate_frame) | force_integrate
            idx = jax.lax.axis_index(axis)

            def do(args):
                tsdf, weight = args
                bz, by, bx = self.integrate_block_grid
                bz = max(1, bz // n)       # z-blocks per slab
                if (bz, by, bx) == (1, 1, 1) or self.slab_z % bz:
                    return integrate(
                        tsdf, weight, state.float_depth,
                        rigid_inverse(pose), get_camera_matrix(self._k),
                        self.mu, params.MAX_WEIGHT, self.volume_dimensions,
                        z_offset=idx * self.slab_z,
                        z_total=self.volume_resolution[2])
                # Frustum-culled blocks WITHIN the shard's slab: the
                # z-shard is the outer partition, the cull skips the
                # slab's off-frustum (z, y, x) blocks (ops/integrate.py).
                return integrate_blocks(
                    tsdf, weight, state.float_depth, rigid_inverse(pose),
                    get_camera_matrix(self._k), self.mu, params.MAX_WEIGHT,
                    self.volume_dimensions, n_z=bz, n_y=by, n_x=bx,
                    z_offset=idx * self.slab_z,
                    z_total=self.volume_resolution[2])

            tsdf, weight = jax.lax.cond(
                should, do, lambda a: a, (state.tsdf, state.weight))
            state = dataclasses.replace(state, pose=pose, tsdf=tsdf,
                                        weight=weight, integrated=should)

            # ---- raycasting: slab composite --------------------------- #
            if raycast_on:
                view = mat4mul(state.pose,
                               get_inverse_camera_matrix(self._k))
                vertex, normal = self._slab_raycast(state.tsdf, view)
                state = dataclasses.replace(
                    state, raycast_pose=state.pose,
                    ref_vertex=vertex, ref_normal=normal)
            return state

        spec = self._state_spec
        specs_dict = dataclasses.asdict(spec)
        in_specs = (spec, P())
        out_specs = spec

        def stepper(state, depth, *, tracking_on, integrate_frame,
                    force_integrate, raycast_on):
            fn = functools.partial(
                device_step, tracking_on=tracking_on,
                integrate_frame=integrate_frame,
                force_integrate=force_integrate, raycast_on=raycast_on)
            return jax.shard_map(
                fn, mesh=self.mesh, in_specs=in_specs,
                out_specs=out_specs, check_vma=False)(state, depth)

        return stepper

    def _sharded_tracking(self, state: KFusionState) -> KFusionState:
        """Coarse-to-fine ICP with the pixel rows of every pyramid level
        partitioned over the mesh and the normal equations completed by a
        single [32]-float psum per iteration."""
        axis = self.axis
        n = self.n_shards
        pyr = self._build_pyramid(state.scaled_depth0)
        verts, norms = [], []
        for i in range(self._levels):
            inv_k = get_inverse_camera_matrix(self._k / float(1 << i))
            v = depth2vertex(pyr[i], inv_k)
            nm = vertex2normal(v)
            # Row-pad to the mesh size; padded rows carry INVALID normals
            # so they reduce to nothing (result -1).
            h = v.shape[1]
            hp = _round_up(h, n)
            if hp != h:
                v = jnp.pad(v, ((0, 0), (0, hp - h), (0, 0)))
                nm = jnp.pad(nm, ((0, 0), (0, hp - h), (0, 0)),
                             constant_values=0.0)
                marker = jnp.zeros((3, hp - h, nm.shape[2]), nm.dtype
                                   ).at[0].set(params.INVALID)
                nm = nm.at[:, h:, :].set(marker)
            idx = jax.lax.axis_index(axis)
            blk = hp // n
            v = jax.lax.dynamic_slice_in_dim(v, idx * blk, blk, axis=1)
            nm = jax.lax.dynamic_slice_in_dim(nm, idx * blk, blk, axis=1)
            verts.append(v)
            norms.append(nm)

        old_pose = state.pose
        view = mat4mul(get_camera_matrix(self._k),
                       rigid_inverse(state.raycast_pose))
        if self.motion_model == "cv":
            from slambench_tpu.pipeline import cv_predict
            pose = cv_predict(state.pose, state.old_pose)
        else:
            pose = state.pose
        reduction = state.reduction
        track_result = state.track_result

        for level in reversed(range(self._levels)):
            blk_shape = verts[level].shape[1:]
            max_iters = self.iterations[level]

            def body(carry, _level=level):
                i, pose_c, _red, _res, _conv = carry
                data = track(verts[_level], norms[_level],
                             state.ref_vertex, state.ref_normal,
                             pose_c, view)
                red = reduce_track(data)
                red = jax.lax.psum(red, axis)
                new_pose, conv = update_pose(pose_c, red,
                                             self.icp_threshold)
                return (i + 1, new_pose, red, data["result"], conv)

            def cond(carry, _max=max_iters):
                i, _p, _r, _res, conv = carry
                return (i < _max) & ~conv

            init = (jnp.int32(0), pose, reduction,
                    jnp.zeros(blk_shape, jnp.int32), jnp.asarray(False))
            _, pose, reduction, level_result, _ = jax.lax.while_loop(
                cond, body, init)
            if level == 0:
                # Reassemble the full-size diagnostic map.
                full = jax.lax.all_gather(level_result, axis, axis=0,
                                          tiled=True)
                track_result = full[: self.H, : self.W]

        pose, tracked = check_pose(pose, old_pose, reduction,
                                   (self.H, self.W))
        return dataclasses.replace(
            state, pose=pose, old_pose=old_pose, reduction=reduction,
            track_result=track_result, tracked=tracked)

    # --------------------------- frontend ------------------------------ #

    def _scan_step(self, state: KFusionState, depth: jax.Array,
                   **gates) -> KFusionState:
        """Sharded dispatch batching: the parent's scan variants
        (steady-state and rate-gated, pipeline.py) run with the
        shard_map'd step as their body. Removes the per-frame host
        dispatch round-trip from the sharded tier — the overhead class
        measured at ~40% of frame time on the tunneled endpoint
        (BENCHMARKS.md) — while every per-frame collective (halo
        ppermute, ICP psum, raycast pmin/psum) stays inside the one
        compiled program; the donated state keeps the sharded volume
        updating in place across the whole chunk."""
        return self._stepper(state, depth, **gates)

    def process_frame(self, state: KFusionState, input_depth, frame: int,
                      tracking_rate: int = 1, integration_rate: int = 2
                      ) -> KFusionState:
        return self._sharded_step(
            state, jnp.asarray(input_depth),
            tracking_on=(frame % tracking_rate == 0),
            integrate_frame=(frame % integration_rate == 0),
            force_integrate=(frame <= 3),
            raycast_on=(frame > 2))
