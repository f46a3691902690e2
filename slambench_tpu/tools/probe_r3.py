"""Round-3 optimization probes, measured on the real chip.

PROFILE.md §1-§3 establish that the pipeline is gather-bound and that
small-population gathers are per-op-cost dominated. This probe measures
the three candidate structural levers before they are adopted:

1. ``slab_cond``: integrate as a ``lax.scan`` over z-slabs with a
   ``lax.cond`` visibility gate per slab — the only XLA-expressible way
   to actually SKIP the per-voxel depth gather for voxels outside the
   camera frustum (a static-shape frustum cull; the reference's
   integrate streams every voxel unconditionally,
   reference: kfusion/src/cpp/kernels.cpp:628-673).
   Measured with 8/8, 4/8 and 1/8 slabs visible to verify the cond
   branch is honoured at runtime and to price the scan overhead.

2. ``rowgather``: the ICP ref-map fetch (ops/track.py) gathers 6
   channels x 77k pixels from a [6, HW] table. The alternative packs
   the table as [HW, 8] (6 channels padded to a lane-friendly 8) and
   issues ONE row gather with an 8-element slice per index — 77k index
   rows instead of 460k scalar lookups.

3. ``taa``: ``take_along_axis(axis=-1)`` (structured lane gather) vs
   the general flat gather at the integrate population, to bound
   whether a two-pass separable projective warp of the depth image
   could ever beat the direct per-voxel gather.

Usage: python -m slambench_tpu.tools.probe_r3 [--json out.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np


def _timeit(fn, *args):
    import jax
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.monotonic()
    r = fn(*args)
    jax.block_until_ready(r)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).reshape(-1)[:1]
    return time.monotonic() - t0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    ap.add_argument("--volume", type=int, default=256)
    ap.add_argument("--slabs", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    from slambench_tpu.utils import backend as backend_select
    backend_select.select_backend()
    backend_select.enable_jit_cache()
    import jax
    import jax.numpy as jnp

    from slambench_tpu import params
    from slambench_tpu.ops.integrate import integrate

    V, S, REPS = args.volume, args.slabs, args.reps
    H, W = 240, 320
    out = {"backend": jax.default_backend(), "volume": V, "slabs": S}
    rng = np.random.default_rng(0)

    def report(name, dt, extra=""):
        out[name] = round(dt * 1e3, 2)
        print(f"{name:28s} {dt*1e3:9.2f} ms {extra}",
              file=sys.stderr, flush=True)

    # ---------------- 1. scan-over-slabs integrate --------------------- #
    tsdf0 = jnp.asarray(np.full((V, V, V), 32766, np.int16))
    w0 = jnp.asarray(np.zeros((V, V, V), np.int8))
    depth = jnp.asarray((rng.random((H, W)) * 3 + 0.5).astype(np.float32))
    inv_track = jnp.eye(4)
    K = jnp.asarray(np.array(
        [[240.6, 0, 160, 0], [0, 240.0, 120, 0],
         [0, 0, 1, 0], [0, 0, 0, 1]], np.float32))
    dim = (4.8, 4.8, 4.8)

    @jax.jit
    def integ_monolithic(t, w, d):
        def body(i, c):
            return integrate(c[0], c[1], d, inv_track, K, 0.1,
                             params.MAX_WEIGHT, dim)
        return jax.lax.fori_loop(0, REPS, body, (t, w))

    report("integrate_monolithic",
           _timeit(integ_monolithic, tsdf0, w0, depth) / REPS)

    zslab = V // S

    @jax.jit
    def integ_slabs(t, w, d, visible):
        t = t.reshape(S, zslab, V, V)
        w = w.reshape(S, zslab, V, V)

        def body(i, c):
            tc, wc = c

            def scan_body(carry, xs):
                ts, ws, vis, idx = xs

                def do(a):
                    return integrate(a[0], a[1], d, inv_track, K, 0.1,
                                     params.MAX_WEIGHT, dim,
                                     z_offset=idx * zslab, z_total=V)

                ts, ws = jax.lax.cond(vis, do, lambda a: a, (ts, ws))
                return carry, (ts, ws)

            _, (tc, wc) = jax.lax.scan(
                scan_body, 0,
                (tc, wc, visible, jnp.arange(S, dtype=jnp.int32)))
            return tc, wc

        t, w = jax.lax.fori_loop(0, REPS, body, (t, w))
        return t.reshape(V, V, V), w.reshape(V, V, V)

    for nvis in (S, S // 2, 1):
        vis = jnp.asarray(np.arange(S) < nvis)
        dt = _timeit(integ_slabs, tsdf0.copy(), w0.copy(), depth, vis)
        report(f"integrate_slabs_{nvis}of{S}", dt / REPS)

    # ------------- 1b. frustum-culled block integrate ------------------ #
    # Bench-like pose: camera at (0.34, 0.5, 0.24)*dim looking along +z
    # (the canonical traj2-like start). Depth: the real synthetic-room
    # bench frame when the bench dataset exists (the cull's live
    # fraction is scene-dependent), else the random image above.
    from slambench_tpu import geometry as G
    from slambench_tpu.ops.integrate import block_visibility, integrate_blocks

    pose = G.translation_pose([0.34 * dim[0], 0.5 * dim[1], 0.24 * dim[2]])
    inv_bench = G.rigid_inverse(pose)
    try:
        from slambench_tpu.io.readers import RawDepthReader
        from slambench_tpu.ops.preprocess import mm2meters
        rd = RawDepthReader("/tmp/slambench_tpu_bench/synth.raw")
        depth_b = mm2meters(jnp.asarray(rd.read_next_depth_frame()), 2)
        print("block sweep: real bench-scene depth", file=sys.stderr)
    except Exception:
        depth_b = depth
        print("block sweep: random depth (no bench dataset)",
              file=sys.stderr)

    for (nz, ny, nx) in ((8, 8, 1), (8, 8, 2), (8, 8, 8),
                         (16, 16, 2), (16, 16, 8)):
        if V % nz or V % ny or V % nx:
            continue
        vis = np.asarray(block_visibility(
            nz, ny, dim, inv_bench, K, depth_b, 0.1, n_x=nx))

        @jax.jit
        def integ_blk(t, w, d, _nz=nz, _ny=ny, _nx=nx):
            def body(i, c):
                return integrate_blocks(c[0], c[1], d, inv_bench, K, 0.1,
                                        params.MAX_WEIGHT, dim,
                                        n_z=_nz, n_y=_ny, n_x=_nx)
            return jax.lax.fori_loop(0, REPS, body, (t, w))

        dt = _timeit(integ_blk, tsdf0, w0, depth_b) / REPS
        report(f"integrate_blocks_{nz}x{ny}x{nx}", dt,
               f"(visible {vis.sum()}/{vis.size})")

    # ---------------- 2. row gather for the ICP ref fetch -------------- #
    npix = H * W
    idx2d = jnp.asarray(
        rng.integers(0, npix, npix).astype(np.int32)).reshape(H, W)

    ref6 = jnp.asarray(rng.random((6, npix)).astype(np.float32))
    ref8r = jnp.asarray(rng.random((npix, 8)).astype(np.float32))

    def chain(fn, tbl):
        @jax.jit
        def run(i2d, t):
            def body(i, c):
                acc, ii = c
                g = fn(ii, t)
                d = (g.reshape(-1)[0] * 0).astype(jnp.int32)
                return acc + g.sum(), ii + d
            return jax.lax.fori_loop(
                0, 8, body, (jnp.float32(0), i2d))[0]
        return lambda: _timeit(run, idx2d, tbl) / 8

    report("ref_gather_6xHW", chain(
        lambda i, t: t.at[:, i].get(mode="promise_in_bounds"), ref6)(),
        "(6 channel rows, 460k elems)")
    report("ref_rowgather_HWx8", chain(
        lambda i, t: t.at[i, :].get(mode="promise_in_bounds"), ref8r)(),
        "(77k rows x 8-elem slices)")

    # ---------------- 3. take_along_axis vs general gather ------------- #
    N = 2 * 1024 * 1024
    tbl = jnp.asarray(rng.random((N // 128, 128)).astype(np.float32))
    lane_idx = jnp.asarray(
        rng.integers(0, 128, N).astype(np.int32)).reshape(N // 128, 128)
    flat_idx = jnp.asarray(
        rng.integers(0, N, N).astype(np.int32)).reshape(N // 128, 128)

    def chain2(fn):
        @jax.jit
        def run(ii, t):
            def body(i, c):
                acc, iii = c
                g = fn(iii, t)
                d = (g.reshape(-1)[0] * 0).astype(jnp.int32)
                return acc + g.sum(), iii + d
            return jax.lax.fori_loop(0, 4, body, (jnp.float32(0), ii))[0]
        return run

    dt = _timeit(chain2(
        lambda i, t: jnp.take_along_axis(t, i, axis=-1)), lane_idx, tbl) / 4
    report("taa_lane_2M", dt, f"({dt/N*1e9:.1f} ns/elem)")
    dt = _timeit(chain2(
        lambda i, t: t.reshape(-1).at[i].get(mode="promise_in_bounds")),
        flat_idx, tbl) / 4
    report("gather_flat_2M", dt, f"({dt/N*1e9:.1f} ns/elem)")

    text = json.dumps(out, indent=1)
    if args.json:
        with open(args.json, "w") as f:
            f.write(text)
    print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
