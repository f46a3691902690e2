"""Per-op roofline profile of the frame step on real hardware.

The committed evidence for "where frame time goes": times every pipeline
op in isolation (chained, in-jit repetitions + scalar fetch — the only
trustworthy methodology on this tunneled endpoint, see CLAUDE.md), the
fused ``compute_frame``, and the gather primitives that dominate the
data-dependent ops, then prints a JSON report with measured ms and the
analytic HBM bytes per op.

The reference's per-kernel attribution routes are TICK/TOCK stderr and
nvprof (reference: kfusion/src/cpp/kernels.cpp:16-37,
thirdparty/nvprof2log.py); this tool is their roofline-oriented TPU
equivalent — per-kernel ns plus a bytes account, so "memory-bound" is a
number, not a sentence.

Usage:  python -m slambench_tpu.tools.profile_frame [--volume 256]
        [--frames 12] [--reps 6] [--trace DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _chain_loop(fn, perturb, reps):
    """Build a jitted fori_loop running ``fn`` ``reps`` times, each
    iteration's input perturbed by the previous output (defeats
    call-result caching on the tunneled endpoint)."""
    import jax

    @jax.jit
    def looped(*args):
        def body(i, carry):
            out = fn(*perturb(carry, args))
            return out
        return jax.lax.fori_loop(0, reps, body, fn(*args))

    return looped


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--volume", type=int, default=256)
    ap.add_argument("--frames", type=int, default=12,
                    help="warm-up frames to build realistic state")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--trace", default="",
                    help="also capture an xprof trace into this dir")
    ap.add_argument("--dataset", default="/tmp/slambench_tpu_bench")
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    from slambench_tpu.utils import backend as backend_select
    backend_select.select_backend()
    backend_select.enable_jit_cache()

    import jax
    import jax.numpy as jnp

    from slambench_tpu import params
    from slambench_tpu.geometry import (
        get_camera_matrix, get_inverse_camera_matrix, mat4mul, rigid_inverse,
    )
    from slambench_tpu.io.raw import raw_frame_count
    from slambench_tpu.io.readers import RawDepthReader
    from slambench_tpu.io.synthetic import generate_dataset
    from slambench_tpu.ops.integrate import integrate
    from slambench_tpu.ops.preprocess import (
        bilateral_filter, half_sample_robust, mm2meters,
    )
    from slambench_tpu.ops.raycast_fast import (
        make_min_mip, raycast_fast_maps, warm_start_bound,
    )
    from slambench_tpu.ops.track import track_and_reduce
    from slambench_tpu.ops.vertex import depth2vertex, vertex2normal
    from slambench_tpu.pipeline import KFusion

    res = {"backend": jax.default_backend(), "volume": args.volume}
    V = args.volume
    RATIO = 2
    W, H = 640 // RATIO, 480 // RATIO

    # --- realistic state: run the bench scene for a few frames -------- #
    from slambench_tpu.io.synthetic import SCENE_VERSION
    raw = os.path.join(args.dataset, "synth.raw")
    vfile = os.path.join(args.dataset, "synth.scene_version")
    n_needed = max(args.frames, 8)
    regen = not os.path.exists(raw) or raw_frame_count(raw) < n_needed
    try:
        regen = regen or int(open(vfile).read()) != SCENE_VERSION
    except (OSError, ValueError):
        regen = True
    if regen:
        man = generate_dataset(args.dataset, n_frames=max(n_needed, 48),
                               image_size=(640, 480), dim=(4.8, 4.8, 4.8),
                               amp=0.25, period=60)
        np.save(os.path.join(args.dataset, "poses.npy"), man["poses"])

    camera = tuple(c / RATIO for c in (481.2, 480.0, 320.0, 240.0))
    init = (0.34 * 4.8, 0.5 * 4.8, 0.24 * 4.8)
    kf = KFusion((W, H), (V,) * 3, (4.8, 4.8, 4.8), init,
                 (10, 5, 4), camera, mu=0.1)
    state = kf.init_state()
    rd = RawDepthReader(raw)
    depths = []
    for frame in range(args.frames):
        d = rd.read_next_depth_frame()
        depths.append(np.ascontiguousarray(d))
        state = kf.process_frame(state, jnp.asarray(depths[-1]), frame,
                                 tracking_rate=1, integration_rate=1)
    jax.block_until_ready(state)
    depth_mm = jnp.asarray(depths[-1])
    print(f"state built ({args.frames} frames), tracked="
          f"{bool(state.tracked)}", file=sys.stderr, flush=True)

    reps = args.reps
    K = jnp.asarray(camera, jnp.float32)

    def timeit(name, looped, *args_, bytes_per_call=0, calls=reps):
        r = looped(*args_)
        jax.block_until_ready(r)
        t0 = time.monotonic()
        r = looped(*args_)
        jax.block_until_ready(r)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).reshape(-1)[:1]
        dt = (time.monotonic() - t0) / calls
        res[name] = {
            "ms": round(dt * 1e3, 3),
            "mb": round(bytes_per_call / 1e6, 1),
            "gbps": round(bytes_per_call / dt / 1e9, 2) if dt > 0 else 0.0,
        }
        print(f"{name:28s} {dt*1e3:9.3f} ms   "
              f"{bytes_per_call/1e6:8.1f} MB   "
              f"{bytes_per_call/dt/1e9:6.2f} GB/s",
              file=sys.stderr, flush=True)
        return dt

    fd = mm2meters(depth_mm, RATIO)
    sd0 = bilateral_filter(fd, kf.gaussian, params.E_DELTA, params.RADIUS)
    jax.block_until_ready((fd, sd0))
    npix = H * W

    # ---- preprocessing ops ---- #
    timeit("mm2meters",
           _chain_loop(lambda d: mm2meters(d, RATIO),
                       lambda c, a: ((a[0] + c[0, 0].astype(jnp.uint16)),),
                       reps), depth_mm,
           bytes_per_call=640 * 480 * 2 + npix * 4)
    timeit("bilateral_filter",
           _chain_loop(
               lambda d: bilateral_filter(d, kf.gaussian, params.E_DELTA,
                                          params.RADIUS),
               lambda c, a: ((a[0] + c[0, 0] * 1e-20),), reps), fd,
           bytes_per_call=npix * 4 * 2)

    # ---- one ICP track+reduce iteration (level 0) ---- #
    inv_k = get_inverse_camera_matrix(K)
    vert = depth2vertex(sd0, inv_k)
    norm = vertex2normal(vert)
    view = mat4mul(get_camera_matrix(K), rigid_inverse(state.raycast_pose))
    jax.block_until_ready((vert, norm))

    def one_icp(pose):
        red, _ = track_and_reduce(vert, norm, state.ref_vertex,
                                  state.ref_normal, pose, view)
        return pose + red[0] * 1e-20

    timeit("track_reduce_L0",
           _chain_loop(lambda p: one_icp(p), lambda c, a: (c,), reps),
           state.pose,
           # in vert/norm + ref vert/norm reads + J implicit (fused)
           bytes_per_call=npix * 4 * 3 * 4)

    # ---- full tracking phase (~19 iterations over the pyramid) ---- #
    track_fn = jax.jit(kf._tracking)
    timeit("tracking_phase",
           _chain_loop(
               lambda s: track_fn(s),
               lambda c, a: (c,), reps), state,
           bytes_per_call=npix * 4 * 3 * 4 * 19)

    # ---- ICP-loop decomposition probes (PROFILE.md §10): in-graph,
    # inside a fori_loop like the real while_loop, so per-op cost is the
    # IN-GRAPH op cost, not the dispatch cost. Each probe's loop body
    # chains on the previous iteration's output (CLAUDE.md timing
    # methodology), so one jit call = `calls` genuine executions. ---- #
    from slambench_tpu.ops.solve import update_pose as _update_pose

    def timeit_direct(name, fn, *args_, calls, bytes_per_call=0):
        r = fn(*args_)
        jax.block_until_ready(r)
        t0 = time.monotonic()
        r = fn(*args_)
        jax.block_until_ready(r)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).reshape(-1)[:1]
        dt = (time.monotonic() - t0) / calls
        res[name] = {
            "ms": round(dt * 1e3, 3),
            "mb": round(bytes_per_call / 1e6, 1),
            "gbps": round(bytes_per_call / dt / 1e9, 2) if dt > 0 else 0.0,
        }
        print(f"{name:28s} {dt*1e3:9.3f} ms   "
              f"{bytes_per_call/1e6:8.1f} MB   "
              f"{bytes_per_call/dt/1e9:6.2f} GB/s",
              file=sys.stderr, flush=True)
        return dt

    # (a) the per-iteration stacked [6, h, w] ref-map gather at each
    # pyramid population (ops/track.py issues exactly one of these per
    # ICP iteration).
    refs6 = jnp.concatenate([state.ref_normal.reshape(3, -1),
                             state.ref_vertex.reshape(3, -1)], axis=0)
    loop_reps = 16
    for level in (0, 1, 2):
        h, w = H >> level, W >> level
        idx_l = jnp.asarray(
            np.random.randint(0, npix, (h, w)).astype(np.int32))

        @jax.jit
        def loop_gather(idx, _h=h, _w=w):
            def body(i, carry):
                acc, ix = carry
                g = refs6.at[:, ix].get(mode="promise_in_bounds")
                d = (g[0].astype(jnp.int32) & 0)
                return (acc + g[0], ix + d)
            return jax.lax.fori_loop(
                0, loop_reps, body,
                (jnp.zeros((_h, _w), jnp.float32), idx))[0]

        timeit_direct(f"icp_gather6_L{level}_per_iter", loop_gather,
                      idx_l, calls=loop_reps,
                      bytes_per_call=6 * h * w * 4)

    # (a2) the tracking phase MINUS the ICP loops: a zero-iteration
    # pyramid budget leaves pyramid build + vertex/normal + check_pose —
    # the prep component of the §10 floor decomposition.
    kf0 = KFusion((W, H), (V,) * 3, kf.volume_dimensions, init,
                  (0, 0, 0), camera, mu=0.1)
    track_prep = jax.jit(kf0._tracking)
    timeit("tracking_prep_only",
           _chain_loop(lambda s: track_prep(s), lambda c, a: (c,), reps),
           state, bytes_per_call=npix * 4 * 3 * 4)

    # (b) the in-graph 6x6 solve + SE(3) retraction alone (the Jacobi
    # eigh runs ~90 unrolled rotations per ICP iteration — is it free?).
    @jax.jit
    def solve_loop(pose):
        def body(i, p):
            red = state.reduction + p[0, 0] * 1e-20
            p2, _ = _update_pose(p, red, kf.icp_threshold)
            return p2
        return jax.lax.fori_loop(0, 64, body, pose)

    timeit_direct("update_pose_solve_per_iter", solve_loop,
                  state.pose, calls=64)

    # (c) one full ICP iteration (track+reduce+solve) per fori step at
    # L0 — the while_loop body's true in-graph cost.
    @jax.jit
    def icp_iter_loop(pose):
        def body(i, p):
            red, _ = track_and_reduce(vert, norm, state.ref_vertex,
                                      state.ref_normal, p, view)
            p2, _ = _update_pose(p, red, kf.icp_threshold)
            return p2
        return jax.lax.fori_loop(0, loop_reps, body, pose)

    timeit_direct("icp_full_iter_L0", icp_iter_loop,
                  state.pose, calls=loop_reps,
                  bytes_per_call=6 * npix * 4)

    # ---- integrate ---- #
    vol_bytes = V ** 3 * 3          # int16 tsdf + int8 weight
    inv_track = rigid_inverse(state.pose)
    cam_k = get_camera_matrix(K)

    def integ(tsdf, weight):
        t, w = integrate(tsdf, weight, fd, inv_track, cam_k, 0.1,
                         params.MAX_WEIGHT, kf.volume_dimensions)
        return t, w

    timeit("integrate",
           _chain_loop(lambda t, w: integ(t, w),
                       lambda c, a: (c[0], c[1]), reps),
           state.tsdf, state.weight,
           bytes_per_call=vol_bytes * 2)

    # ---- integrate + mip in one jit (does XLA fuse the mip's volume
    # re-read into the integrate pass? measured, not assumed) ---- #
    def integ_mip(tsdf, weight):
        t, w = integrate(tsdf, weight, fd, inv_track, cam_k, 0.1,
                         params.MAX_WEIGHT, kf.volume_dimensions)
        return t, w, make_min_mip(t)

    timeit("integrate_plus_mip_fused",
           _chain_loop(lambda t, w: integ_mip(t, w),
                       lambda c, a: (c[0], c[1]), reps),
           state.tsdf, state.weight,
           bytes_per_call=vol_bytes * 2)

    # ---- integrate through the pipeline's default path (the frustum-
    # culled block grid on TPU) + mip, as the fused frame runs it ---- #
    nz, ny, nx = kf.integrate_block_grid
    if (nz, ny, nx) != (1, 1, 1):
        from slambench_tpu.ops.integrate import integrate_blocks

        def integ_blk_mip(tsdf, weight):
            t, w = integrate_blocks(
                tsdf, weight, fd, inv_track, cam_k, 0.1,
                params.MAX_WEIGHT, kf.volume_dimensions,
                n_z=nz, n_y=ny, n_x=nx)
            return t, w, make_min_mip(t)

        timeit(f"integrate_blocks_{nz}x{ny}x{nx}_plus_mip",
               _chain_loop(lambda t, w: integ_blk_mip(t, w),
                           lambda c, a: (c[0], c[1]), reps),
               state.tsdf, state.weight,
               bytes_per_call=vol_bytes * 2)

        # Live-voxel accounting at this pose (the integrate phase's
        # gather population for the floor analysis, PROFILE.md §10).
        from slambench_tpu.ops.integrate import block_visibility
        vis = np.asarray(block_visibility(
            nz, ny, kf.volume_dimensions, inv_track, cam_k, fd, 0.1,
            n_x=nx))
        block_voxels = V ** 3 // (nz * ny * nx)
        res["integrate_population"] = {
            "live_blocks": int(vis.sum()),
            "total_blocks": int(vis.size),
            "live_voxels": int(vis.sum()) * block_voxels,
            "total_voxels": V ** 3,
        }

    # ---- make_min_mip ---- #
    mip_bytes = V ** 3 * 2 + (V // 8) * V * V * 2  # read vol + 1st pass out
    timeit("make_min_mip",
           _chain_loop(lambda t: make_min_mip(t),
                       lambda c, a: (a[0] + (c[0, 0, 0] & 0),), reps),
           state.tsdf, bytes_per_call=mip_bytes)

    # ---- raycast (fast, with + without warm start) ---- #
    rc_view = mat4mul(state.pose, get_inverse_camera_matrix(K))

    def rc(tsdf, t_init):
        v, n, t = raycast_fast_maps(
            tsdf, state.mip, kf.volume_dimensions, rc_view, (H, W),
            params.NEAR_PLANE, params.FAR_PLANE, kf.step, 0.75 * kf.mu,
            t_init=t_init)
        return v, n, t

    delta = mat4mul(rigid_inverse(state.raycast_pose), state.pose)
    t_init = warm_start_bound(state.prev_t_hit, delta, params.FAR_PLANE,
                              0.75 * kf.mu)
    zeros_t = jnp.zeros((H, W), jnp.float32)
    timeit("raycast_cold",
           _chain_loop(lambda t, ti: rc(t, ti),
                       lambda c, a: (a[0] + (jnp.int16(0) * c[2][0, 0]
                                             .astype(jnp.int16)), a[1]),
                       reps),
           state.tsdf, zeros_t, bytes_per_call=0)
    timeit("raycast_warm",
           _chain_loop(lambda t, ti: rc(t, ti),
                       lambda c, a: (a[0], a[1] + c[2][0, 0] * 1e-20),
                       reps),
           state.tsdf, t_init, bytes_per_call=0)

    # ---- fused frame (the bench configuration) ---- #
    fused = jax.jit(lambda s, d: kf._compute_frame(
        s, d, tracking_on=True, integrate_frame=True,
        force_integrate=False, raycast_on=True))
    r = fused(state, depth_mm)
    jax.block_until_ready(r)
    t0 = time.monotonic()
    s2 = state
    for _ in range(reps):
        s2 = fused(s2, depth_mm)
    jax.block_until_ready(s2)
    _ = np.asarray(s2.pose)[0, 0]
    dt = (time.monotonic() - t0) / reps
    res["compute_frame_fused"] = {"ms": round(dt * 1e3, 3)}
    print(f"{'compute_frame_fused':28s} {dt*1e3:9.3f} ms",
          file=sys.stderr, flush=True)

    # ---- gather primitives ---- #
    flat_vol = state.tsdf.reshape(-1)
    ridx = jnp.asarray(np.random.randint(0, V ** 3, (H, W)).astype(np.int32))
    # Coherent indices: what the raycast actually issues (neighbouring
    # rays hit neighbouring voxels).
    ci = np.minimum(
        (np.arange(H * W) * 7 // (H * W)).astype(np.int64) * (V ** 3 // 8)
        + np.arange(H * W) % 4096, V ** 3 - 1)
    cidx = jnp.asarray(ci.reshape(H, W).astype(np.int32))

    def gat(idx):
        g = jnp.take(flat_vol, idx)
        return idx + (g[0, 0] & 0)

    timeit("gather_vol_random_76800",
           _chain_loop(lambda i: gat(i), lambda c, a: (c,), reps), ridx)
    timeit("gather_vol_coherent_76800",
           _chain_loop(lambda i: gat(i), lambda c, a: (c,), reps), cidx)

    small = sd0.reshape(-1)
    sidx = jnp.asarray(np.random.randint(0, npix, (H, W)).astype(np.int32))

    def gats(idx):
        g = jnp.take(small, idx)
        return idx + (g[0, 0] * 0).astype(jnp.int32)

    timeit("gather_small_76800",
           _chain_loop(lambda i: gats(i), lambda c, a: (c,), reps), sidx)

    # Session gather-rate calibration at the 2M population (bench.py's
    # exact probe): the ns/elem the §10 floor analysis is priced at.
    kc = 128
    gidx = jnp.asarray(np.random.default_rng(0).integers(
        0, npix, kc ** 3).astype(np.int32)).reshape(kc, kc, kc)

    @jax.jit
    def gather2m(idx):
        def body(i, carry):
            acc, ix = carry
            g = small.at[ix].get(mode="promise_in_bounds")
            d = (g.reshape(-1)[0] * 0).astype(jnp.int32)
            return (acc + g, ix + d)
        return jax.lax.fori_loop(
            0, 4, body, (jnp.zeros(idx.shape, jnp.float32), idx))[0]

    dt2m = timeit_direct("gather_2m_session", gather2m, gidx, calls=4)
    res["session_gather_ns_per_elem"] = round(dt2m / kc ** 3 * 1e9, 1)

    # COHERENT variant at the same population: neighbouring lookups hit
    # neighbouring table entries — the access pattern integrate's
    # per-voxel depth lookup actually has (adjacent voxels project to
    # adjacent pixels). The random/coherent ratio explains the gap
    # between this probe and the in-frame integrate rate (§10).
    ci2 = np.minimum((np.arange(kc ** 3, dtype=np.int64) * npix)
                     // kc ** 3 + np.arange(kc ** 3) % 7,
                     npix - 1).astype(np.int32)
    cidx2 = jnp.asarray(ci2.reshape(kc, kc, kc))
    dt2mc = timeit_direct("gather_2m_coherent", gather2m, cidx2, calls=4)
    res["session_gather_coherent_ns_per_elem"] = round(
        dt2mc / kc ** 3 * 1e9, 1)

    # ---- device calibration (same probes as bench.py) ---- #
    x = jnp.zeros((64, 1024, 1024), jnp.float32)

    @jax.jit
    def bw_probe(x):
        return jax.lax.fori_loop(0, 4, lambda i, a: a * 1.0000001 + 1e-9, x)

    bw_probe(x).block_until_ready()
    t0 = time.monotonic()
    r = bw_probe(x)
    r.block_until_ready()
    _ = np.asarray(r[0, 0, 0])
    res["device_eff_gbps"] = round(
        4 * 2 * x.nbytes / (time.monotonic() - t0) / 1e9, 2)

    if args.trace:
        from slambench_tpu.utils.profiling import trace
        with trace(args.trace):
            s2 = fused(s2, depth_mm)
            jax.block_until_ready(s2)
        res["trace_dir"] = args.trace

    out = json.dumps(res, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
