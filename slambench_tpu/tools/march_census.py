"""Per-ray march substep census on the bench scene.

The lockstep march's cost is set by the LONGEST ray (every `while`
substep gathers for all rays, done lanes included — PROFILE.md §2), so
the design question "where do the substeps go" needs the per-ray
DISTRIBUTION, not the mean. This tool instruments the exact fast-tier
march logic (same stepping rules as ops/raycast_fast.mip_march) with
per-ray counters and reports the substep histogram split by step class
(empty-cell skip / fine / large).

Trip counts depend only on geometry, so this runs fine on CPU.

Round-4 measurement (256^3 bench scene, frame 8, 320x240):
  substeps mean 11.7 / p50 11 / p90 18 / p99 24 / max 54;
  class totals: 59% empty-skip, 31% fine, 10% large; the >=p99 rays are
  wall-grazing paths dominated by LARGE steps through crossing-bearing
  cells. That p99-vs-max gap is the evidence behind the two-phase
  straggler compaction (ops/raycast_fast.march_two_phase).

Usage: python -m slambench_tpu.tools.march_census [--volume 256]
           [--frames 8] [--dataset /tmp/slambench_tpu_bench] [--json f]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--volume", type=int, default=256)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--dataset", default="/tmp/slambench_tpu_bench")
    ap.add_argument("--json", default="")
    args = ap.parse_args(argv)

    # Trip counts depend only on geometry (docstring above), so the tool
    # always runs on CPU — no flag, no accidental TPU compile.
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from slambench_tpu import params
    from slambench_tpu.geometry import get_inverse_camera_matrix, mat4mul
    from slambench_tpu.io.readers import RawDepthReader
    from slambench_tpu.io.synthetic import generate_dataset
    from slambench_tpu.ops import raycast_fast as rf
    from slambench_tpu.ops.raycast import camera_rays, ray_box_clip
    from slambench_tpu.pipeline import KFusion
    import os.path as osp
    from slambench_tpu import volume as V

    raw = osp.join(args.dataset, "synth.raw")
    if not osp.exists(raw):
        generate_dataset(args.dataset, n_frames=max(args.frames, 8),
                         image_size=(640, 480), dim=(4.8,) * 3,
                         amp=0.25, period=60)

    W, H = 320, 240
    camera = tuple(c / 2 for c in (481.2, 480.0, 320.0, 240.0))
    init = (0.34 * 4.8, 0.5 * 4.8, 0.24 * 4.8)
    kf = KFusion((W, H), (args.volume,) * 3, (4.8,) * 3, init,
                 (10, 5, 4), camera, mu=0.1, backend="fast")
    rd = RawDepthReader(raw)
    state = kf.init_state()
    for f in range(args.frames):
        d = rd.read_next_depth_frame()
        state = kf.process_frame(
            state, jnp.asarray(np.ascontiguousarray(d)), f, 1, 1)

    view = mat4mul(state.pose, get_inverse_camera_matrix(
        jnp.asarray(camera, jnp.float32)))
    tsdf, mip = state.tsdf, state.mip
    dim = (4.8,) * 3
    origin, direction = camera_rays(view, (H, W))
    tnear, tfar = ray_box_clip(origin, direction, dim,
                               params.NEAR_PLANE, params.FAR_PLANE)

    sz, sy, sx = tsdf.shape
    o = origin.reshape(3, 1, 1)
    voxel = jnp.array([dim[0] / sx, dim[1] / sy, dim[2] / sz],
                      jnp.float32).reshape(3, 1, 1)
    flat_vol = tsdf.reshape(-1)
    skip = rf.make_skip_mip(mip)
    flat_skip = skip.reshape(-1)
    mzb, myb, mxb = mip.shape
    limit = jnp.array([sx - 1, sy - 1, sz - 1], jnp.int32).reshape(3, 1, 1)
    step, large_step = kf.step, 0.75 * kf.mu
    m = rf.MIP_BLOCK

    def voxel_idx(pos):
        return jnp.clip((pos / voxel).astype(jnp.int32), 0, limit)

    def nearest_t(t):
        idx = voxel_idx(o + direction * t[None])
        flat = (idx[2] * sy + idx[1]) * sx + idx[0]
        return V.take_flat(flat_vol, flat).astype(jnp.float32) \
            * params.TSDF_INV_SCALE

    def dist_t(t):
        idx = voxel_idx(o + direction * t[None])
        b = idx // m
        return V.take_flat(
            flat_skip,
            (jnp.clip(b[2], 0, mzb - 1) * myb
             + jnp.clip(b[1], 0, myb - 1)) * mxb
            + jnp.clip(b[0], 0, mxb - 1)).astype(jnp.int32)

    def ball_exit(t, dv):
        pos = o + direction * t[None]
        idx = voxel_idx(pos)
        b = (idx // m).astype(jnp.float32)
        r = (dv - 1).astype(jnp.float32)
        lo = (b - r) * (m * voxel)
        hi = (b + r + 1.0) * (m * voxel)
        dd = jnp.where(direction == 0, 1e-20, direction)
        ta = jnp.where(dd > 0, (hi - pos) / dd, (lo - pos) / dd)
        return t + jnp.maximum(
            jnp.minimum(jnp.minimum(ta[0], ta[1]), ta[2]), 0.0) \
            + 0.25 * step

    @jax.jit
    def march_count():
        f0 = nearest_t(tnear)
        active = tnear < tfar
        s = dict(t=tnear, t_prev=tnear, f_prev=f0,
                 stepsize=jnp.full_like(tnear, large_step),
                 done=~(active & (f0 > 0)),
                 hit=jnp.zeros(tnear.shape, bool), iters=jnp.int32(0),
                 count=jnp.zeros(tnear.shape, jnp.int32),
                 empty=jnp.zeros(tnear.shape, jnp.int32),
                 fine=jnp.zeros(tnear.shape, jnp.int32),
                 large=jnp.zeros(tnear.shape, jnp.int32))

        def cond(s):
            return jnp.any(~s["done"]) & (s["iters"] < 2000)

        def body(s):
            live = ~s["done"]
            f_tt = nearest_t(s["t"])
            dv = dist_t(s["t"])
            empty = dv >= 1
            is_hit = live & ~empty & (f_tt < 0.0)
            new_step = jnp.where(f_tt < 0.8, step, s["stepsize"])
            t_step = s["t"] + new_step
            t_next = jnp.where(
                empty, jnp.maximum(ball_exit(s["t"], dv), t_step), t_step)
            cont = live & ~is_hit
            return dict(
                t=jnp.where(cont, t_next, s["t"]),
                t_prev=jnp.where(cont & ~empty, s["t"], s["t_prev"]),
                f_prev=jnp.where(cont & ~empty, f_tt, s["f_prev"]),
                stepsize=jnp.where(cont & ~empty, new_step, s["stepsize"]),
                done=s["done"] | is_hit
                | (cont & (jnp.where(cont, t_next, s["t"]) >= tfar)),
                hit=s["hit"] | is_hit,
                iters=s["iters"] + 1,
                count=s["count"] + live.astype(jnp.int32),
                empty=s["empty"] + (live & empty).astype(jnp.int32),
                fine=s["fine"]
                + (live & ~empty & (f_tt < 0.8)).astype(jnp.int32),
                large=s["large"]
                + (live & ~empty & (f_tt >= 0.8)).astype(jnp.int32))

        return jax.lax.while_loop(cond, body, s)

    out = march_count()
    c = np.asarray(out["count"])
    h = np.asarray(out["hit"])
    res = {
        "mean": round(float(c.mean()), 2),
        "p50": int(np.percentile(c, 50)),
        "p90": int(np.percentile(c, 90)),
        "p99": int(np.percentile(c, 99)),
        "max": int(c.max()),
        "hit_rate": round(float(h.mean()), 3),
        "class_pct": {
            "empty": round(100 * float(np.asarray(out["empty"]).sum())
                           / c.sum(), 1),
            "fine": round(100 * float(np.asarray(out["fine"]).sum())
                          / c.sum(), 1),
            "large": round(100 * float(np.asarray(out["large"]).sum())
                           / c.sum(), 1),
        },
    }
    text = json.dumps(res, indent=1)
    if args.json:
        with open(args.json, "w") as f:
            f.write(text)
    print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
