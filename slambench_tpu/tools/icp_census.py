"""ICP iteration census: iterations actually run per pyramid level.

The tracking phase budgets 10/5/4 iterations (coarse->fine, reference:
kfusion/src/cpp/kernels.cpp:950-966 with ``iterations[level]``,
default_parameters.h:31) but the in-graph ``lax.while_loop`` early-exits
on ``|x| < icp_threshold`` (ops/solve.update_pose, reference cpp:770-771
``break``). The phase's gather population — and therefore its element
floor on a gather-bound endpoint (PROFILE.md §2-§3) — is set by the
iterations that actually RUN: each iteration issues ONE stacked gather of
6 x (H>>l)(W>>l) reference-map channels (ops/track.py). This tool runs
the bench scene through the exact tracking logic with per-level
iteration counters and reports:

* per-frame (coarsest..finest) executed-iteration counts,
* budget-exhaustion rate per level (early exit never fired),
* gathered elements/frame implied by the census, and the tracking-phase
  element floor at a given gather rate (ns/elem).

Iteration counts depend on convergence numerics, which are platform-FMA
sensitive only at the +-1-iteration margin; the tool runs on CPU (same
rationale as march_census — the distribution, not the last ulp, is the
evidence).

Usage: python -m slambench_tpu.tools.icp_census [--volume 256]
           [--frames 24] [--gather-ns 33] [--json f]
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--volume", type=int, default=256)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--dataset", default="/tmp/slambench_tpu_bench")
    ap.add_argument("--gather-ns", type=float, default=33.0,
                    help="gather rate (ns/elem) for the floor estimate "
                         "(PROFILE.md §3 canon: 33)")
    ap.add_argument("--motion-model", default="none",
                    choices=("none", "cv"))
    ap.add_argument("--json", default="")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from slambench_tpu.geometry import (
        get_camera_matrix, get_inverse_camera_matrix, mat4mul,
        rigid_inverse,
    )
    from slambench_tpu.io.readers import RawDepthReader
    from slambench_tpu.io.synthetic import generate_dataset
    from slambench_tpu.ops.solve import check_pose, update_pose
    from slambench_tpu.ops.track import track_and_reduce
    from slambench_tpu.ops.vertex import depth2vertex, vertex2normal
    from slambench_tpu.pipeline import KFusion, cv_predict
    import dataclasses

    raw = osp.join(args.dataset, "synth.raw")
    if not osp.exists(raw):
        generate_dataset(args.dataset, n_frames=max(args.frames, 8),
                         image_size=(640, 480), dim=(4.8,) * 3,
                         amp=0.25, period=60)

    W, H = 320, 240
    camera = tuple(c / 2 for c in (481.2, 480.0, 320.0, 240.0))
    init = (0.34 * 4.8, 0.5 * 4.8, 0.24 * 4.8)
    kf = KFusion((W, H), (args.volume,) * 3, (4.8,) * 3, init,
                 (10, 5, 4), camera, mu=0.1, backend="fast",
                 motion_model=args.motion_model)

    levels = kf._levels
    k_arr = kf._k

    def counted_tracking(state):
        """pipeline._tracking with the while_loop's final ``i`` (executed
        iterations) and convergence flag captured per level."""
        pyr = kf._build_pyramid(state.scaled_depth0)
        verts, norms = [], []
        for i in range(levels):
            inv_k = get_inverse_camera_matrix(k_arr / float(1 << i))
            v = depth2vertex(pyr[i], inv_k)
            verts.append(v)
            norms.append(vertex2normal(v))

        old_pose = state.pose
        view = mat4mul(get_camera_matrix(k_arr),
                       rigid_inverse(state.raycast_pose))
        if kf.motion_model == "cv":
            pose = cv_predict(state.pose, state.old_pose)
        else:
            pose = state.pose
        reduction = state.reduction
        track_result = state.track_result
        counts, convs = [], []

        for level in reversed(range(levels)):
            h, w = H >> level, W >> level
            max_iters = kf.iterations[level]

            def body(carry, _level=level):
                i, pose_c, _red, _res, _conv = carry
                red, data = track_and_reduce(
                    verts[_level], norms[_level],
                    state.ref_vertex, state.ref_normal, pose_c, view)
                new_pose, conv = update_pose(pose_c, red, kf.icp_threshold)
                return (i + 1, new_pose, red, data["result"], conv)

            def cond(carry, _max=max_iters):
                i, _p, _r, _res, conv = carry
                return (i < _max) & ~conv

            init_c = (jnp.int32(0), pose, reduction,
                      jnp.zeros((h, w), jnp.int32), jnp.asarray(False))
            n_it, pose, reduction, level_result, conv = jax.lax.while_loop(
                cond, body, init_c)
            counts.append(n_it)
            convs.append(conv)
            if level == 0:
                track_result = level_result

        pose, tracked = check_pose(pose, old_pose, reduction, (H, W))
        new_state = dataclasses.replace(
            state, pose=pose, old_pose=old_pose, reduction=reduction,
            track_result=track_result, tracked=tracked)
        return new_state, jnp.stack(counts), jnp.stack(convs)

    counted_tracking = jax.jit(counted_tracking)

    rd = RawDepthReader(raw)
    state = kf.init_state()
    rows = []
    for frame in range(args.frames):
        d = rd.read_next_depth_frame()
        if d is None:
            break
        depth = jnp.asarray(np.ascontiguousarray(d))
        state = kf.preprocessing(state, depth)
        if frame % 1 == 0:        # tracking_rate 1 (canonical bench)
            state, counts, convs = counted_tracking(state)
            if frame > 3:         # steady state only (post-bootstrap)
                rows.append((frame, np.asarray(counts),
                             np.asarray(convs)))
        state = kf.integration(state, integrate_frame=True,
                               force_integrate=(frame <= 3))
        if frame > 2:
            state = kf.raycasting(state)

    budgets = list(reversed(kf.iterations))       # coarsest-first
    level_names = [f"L{levels - 1 - i}" for i in range(levels)]
    counts = np.stack([r[1] for r in rows])        # [F, levels]
    convs = np.stack([r[2] for r in rows])
    npix = [(H >> (levels - 1 - i)) * (W >> (levels - 1 - i))
            for i in range(levels)]

    per_level = {}
    for i, name in enumerate(level_names):
        c = counts[:, i]
        per_level[name] = {
            "budget": budgets[i],
            "mean": round(float(c.mean()), 2),
            "p50": int(np.percentile(c, 50)),
            "max": int(c.max()),
            "budget_exhausted_pct": round(
                100.0 * float(np.mean(~convs[:, i])), 1),
            "pixels": npix[i],
        }

    # Element accounting: 6 gathered channels per pixel per iteration
    # (ops/track.py stacks ref_normal+ref_vertex into ONE gather).
    elems = (counts * 6 * np.asarray(npix)[None, :]).sum(axis=1)
    res = {
        "frames": len(rows),
        "iterations_budget": budgets,
        "per_level": per_level,
        "total_iters_mean": round(float(counts.sum(axis=1).mean()), 2),
        "total_iters_budget": int(sum(budgets)),
        "gathered_elems_per_frame_mean": int(elems.mean()),
        "gather_ns_per_elem": args.gather_ns,
        "tracking_floor_ms_at_rate": round(
            float(elems.mean()) * args.gather_ns * 1e-6, 1),
    }
    text = json.dumps(res, indent=1)
    if args.json:
        with open(args.json, "w") as f:
            f.write(text)
    print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
