"""ICP iteration census: iterations actually run per pyramid level.

The tracking phase budgets 10/5/4 iterations (coarse->fine, reference:
kfusion/src/cpp/kernels.cpp:950-966 with ``iterations[level]``,
default_parameters.h:31) but the in-graph ``lax.while_loop`` early-exits
on ``|x| < icp_threshold`` (ops/solve.update_pose, reference cpp:770-771
``break``). The phase's gather population — and therefore its element
floor on a gather-bound endpoint (PROFILE.md §2-§3) — is set by the
iterations that actually RUN: each iteration issues ONE stacked gather of
6 x (H>>l)(W>>l) reference-map channels (ops/track.py). This tool runs
the bench scene through ``pipeline.KFusion._tracking(with_census=True)``
— the pipeline's own tracking implementation, which exposes the
while_loop's executed-iteration counts — and reports:

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
    ap.add_argument("--frames", type=int, default=24,
                    help="frames to run; steady state (frame > 3) is "
                         "what the census reports, so must be >= 5")
    ap.add_argument("--dataset", default="/tmp/slambench_tpu_bench")
    ap.add_argument("--gather-ns", type=float, default=33.0,
                    help="gather rate (ns/elem) for the floor estimate "
                         "(PROFILE.md §3 canon: 33)")
    ap.add_argument("--motion-model", default="none",
                    choices=("none", "cv"))
    ap.add_argument("--json", default="")
    args = ap.parse_args(argv)
    if args.frames < 5:
        ap.error("--frames must be >= 5 (frames 0-3 are bootstrap; the "
                 "census reports steady-state frames only)")

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from slambench_tpu.io.readers import RawDepthReader
    from slambench_tpu.io.synthetic import generate_dataset
    from slambench_tpu.pipeline import KFusion

    raw = osp.join(args.dataset, "synth.raw")

    def read_all(need: int):
        if not osp.exists(raw):
            return []
        rd = RawDepthReader(raw)
        out = []
        for _ in range(need):
            d = rd.read_next_depth_frame()
            if d is None:
                break
            out.append(np.ascontiguousarray(d))
        return out

    # Regenerate when missing OR stale-short (a previous run may have
    # written fewer frames to the same shared path).
    depths = read_all(args.frames)
    if len(depths) < args.frames:
        generate_dataset(args.dataset, n_frames=max(args.frames, 8),
                         image_size=(640, 480), dim=(4.8,) * 3,
                         amp=0.25, period=60)
        depths = read_all(args.frames)

    W, H = 320, 240
    camera = tuple(c / 2 for c in (481.2, 480.0, 320.0, 240.0))
    init = (0.34 * 4.8, 0.5 * 4.8, 0.24 * 4.8)
    kf = KFusion((W, H), (args.volume,) * 3, (4.8,) * 3, init,
                 (10, 5, 4), camera, mu=0.1, backend="fast",
                 motion_model=args.motion_model)
    levels = kf._levels

    counted_tracking = jax.jit(
        lambda s: kf._tracking(s, with_census=True))

    state = kf.init_state()
    rows = []
    for frame, d in enumerate(depths):
        depth = jnp.asarray(d)
        state = kf.preprocessing(state, depth)
        # tracking_rate 1 (canonical bench schedule).
        state, counts, convs = counted_tracking(state)
        if frame > 3:             # steady state only (post-bootstrap)
            rows.append((frame, np.asarray(counts), np.asarray(convs)))
        state = kf.integration(state, integrate_frame=True,
                               force_integrate=(frame <= 3))
        if frame > 2:
            state = kf.raycasting(state)

    if not rows:
        print(f"no steady-state frames ran (dataset at {raw} yielded "
              f"{len(depths)} frames; need > 4)", file=sys.stderr)
        return 1

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
