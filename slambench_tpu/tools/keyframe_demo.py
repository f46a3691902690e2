"""End-to-end drift-correction artifact: long loop-closing run with the
keyframe/pose-graph backend, before/after ATE in one command.

The beyond-reference keyframe layer (models/keyframes.py, BASELINE
config 5) promises "drift removal for long runs"; this tool is the
reproducible demonstration: it synthesizes a long orbiting clip (the
camera re-visits its starting viewpoint every ``period`` frames —
natural loop closures), runs the full pipeline once with
``--keyframes`` through the benchmark front-end, and evaluates BOTH
trajectories the run exports against the exact ground truth:

  * raw odometry (frame-to-model tracking only), and
  * the pose-graph-corrected export.

Prints one JSON line with both ATE-RMSE numbers and the graph stats.

Usage:
  python -m slambench_tpu.tools.keyframe_demo [--frames 300]
      [--volume 64] [--image 160x120] [--out /tmp/slambench_kf_demo]

A coarse volume + fast motion are chosen deliberately: they make the
odometry drift visible so the correction is measurable (at the bench
config the odometry is already sub-voxel and there is little drift to
remove).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--volume", type=int, default=64)
    ap.add_argument("--image", default="160x120")
    ap.add_argument("--amp", type=float, default=0.35)
    ap.add_argument("--period", type=int, default=48)
    ap.add_argument("--out", default="/tmp/slambench_kf_demo")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (the demo is host-round-trip bound; "
                         "CPU is usually faster end-to-end than the "
                         "tunneled chip)")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from slambench_tpu.config import Configuration
    from slambench_tpu.eval.trajectory import ate_rmse, read_tum
    from slambench_tpu.frontend import benchmark as fb
    from slambench_tpu.io.synthetic import generate_dataset

    W, H = (int(v) for v in args.image.lower().split("x"))
    man = generate_dataset(args.out, n_frames=args.frames,
                           image_size=(W, H), dim=(4.8,) * 3,
                           amp=args.amp, period=args.period)

    cfg = Configuration()
    cfg.input_file = man["raw"]
    cfg.log_file = os.path.join(args.out, "kf_demo.log")
    cfg.volume_resolution = (args.volume,) * 3
    cfg.volume_size = man["dim"]
    cfg.initial_pos_factor = man["init_pos_factor"]
    cfg.camera = man["camera"]
    cfg.camera_overrided = True
    cfg.pyramid = (6, 4, 4)

    summary = fb.run(cfg, quiet=True, keyframes=True)
    pg = summary["posegraph"]

    gt = np.asarray(man["poses"])[: summary["frames"], :3, 3]
    raw = read_tum(cfg.log_file + ".kf_raw.tum")
    corr = read_tum(cfg.log_file + ".kf_corrected.tum")
    # Alignment-free ATE (both trajectories share the GT's world frame).
    raw_ate = ate_rmse(raw, gt, align=False)
    corr_ate = ate_rmse(corr, gt, align=False)

    n_loops = sum(1 for (i, j, _T, _w) in pg.graph.edges if abs(i - j) > 1)
    print(json.dumps({
        "frames": summary["frames"],
        "volume": args.volume,
        "keyframes": len(pg.store.keyframes),
        "edges": len(pg.graph.edges),
        "loop_closures": n_loops,
        "ate_rmse_raw_m": round(raw_ate, 5),
        "ate_rmse_corrected_m": round(corr_ate, 5),
        "drift_reduction": round(1.0 - corr_ate / raw_ate, 4)
        if raw_ate > 0 else 0.0,
        "log": cfg.log_file,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
