"""Projected multi-chip scaling curve from measured single-chip phase
times + the analytic collective model.

BASELINE.md's north star asks for >= 80% frames/s scaling efficiency on
a multi-host v5e slice; this environment has ONE tunneled chip, so the
committed scaling account (SCALING.md) is: measured single-chip phase
times (tools/profile_frame.py), the per-frame collective payload
(parallel/comm.py — verified against the emitted HLO by
tests/test_scaling.py), and this projection combining them.

Model per n-chip config (1-D z mesh, parallel/step.py):
  tracking    : compute/n (row-sharded) + iters * psum(32 floats) latency
  integrate+mip: compute/n (slab-local, no communication)
  raycast     : march+refine compute/n (slab t-intervals partition the
                ray extent; refine/grad on the owning slab only)
                + halo ppermute + pmin/psum image composition
  preprocess  : replicated (not sharded; ~1% of frame)
Collective time = bytes / ici_gbps + hops * ici_lat_us, ring hops =
n - 1 for ppermute (one neighbour step), 2*log2(n) for all-reduce.

Usage: python -m slambench_tpu.tools.scaling_report --profile p.json
       [--image 320x240] [--volume 256] [--ici-gbps 45] [--markdown]
"""

from __future__ import annotations

import argparse
import json
import math
import sys


def _coll_time_us(nbytes: float, n: int, kind: str,
                  ici_gbps: float, ici_lat_us: float) -> float:
    if n <= 1:
        return 0.0
    if kind == "ppermute":            # one neighbour step
        hops = 1
        wire = nbytes
    elif kind == "allreduce":         # bidirectional ring: 2(n-1)/n
        hops = 2 * (n - 1)
        wire = 2 * nbytes * (n - 1) / n
    else:                             # all-gather
        hops = n - 1
        wire = nbytes * (n - 1) / n
    return wire / ici_gbps / 1e3 + hops * ici_lat_us


def project_scaling(profile: dict, image=(320, 240), volume=256,
                    halo=10, ici_gbps=45.0, ici_lat_us=1.0,
                    icp_iters=19, ns=(1, 2, 4, 8, 16),
                    fused_ms: float = 0.0):
    """Rows of {n, t_frame_ms, fps, efficiency, comm_ms} from a
    profile_frame JSON dict (ms per op on one chip)."""
    W, H = image
    npix = W * H

    def ms(key, default=0.0):
        v = profile.get(key)
        return float(v["ms"]) if isinstance(v, dict) else default

    t_track = ms("tracking_phase")
    # Integrate: prefer the pipeline's actual default path (the
    # frustum-culled block grid, keyed integrate_blocks_<grid>_plus_mip),
    # then the monolithic fused/mip fallbacks.
    blk_keys = [k for k in profile
                if k.startswith("integrate_blocks_")
                and k.endswith("_plus_mip")]
    t_int = (ms(blk_keys[0]) if blk_keys else 0.0) \
        or ms("integrate_plus_mip_fused") \
        or (ms("integrate") + ms("make_min_mip"))
    # Raycast: the cold march is the pipeline default (warm start
    # measured slower, PROFILE.md §6).
    t_ray = ms("raycast_cold") or ms("raycast_warm")
    # Preprocessing: the bilateral filter is row-sharded
    # (parallel/step.py:_sharded_preprocessing, reassembled by one
    # image all_gather); the mm2meters strided cast stays replicated.
    t_bilateral = ms("bilateral_filter")
    t_mm = ms("mm2meters")

    # --fused-frame-ms: anchor the projection to the MEASURED scan-
    # batched fused per-frame cost instead of the sum of standalone
    # per-op dispatches. Standalone measurements each carry the tunnel's
    # per-dispatch overhead (PROFILE.md §8 measured the in-frame
    # integrate 2.8x cheaper than its standalone number); the production
    # sharded path is dispatch-batched (compute_frames_scan over the
    # shard_map step), so the fused frame is the honest per-chip cost.
    # Phase RATIOS come from the standalone profile; the total is
    # rescaled to the fused measurement.
    if fused_ms:
        s = fused_ms / (t_mm + t_bilateral + t_track + t_int + t_ray)
        t_mm *= s
        t_bilateral *= s
        t_track *= s
        t_int *= s
        t_ray *= s

    rows = []
    t1 = None
    for n in ns:
        # Collectives (bytes per device per frame).
        halo_b = 2 * halo * volume * volume * 2 if n > 1 else 0
        c_halo = _coll_time_us(halo_b, n, "ppermute", ici_gbps, ici_lat_us)
        c_ray = (_coll_time_us(npix * 4, n, "allreduce", ici_gbps,
                               ici_lat_us)
                 + _coll_time_us(3 * npix * 4, n, "allreduce", ici_gbps,
                                 ici_lat_us))
        c_icp = icp_iters * _coll_time_us(32 * 4, n, "allreduce",
                                          ici_gbps, ici_lat_us)
        # track-result diagnostic + preprocess band reassembly.
        c_gather = 2 * _coll_time_us(npix * 4, n, "allgather", ici_gbps,
                                     ici_lat_us)
        comm_ms = (c_halo + c_ray + c_icp + c_gather) / 1e3

        t = (t_mm + t_bilateral / n
             + t_track / n + t_int / n + t_ray / n) + comm_ms
        if t1 is None:
            t1 = t
        rows.append({
            "n": n,
            "t_frame_ms": round(t, 3),
            "fps": round(1e3 / t, 2),
            "comm_ms": round(comm_ms, 3),
            "comm_bytes": 0 if n == 1 else int(
                halo_b + 4 * npix * 4 + icp_iters * 128 + 2 * npix * 4),
            "efficiency": round(t1 / t / n, 4),
        })
    return rows


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", required=True,
                    help="profile_frame JSON (measured single-chip)")
    ap.add_argument("--image", default="320x240")
    ap.add_argument("--volume", type=int, default=256)
    ap.add_argument("--halo", type=int, default=10)
    ap.add_argument("--ici-gbps", type=float, default=45.0,
                    help="per-link one-way ICI bandwidth (v5e: 45 GB/s)")
    ap.add_argument("--ici-lat-us", type=float, default=1.0)
    ap.add_argument("--icp-iters", type=int, default=19)
    ap.add_argument("--fused-frame-ms", type=float, default=0.0,
                    help="measured scan-batched fused per-frame ms; "
                         "rescales the standalone per-op profile to "
                         "this total (dispatch-batched anchor)")
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args(argv)

    with open(args.profile) as f:
        profile = json.load(f)
    W, H = (int(x) for x in args.image.split("x"))
    rows = project_scaling(profile, image=(W, H), volume=args.volume,
                           halo=args.halo, ici_gbps=args.ici_gbps,
                           ici_lat_us=args.ici_lat_us,
                           icp_iters=args.icp_iters,
                           fused_ms=args.fused_frame_ms)
    if args.markdown:
        print("| chips | frame ms | fps | comm ms | comm MB/frame |"
              " efficiency |")
        print("|---|---|---|---|---|---|")
        for r in rows:
            print(f"| {r['n']} | {r['t_frame_ms']} | {r['fps']} |"
                  f" {r['comm_ms']} | {r['comm_bytes']/1e6:.2f} |"
                  f" {r['efficiency']*100:.1f}% |")
    else:
        print(json.dumps(rows, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
