"""Measured wall-clock of the sharded step across virtual-CPU mesh
sizes.

What this measures — and what it does NOT: all n virtual devices of an
``xla_force_host_platform_device_count`` mesh share the SAME host CPU,
so the curve can show no real speedup; what it DOES measure is the
OVERHEAD STRUCTURE the sharded program adds as the mesh grows — the
collectives (halo ppermute, per-iteration psum, raycast pmin/psum
composition), partitioning bookkeeping, and any accidental
serialization — on an executed program, not a model. A flat-ish curve
= the sharded program adds little fixed cost per shard; a steep one
would falsify SCALING.md's "collectives are negligible against
compute" assumption at the structural level. (SCALING.md combines this
with the HLO-verified payload model and the single-chip phase times
for the efficiency projection.)

Each mesh size runs in a SUBPROCESS (the virtual device count is fixed
at backend init).

Usage: python -m slambench_tpu.tools.mesh_wallclock [--ns 1,2,4,8]
           [--volume 64] [--frames 12] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def _child(n: int, volume: int, frames: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from slambench_tpu.io.readers import RawDepthReader
    from slambench_tpu.io.synthetic import generate_dataset
    from slambench_tpu.parallel.mesh import make_mesh
    from slambench_tpu.parallel.step import ShardedKFusion

    ds = "/tmp/slambench_mesh_wallclock"
    raw = os.path.join(ds, "synth.raw")
    need = frames + 5

    def read_all():
        if not os.path.exists(raw):
            return []
        rd = RawDepthReader(raw)
        out = []
        for _ in range(need):
            d = rd.read_next_depth_frame()
            if d is None:
                break
            out.append(np.ascontiguousarray(d))
        return out

    # Regenerate when missing OR stale-short (the path is shared across
    # runs; a previous --frames value may have written fewer frames).
    raw_depths = read_all()
    if len(raw_depths) < need:
        generate_dataset(ds, n_frames=max(frames + 6, 12),
                         image_size=(160, 120), dim=(4.8,) * 3,
                         amp=0.25, period=60)
        raw_depths = read_all()
    W, H = 160, 120
    camera = tuple(c / 4 for c in (481.2, 480.0, 320.0, 240.0))
    init = (0.34 * 4.8, 0.5 * 4.8, 0.24 * 4.8)
    kf = ShardedKFusion((W, H), (volume,) * 3, (4.8,) * 3, init,
                        (10, 5, 4), camera, mu=0.1,
                        mesh=make_mesh(n))
    state = kf.init_state()
    depths = [jnp.asarray(d) for d in raw_depths]
    # Bootstrap per-frame (gates), then the timed scan dispatch.
    for f in range(5):
        state = kf._sharded_step(
            state, depths[f], tracking_on=True, integrate_frame=True,
            force_integrate=(f <= 3), raycast_on=(f > 2))
    stacked = jnp.stack(depths[5:5 + frames])
    scratch = jax.tree.map(jnp.copy, state)
    scratch, _ = kf.compute_frames_scan(scratch, jnp.copy(stacked))
    jax.block_until_ready(scratch)
    del scratch
    jax.block_until_ready(state)
    t0 = time.monotonic()
    state, _tr = kf.compute_frames_scan(state, stacked)
    jax.block_until_ready(state)
    _ = np.asarray(state.pose[0, 0])
    dt = time.monotonic() - t0
    print(json.dumps({"n": n, "ms_per_frame": round(dt / frames * 1e3, 1),
                      "tracked": bool(state.tracked)}))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", default="1,2,4,8")
    ap.add_argument("--volume", type=int, default=64)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--json", default="")
    ap.add_argument("--child", type=int, default=0)
    args = ap.parse_args(argv)
    if args.child:
        _child(args.child, args.volume, args.frames)
        return 0

    rows = []
    for n in [int(x) for x in args.ns.split(",")]:
        out = subprocess.run(
            [sys.executable, "-m", "slambench_tpu.tools.mesh_wallclock",
             "--child", str(n), "--volume", str(args.volume),
             "--frames", str(args.frames)],
            capture_output=True, text=True)
        line = out.stdout.strip().splitlines()[-1] if out.stdout else ""
        try:
            rows.append(json.loads(line))
        except json.JSONDecodeError:
            print(f"n={n} failed:\n{out.stderr[-2000:]}", file=sys.stderr)
            return 1
        print(f"n={rows[-1]['n']}: {rows[-1]['ms_per_frame']} ms/frame "
              f"tracked={rows[-1]['tracked']}", file=sys.stderr)
    base = rows[0]["ms_per_frame"]
    for r in rows:
        r["overhead_vs_n1"] = round(r["ms_per_frame"] / base, 3)
    text = json.dumps({"volume": args.volume, "frames": args.frames,
                       "note": "shared-host virtual devices: measures "
                               "sharded-program overhead structure, "
                               "NOT speedup", "rows": rows}, indent=1)
    if args.json:
        with open(args.json, "w") as f:
            f.write(text)
    print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
