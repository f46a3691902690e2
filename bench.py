"""Headline benchmark: frames/sec/chip at 256^3 TSDF + ATE.

Mirrors the reference's canonical traj2 run (`-s 4.8 -p 0.34,0.5,0.24
-z 4 -c 2 -r 1 -k 481.2,480,320,240`, reference: README.md:194) on the
synthetic ground-truth dataset (no network egress for ICL-NUIM here).
The baseline is the reference's published traj2 computation mean of
0.043152 s/frame ≈ 23.17 FPS on its CUDA desktop (reference:
README.md:219, mirrored in BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": <fps>, "unit": "frames/s", "vs_baseline": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 1.0 / 0.043152   # reference traj2 computation mean
# Canonical endpoint gather rate (ns/elem) the normalized metric is
# anchored to: XLA's measured serial-gather rate on the integrate
# formulation on the r3 calibration day (PROFILE.md §3).
GATHER_NS_CANON = 33.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--volume", type=int, default=256)
    ap.add_argument("--ratio", type=int, default=2)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (debug; TPU is the default backend)")
    ap.add_argument("--backend", default="auto",
                    choices=("jnp", "fast", "pallas", "auto"),
                    help="kernel tier (auto = measured-best for platform)")
    ap.add_argument("--motion-model", default="none", choices=("none", "cv"),
                    help="ICP warm start (cv = damped constant-velocity; "
                         "measured a wash on the tunneled endpoint, so the "
                         "reference behaviour stays the default)")
    ap.add_argument("--scan-chunk", type=int, default=8,
                    help="steady-state frames per dispatch (lax.scan "
                         "batching; matches per-frame dispatch to FMA "
                         "ulps — tested — and avoids the tunnel's per-"
                         "dispatch round-trip; 0 = ALL steady-state "
                         "frames in one scan; 1 = per-frame. Measured "
                         "2026-08-20: chunk 8 and chunk 43-in-one-scan "
                         "tie at 5.15 f/s — per-chunk dispatch is "
                         "already amortized at 8 — so 8 stays the "
                         "default and keeps the cached compile shape)")
    ap.add_argument("--mesh", type=int, default=0,
                    help="run the SHARDED tier over an N-device mesh "
                         "(z-slab TSDF + halo ppermute + psum ICP), "
                         "scan-chunked like the single-chip path; needs "
                         "N visible devices (use JAX_PLATFORM_NAME=cpu "
                         "XLA_FLAGS=--xla_force_host_platform_device_"
                         "count=N for the virtual mesh). 0 = single-chip")
    ap.add_argument("--dataset", default="/tmp/slambench_tpu_bench")
    args = ap.parse_args()

    from slambench_tpu.utils import backend as backend_select
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        backend_select.select_backend()
    # Persistent jit cache: steady-state bench runs skip the minutes-long
    # first compile on the shared endpoint (VERDICT r1 weak #4).
    backend_select.enable_jit_cache()
    import jax
    import jax.numpy as jnp

    from slambench_tpu.io.readers import RawDepthReader
    from slambench_tpu.io.synthetic import generate_dataset
    from slambench_tpu.pipeline import KFusion

    # Dataset: 640x480 synthetic living room, traj2-like camera + volume.
    raw = os.path.join(args.dataset, "synth.raw")
    vfile = os.path.join(args.dataset, "synth.scene_version")
    n_frames = max(args.frames, 8)
    regen = not os.path.exists(raw)
    if not regen:
        from slambench_tpu.io.raw import raw_frame_count
        from slambench_tpu.io.synthetic import SCENE_VERSION
        try:
            regen = raw_frame_count(raw) < n_frames
            regen = regen or int(open(vfile).read()) != SCENE_VERSION
        except (OSError, ValueError):
            # Truncated/corrupt dataset (e.g. a generation interrupted
            # mid-write) — regenerate from scratch.
            regen = True
    if regen:
        man = generate_dataset(args.dataset, n_frames=n_frames,
                               image_size=(640, 480), dim=(4.8, 4.8, 4.8),
                               amp=0.25, period=60)
        np.save(os.path.join(args.dataset, "poses.npy"), man["poses"])
    poses = np.load(os.path.join(args.dataset, "poses.npy"))

    W, H = 640 // args.ratio, 480 // args.ratio
    camera = tuple(c / args.ratio for c in (481.2, 480.0, 320.0, 240.0))
    init = (0.34 * 4.8, 0.5 * 4.8, 0.24 * 4.8)
    kf_args = ((W, H), (args.volume,) * 3, (4.8, 4.8, 4.8), init,
               (10, 5, 4), camera)
    kf_kw = dict(mu=0.1, backend=args.backend,
                 motion_model=args.motion_model)
    if args.mesh:
        from slambench_tpu.parallel.mesh import make_mesh
        from slambench_tpu.parallel.step import ShardedKFusion
        kf = ShardedKFusion(*kf_args, **kf_kw, mesh=make_mesh(args.mesh))

        def step(s, d, g):
            return kf._sharded_step(s, d, **g)
    else:
        kf = KFusion(*kf_args, **kf_kw)

        def step(s, d, g):
            return kf.compute_frame(s, d, **g)
    state = kf.init_state()
    rd = RawDepthReader(raw)

    # Preload all frames to the DEVICE (acquisition is measured
    # separately by the frontend; this benchmark reports compute).
    frames = []
    for i in range(n_frames):
        d = rd.read_next_depth_frame()
        if d is None:
            break
        frames.append(jnp.asarray(np.ascontiguousarray(d)))
    n_frames = len(frames)
    jax.block_until_ready(frames[-1])

    def gates(frame):
        return dict(tracking_on=True,
                    integrate_frame=True,     # -r 1 canonical run
                    force_integrate=(frame <= 3),
                    raycast_on=(frame > 2))

    # Warmup: run the first 5 frames (compiles all gate variants), and
    # compile (without executing) the scan-batched steady-state step.
    # chunk 0 = one scan over ALL steady-state frames: a single dispatch
    # for the whole timed region (the scan length is static in the HLO
    # but the body is compiled once, so the longer scan costs no extra
    # compile over a short one).
    chunk = args.scan_chunk if args.scan_chunk > 0 else max(n_frames - 5, 1)
    t_compile = time.monotonic()
    for frame in range(min(5, n_frames)):
        state = step(state, frames[frame], gates(frame))
    # Pre-stack the steady-state chunks OUTSIDE the timed region (the
    # stack is a device-side copy + a host dispatch; in the loop it
    # would serialize a tunnel round-trip per chunk).
    chunks = []
    frame = 5
    while chunk > 1 and n_frames - frame >= chunk:
        chunks.append(jnp.stack(frames[frame:frame + chunk]))
        frame += chunk
    n_tail_start = frame
    if chunks:
        # Execute the scan once on a throwaway state copy: .lower()
        # .compile() would not warm the jit dispatch cache, leaving the
        # first timed scan call to (re)load the executable.
        scratch = jax.tree.map(jnp.copy, state)
        scratch, _ = kf.compute_frames_scan(scratch, jnp.copy(chunks[0]))
        jax.block_until_ready(scratch)
        del scratch
    jax.block_until_ready(state)
    _ = np.asarray(state.pose[0, 0])   # value-fetch fence (CLAUDE.md)
    t_compile = time.monotonic() - t_compile

    # Timed steady-state run. Per-frame pose READBACK is deferred: the
    # loop keeps device references (64 B each — the donated state's tiny
    # pose leaf is copied, the 50 MB volume is not) so frames dispatch
    # back-to-back without a host->device round-trip between them; the
    # trajectory is fetched once, after the timed region. The reference's
    # per-frame getPosition readback is a logging choice, not pipeline
    # semantics (reference: benchmark.cpp:125-158).
    t0 = time.monotonic()
    traj = []
    for ch in chunks:
        # Full chunks only (a ragged tail chunk would compile a
        # second scan length inside the timed region).
        state, tr = kf.compute_frames_scan(state, ch)
        traj.append(tr["pos"])
    for frame in range(n_tail_start, n_frames):
        state = step(state, frames[frame], gates(frame))
        traj.append(state.pose[None, :3, 3])
    jax.block_until_ready(state)
    _ = np.asarray(state.pose[0, 0])   # value-fetch fence
    dt = time.monotonic() - t0
    fps = (n_frames - 5) / dt

    traj = np.concatenate([np.asarray(t) for t in traj]) \
        if traj else np.zeros((0, 3))
    errs = np.linalg.norm(traj - poses[5:n_frames, :3, 3], axis=1)
    ate_mean = float(np.mean(errs)) if len(errs) else float("nan")

    # Device calibration in the same session: effective elementwise HBM
    # bandwidth and bf16 matmul throughput. The TPU endpoint here is
    # shared/throttled and varies run to run; these let FPS be
    # normalized against what the chip actually delivered.
    x = jnp.zeros((64, 1024, 1024), jnp.float32)  # 268 MB

    @jax.jit
    def bw_probe(x):
        return jax.lax.fori_loop(0, 4, lambda i, a: a * 1.0000001 + 1e-9, x)

    bw_probe(x).block_until_ready()
    t0 = time.monotonic()
    r = bw_probe(x)
    r.block_until_ready()
    _ = np.asarray(r[0, 0, 0])
    dt = time.monotonic() - t0
    gbps = 4 * 2 * x.nbytes / dt / 1e9

    # Gather-rate calibration: the pipeline is GATHER-bound, not
    # bandwidth-bound (PROFILE.md §2-§3) — every phase is priced by
    # XLA's serial gather rate on this endpoint. Measure it in-session
    # on the integrate-population formulation (2M lookups into a
    # 240x320 f32 image, flat table + 3-D index array — the exact form
    # ops/integrate.py uses), chained so each rep's indices depend on
    # the previous result (defeats endpoint caching, CLAUDE.md).
    Hc, Wc = 240, 320
    rngc = np.random.default_rng(0)
    tbl = jnp.asarray(rngc.random((Hc, Wc)).astype(np.float32)).reshape(-1)
    kc = 128
    gidx = jnp.asarray(
        rngc.integers(0, Hc * Wc, kc ** 3).astype(np.int32)
    ).reshape(kc, kc, kc)

    @jax.jit
    def gather_probe(idx, tbl):
        def body(i, carry):
            acc, ix = carry
            g = tbl.at[ix].get(mode="promise_in_bounds")
            d = (g.reshape(-1)[0] * 0).astype(jnp.int32)
            return (acc + g, ix + d)
        return jax.lax.fori_loop(
            0, 4, body, (jnp.zeros(idx.shape, jnp.float32), idx))[0]

    gather_probe(gidx, tbl).block_until_ready()
    t0 = time.monotonic()
    r = gather_probe(gidx, tbl)
    r.block_until_ready()
    _ = np.asarray(r[0, 0, 0])
    dt = time.monotonic() - t0
    gather_ns = dt / (4 * kc ** 3) * 1e9

    a = jnp.zeros((4096, 4096), jnp.bfloat16)

    @jax.jit
    def mm_probe(a):
        return jax.lax.fori_loop(
            0, 4, lambda i, m: jnp.dot(
                m, m, preferred_element_type=jnp.bfloat16) * 1e-3, a)

    mm_probe(a).block_until_ready()
    t0 = time.monotonic()
    r = mm_probe(a)
    r.block_until_ready()
    _ = np.asarray(r[0, 0])
    dt = time.monotonic() - t0
    tflops = 4 * 2 * 4096 ** 3 / dt / 1e12

    result = {
        "metric": ("frames/sec/chip at %d^3 TSDF on synthetic traj2-like "
                   "(640x480, csr %d); ATE (m) vs exact ground truth"
                   % (args.volume, args.ratio)),
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "ate_mean_m": round(ate_mean, 5),
        "frames": n_frames - 5,
        "compile_s": round(t_compile, 1),
        "backend": jax.default_backend(),
        "backend_tier": kf.backend,
        "motion_model": kf.motion_model,
        "scan_chunk": chunk,
        "mesh": args.mesh,
        "integrate_blocks": "x".join(map(str, kf.integrate_block_grid)),
        "device_eff_gbps": round(gbps, 1),
        "device_eff_bf16_tflops": round(tflops, 2),
        "device_eff_gather_ns": round(gather_ns, 1),
        # Session-drift correction, NOT a hardware projection: the
        # pipeline is gather-bound (PROFILE.md §2-§3), so fps is scaled
        # by this session's measured gather rate relative to the
        # canonical calibration day's 33 ns/elem (PROFILE.md §3,
        # profiles/r3_gather_probe.json). Makes rounds comparable when
        # the shared endpoint's delivered rate drifts; no claim is made
        # about real-v5e gather rates (unmeasured from here).
        # LINEARITY CAVEAT (PROFILE.md §10.4): the scaling treats frame
        # time as linear in the PROBE's gather rate, but the round-5
        # audit found in-frame cost STABLE across sessions whose probe
        # rates varied 33->91.5 ns/elem — the probe largely measures
        # tunnel dispatch congestion, not the in-frame rate. So this
        # number OVERSTATES the correction on bad-probe days; the raw
        # `value`/`vs_baseline` is the honest stable headline, and this
        # field is kept only for cross-round comparability.
        "vs_baseline_normalized": round(
            fps * (gather_ns / GATHER_NS_CANON) / BASELINE_FPS, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
