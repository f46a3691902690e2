"""Mosaic (Pallas TPU) capability + XLA gather-mode probe.

The committed, re-runnable evidence behind this framework's kernel-tier
decisions (PROFILE.md): which gather forms Mosaic can compile at all,
how the Pallas ICP reduction compares to the XLA Gram contraction on
hardware, and how XLA's gather throughput behaves vs index shape, table
size and bounds mode.

Findings on the v5e endpoint (2026-08, jax 0.9 / Mosaic):
  * ``jnp.take`` of a flat index array inside a kernel: REJECTED
    ("Only 2D gather is supported").
  * ``take_along_axis(axis=-1)`` (lane gather): compiles and runs.
  * ``take_along_axis(axis=0)`` (sublane gather): compiler crash.
  => an exact TSDF-integrate or raycast kernel (both need arbitrary 2-D
  image/volume gathers) is NOT expressible in this Mosaic generation;
  the XLA gather lowering is the only exact path. See PROFILE.md.

  * XLA's default clip-mode gather can lower ~1000x slower than
    ``promise_in_bounds`` for some index shapes — every clamped gather
    in this codebase therefore goes through volume.take_flat.

Usage:  python -m slambench_tpu.tools.mosaic_probe [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _timeit(fn, *args, reps):
    import jax
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.monotonic()
    r = fn(*args)
    jax.block_until_ready(r)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).reshape(-1)[:1]
    return (time.monotonic() - t0) / reps


def probe_mosaic_gathers(out: dict) -> None:
    """Which gather forms does Mosaic compile?"""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def try_kernel(name, kernel, table, idx):
        @jax.jit
        def run(table, idx):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(table, idx)

        try:
            r = run(table, idx)
            r.block_until_ready()
            out[name] = {"ok": True}
        except Exception as e:  # noqa: BLE001
            out[name] = {"ok": False, "err": str(e).split("\n")[0][:200]}
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)

    import jax.numpy as jnp
    tbl2d = jnp.asarray(np.random.rand(256, 128).astype(np.float32))
    flat_idx = jnp.asarray(
        np.random.randint(0, 256 * 128, (256, 128)).astype(np.int32))
    lane_idx = jnp.asarray(
        np.random.randint(0, 128, (256, 128)).astype(np.int32))
    sub_idx = jnp.asarray(
        np.random.randint(0, 256, (256, 128)).astype(np.int32))

    try_kernel("mosaic_take_flat",
               lambda t, i, o: o.__setitem__(
                   slice(None), jnp.take(t[:].reshape(-1), i[:], axis=0)),
               tbl2d, flat_idx)
    try_kernel("mosaic_take_along_lane",
               lambda t, i, o: o.__setitem__(
                   slice(None), jnp.take_along_axis(t[:], i[:], axis=1)),
               tbl2d, lane_idx)
    try_kernel("mosaic_take_along_sublane",
               lambda t, i, o: o.__setitem__(
                   slice(None), jnp.take_along_axis(t[:], i[:], axis=0)),
               tbl2d, sub_idx)


def probe_pallas_reduce(out: dict, reps: int = 20) -> None:
    """Pallas vs XLA ICP reduction, compiled on the current backend."""
    import jax
    import jax.numpy as jnp
    from slambench_tpu.ops.track import reduce_track
    from slambench_tpu.ops.pallas.reduce import reduce_track_pallas

    H, W = 240, 320
    interpret = jax.default_backend() != "tpu"
    data = {
        "result": jnp.asarray(np.random.choice(
            [1, -1, -4, -5], (H, W)).astype(np.int32)),
        "error": jnp.asarray(np.random.randn(H, W).astype(np.float32)),
        "J": jnp.asarray(np.random.randn(6, H, W).astype(np.float32)),
    }
    rp = reduce_track_pallas(data, interpret=interpret)
    rx = reduce_track(data)
    relerr = float(np.abs(np.asarray(rp) - np.asarray(rx)).max()
                   / max(1.0, float(np.abs(np.asarray(rx)).max())))
    out["pallas_reduce_relerr"] = relerr

    def chained(fn):
        @jax.jit
        def run(d):
            def body(i, acc):
                return fn({"result": d["result"],
                           "error": d["error"] + acc[0] * 1e-20,
                           "J": d["J"]})
            return jax.lax.fori_loop(0, reps, body, jnp.zeros(32))
        return run

    tp = _timeit(chained(lambda d: reduce_track_pallas(
        d, interpret=interpret)), data, reps=reps)
    tx = _timeit(chained(reduce_track), data, reps=reps)
    out["pallas_reduce_us"] = round(tp * 1e6, 1)
    out["xla_reduce_us"] = round(tx * 1e6, 1)
    print(f"reduce pallas {tp*1e6:.0f}us xla {tx*1e6:.0f}us "
          f"relerr {relerr:.2e}", file=sys.stderr, flush=True)


def probe_pallas_bilateral(out: dict, reps: int = 20) -> None:
    """Pallas stencil vs XLA shifted-view bilateral, compiled on the
    current backend (the second Pallas kernel's hardware number)."""
    import jax
    import jax.numpy as jnp
    from slambench_tpu import params
    from slambench_tpu.ops.preprocess import bilateral_filter, make_gaussian
    from slambench_tpu.ops.pallas.bilateral import bilateral_filter_pallas

    H, W = 240, 320
    interpret = jax.default_backend() != "tpu"
    depth = jnp.asarray(
        (np.random.rand(H, W) * 3 + 0.5).astype(np.float32))
    g = make_gaussian()
    gj = jnp.asarray(g)

    rp = bilateral_filter_pallas(depth, g, params.E_DELTA, params.RADIUS,
                                 interpret=interpret)
    rx = bilateral_filter(depth, gj, params.E_DELTA, params.RADIUS)
    out["pallas_bilateral_relerr"] = float(
        np.abs(np.asarray(rp) - np.asarray(rx)).max())

    def chained(fn):
        @jax.jit
        def run(d):
            def body(i, dd):
                return fn(dd) + dd * 1e-20
            return jax.lax.fori_loop(0, reps, body, d)
        return run

    tp = _timeit(chained(lambda d: bilateral_filter_pallas(
        d, g, params.E_DELTA, params.RADIUS, interpret=interpret)),
        depth, reps=reps)
    tx = _timeit(chained(lambda d: bilateral_filter(
        d, gj, params.E_DELTA, params.RADIUS)), depth, reps=reps)
    out["pallas_bilateral_us"] = round(tp * 1e6, 1)
    out["xla_bilateral_us"] = round(tx * 1e6, 1)
    print(f"bilateral pallas {tp*1e6:.0f}us xla {tx*1e6:.0f}us "
          f"relerr {out['pallas_bilateral_relerr']:.2e}",
          file=sys.stderr, flush=True)


def probe_mosaic_wide_gather(out: dict, reps: int = 4) -> None:
    """Round-4 question (VERDICT r3 next-1): can Mosaic express the
    integrate's ARBITRARY 2-D depth gather after all?

    Two candidate encodings, measured against the same-session XLA flat
    gather:

    * ``wide_lane``: lane-gather on a sublane-replicated flat table —
      ``take_along_axis(broadcast(depth.ravel(), [8, H*W]), idx[8, L],
      axis=1)``. Each sublane row IS the whole 300 KB depth image, so a
      per-lane index reaches any pixel; the 8x replication (2.4 MB)
      fits VMEM comfortably.
    * ``adv2d``: 2-D advanced indexing ``t[vi, ui]`` (the form the
      "Only 2D gather is supported" Mosaic error hints at).

    Chained in-jit reps (index depends on prior result) + value fetch,
    per CLAUDE.md timing methodology.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = 240, 320
    HW = H * W
    depth = jnp.asarray(np.random.rand(H, W).astype(np.float32))
    N = 2 * 1024 * 1024                 # integrate-population lookups
    L = 2048                            # lanes per grid step (x8 sublanes)
    n_steps = N // (8 * L)
    flat_idx = jnp.asarray(np.random.randint(
        0, HW, (n_steps * 8, L)).astype(np.int32))

    def wide_kernel(t_ref, i_ref, o_ref):
        t8 = jnp.broadcast_to(t_ref[:].reshape(1, HW), (8, HW))
        o_ref[:] = jnp.take_along_axis(t8, i_ref[:], axis=1)

    @jax.jit
    def run_wide(idx, t):
        def body(i, acc):
            j = idx + (acc[0, 0] * 0).astype(jnp.int32)
            g = pl.pallas_call(
                wide_kernel,
                out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
                grid=(n_steps,),
                in_specs=[
                    pl.BlockSpec((H, W), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, L), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8, L), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            )(t, j)
            return acc + g
        return jax.lax.fori_loop(0, reps, body,
                                 jnp.zeros(idx.shape, jnp.float32))

    def adv_kernel(t_ref, vi_ref, ui_ref, o_ref):
        o_ref[:] = t_ref[:][vi_ref[:], ui_ref[:]]

    vi = jnp.asarray(np.random.randint(0, H, (n_steps * 8, L))
                     .astype(np.int32))
    ui = jnp.asarray(np.random.randint(0, W, (n_steps * 8, L))
                     .astype(np.int32))

    @jax.jit
    def run_adv(vi, ui, t):
        def body(i, acc):
            d = (acc[0, 0] * 0).astype(jnp.int32)
            g = pl.pallas_call(
                adv_kernel,
                out_shape=jax.ShapeDtypeStruct(vi.shape, jnp.float32),
                grid=(n_steps,),
                in_specs=[
                    pl.BlockSpec((H, W), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, L), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, L), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8, L), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            )(t, vi + d, ui + d)
            return acc + g
        return jax.lax.fori_loop(0, reps, body,
                                 jnp.zeros(vi.shape, jnp.float32))

    for name, fn, args_ in (
            ("mosaic_wide_lane_gather", run_wide, (flat_idx, depth)),
            ("mosaic_adv2d_gather", run_adv, (vi, ui, depth))):
        try:
            dt = _timeit(fn, *args_, reps=reps)
            out[name] = {"ok": True,
                         "ns_per_elem": round(dt / N * 1e9, 2)}
        except Exception as e:  # noqa: BLE001
            out[name] = {"ok": False,
                         "err": str(e).split("\n")[0][:200]}
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)

    # Same-session XLA reference point (flat table + [rows, 128] idx).
    xidx = jnp.asarray(np.random.randint(
        0, HW, (N // 128, 128)).astype(np.int32))
    flat = depth.reshape(-1)

    @jax.jit
    def run_xla(idx, t):
        def body(i, acc):
            j = idx + (acc[0, 0] * 0).astype(jnp.int32)
            return acc + t.at[j].get(mode="promise_in_bounds")
        return jax.lax.fori_loop(0, reps, body,
                                 jnp.zeros(idx.shape, jnp.float32))

    dt = _timeit(run_xla, xidx, flat, reps=reps)
    out["xla_flat_gather_same_session"] = {
        "ns_per_elem": round(dt / N * 1e9, 2)}
    print(f"xla_flat_gather_same_session: "
          f"{out['xla_flat_gather_same_session']}", file=sys.stderr,
          flush=True)


def probe_gather_modes(out: dict, reps: int = 4) -> None:
    """XLA gather ns/element: clip vs promise_in_bounds, small vs
    volume-sized tables, 77k vs 16M counts."""
    import jax
    import jax.numpy as jnp

    H, W, V = 240, 320, 256
    small = jnp.asarray(np.random.rand(H * W).astype(np.float32))
    vol = jnp.asarray((np.random.rand(V ** 3) * 100).astype(np.int16))

    def bench(name, table, idx, mode):
        @jax.jit
        def run(idx, table):
            def body(i, acc):
                j = idx + (acc[0, 0] * 0).astype(jnp.int32)
                return acc + table.at[j].get(mode=mode).astype(jnp.float32)
            return jax.lax.fori_loop(0, reps, body,
                                     jnp.zeros(idx.shape, jnp.float32))
        dt = _timeit(run, idx, table, reps=reps)
        out[name] = round(dt / idx.size * 1e9, 2)
        print(f"{name}: {out[name]} ns/elem", file=sys.stderr, flush=True)

    for rows, label in ((600, "77k"), (131072, "16M")):
        idx_s = jnp.asarray(np.random.randint(
            0, H * W, (rows, 128)).astype(np.int32))
        bench(f"gather_small_clip_{label}", small, idx_s, "clip")
        bench(f"gather_small_pib_{label}", small, idx_s,
              "promise_in_bounds")
        idx_v = jnp.asarray(np.random.randint(
            0, V ** 3, (rows, 128)).astype(np.int32))
        bench(f"gather_vol_pib_{label}", vol, idx_v, "promise_in_bounds")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    ap.add_argument("--skip-slow", action="store_true",
                    help="skip the gather-mode sweep (clip mode on some "
                         "shapes takes ~minutes by itself)")
    args = ap.parse_args(argv)

    import jax
    out = {"backend": jax.default_backend()}
    if jax.default_backend() == "tpu":
        probe_mosaic_gathers(out)
        probe_mosaic_wide_gather(out)
    else:
        print("(not on TPU: Mosaic capability probe skipped)",
              file=sys.stderr)
    probe_pallas_reduce(out)
    if not args.skip_slow and jax.default_backend() == "tpu":
        probe_gather_modes(out)
    text = json.dumps(out, indent=1)
    if args.json:
        with open(args.json, "w") as f:
            f.write(text)
    print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
