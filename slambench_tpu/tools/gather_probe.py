"""Gather-formulation shootout on the current backend.

PROFILE.md's r1 finding is that every pipeline phase is gather-bound
(~16 ns/element inside big jits on the tunneled v5e). This probe
measures the alternatives XLA actually offers for the three gather
populations in the pipeline, so the formulation choices in
volume.take_flat / ops.integrate / ops.raycast_fast are evidence, not
folklore:

* the integrate depth lookup: 16.7M (at 256^3) lookups into a 77k-entry
  image — flat-1D vs 2D-operand gather, f32 vs uint16 table, index
  array shape;
* the raycast volume lookups: 77k lookups into the 33 MB volume;
* the tiny-table lookup (2nd-level mip, 512 entries): gather vs one-hot
  MXU matmul vs iota-mask sum.

Usage: python -m slambench_tpu.tools.gather_probe [--json out.json]
       [--n 2097152]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _timeit(fn, *args, inner: int):
    import jax
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.monotonic()
    r = fn(*args)
    jax.block_until_ready(r)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).reshape(-1)[:1]
    return (time.monotonic() - t0) / inner


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    ap.add_argument("--n", type=int, default=2 * 1024 * 1024,
                    help="lookups per variant (scaled-down integrate)")
    ap.add_argument("--inner", type=int, default=4)
    args = ap.parse_args(argv)

    from slambench_tpu.utils import backend as backend_select
    backend_select.select_backend()
    backend_select.enable_jit_cache()
    import jax
    import jax.numpy as jnp

    H, W = 240, 320
    N = args.n
    inner = args.inner
    out = {"backend": jax.default_backend(), "n": N}

    rng = np.random.default_rng(0)
    depth_f32 = jnp.asarray(rng.random((H, W)).astype(np.float32))
    depth_u16 = jnp.asarray((rng.random((H, W)) * 5000).astype(np.uint16))
    vi = jnp.asarray(rng.integers(0, H, N).astype(np.int32))
    ui = jnp.asarray(rng.integers(0, W, N).astype(np.int32))

    def chain(fn):
        """inner chained reps: each iteration's indices depend on the
        previous result (defeats endpoint caching)."""
        @jax.jit
        def run(vi, ui, tbl):
            def body(i, carry):
                acc, vii, uii = carry
                g = fn(vii, uii, tbl)
                d = (g.reshape(-1)[0] * 0).astype(jnp.int32)
                return (acc + g.astype(jnp.float32), vii + d, uii + d)
            acc0 = jnp.zeros(vi.shape, jnp.float32)
            return jax.lax.fori_loop(0, inner, body, (acc0, vi, ui))[0]
        return run

    def bench(name, fn, vi_, ui_, tbl):
        # Per-iteration element count is the INDEX array's size — the
        # volume/tiny-table variants gather 76.8k elements, not args.n.
        count = int(np.prod(vi_.shape))
        dt = _timeit(chain(fn), vi_, ui_, tbl, inner=inner)
        out[name] = {"ms": round(dt * 1e3, 3), "count": count,
                     "ns_per_elem": round(dt / count * 1e9, 3)}
        print(f"{name:32s} {dt*1e3:9.3f} ms  {dt/count*1e9:7.2f} ns/elem",
              file=sys.stderr, flush=True)

    # --- integrate-style small-table gathers --------------------------- #
    bench("flat1d_f32_pib",
          lambda v, u, t: t.reshape(-1).at[v * W + u].get(
              mode="promise_in_bounds"), vi, ui, depth_f32)
    bench("op2d_f32_pib",
          lambda v, u, t: t.at[v, u].get(mode="promise_in_bounds"),
          vi, ui, depth_f32)
    bench("flat1d_u16_pib",
          lambda v, u, t: t.reshape(-1).at[v * W + u].get(
              mode="promise_in_bounds").astype(jnp.float32) * 0.001,
          vi, ui, depth_u16)
    # Index-array shape: flat [N] vs [N/128, 128] vs 3D.
    vi2 = vi.reshape(-1, 128)
    ui2 = ui.reshape(-1, 128)
    bench("flat1d_f32_idx2d",
          lambda v, u, t: t.reshape(-1).at[v * W + u].get(
              mode="promise_in_bounds"), vi2, ui2, depth_f32)
    k = round(N ** (1 / 3))
    if k ** 3 <= N:
        vi3 = vi[: k ** 3].reshape(k, k, k)
        ui3 = ui[: k ** 3].reshape(k, k, k)
        bench("flat1d_f32_idx3d",
              lambda v, u, t: t.reshape(-1).at[v * W + u].get(
                  mode="promise_in_bounds"), vi3, ui3, depth_f32)

    # --- raycast-style volume gathers (33 MB table) --------------------- #
    V = 256
    vol = jnp.asarray((rng.random(V ** 3) * 1000).astype(np.int16))
    npix = 76800
    idxs = jnp.asarray(rng.integers(0, V ** 3, npix).astype(np.int32)
                       ).reshape(240, 320)
    bench("vol_s16_77k",
          lambda v, u, t: t.at[v].get(mode="promise_in_bounds"),
          idxs, idxs, vol)

    # --- tiny-table (2nd-level mip, 512 entries) ------------------------ #
    mip2 = jnp.asarray((rng.random(512) * 1000 - 500).astype(np.float32))
    sidx = jnp.asarray(rng.integers(0, 512, npix).astype(np.int32)
                       ).reshape(240, 320)
    bench("tiny512_gather",
          lambda v, u, t: t.at[v].get(mode="promise_in_bounds"),
          sidx, sidx, mip2)

    def onehot_mm(v, u, t):
        oh = (v.reshape(-1, 1) ==
              jax.lax.broadcasted_iota(jnp.int32, (1, 512), 1)
              ).astype(jnp.bfloat16)
        return jnp.dot(oh, t.astype(jnp.bfloat16)[:, None],
                       preferred_element_type=jnp.float32
                       ).reshape(v.shape)

    bench("tiny512_onehot_mxu", onehot_mm, sidx, sidx, mip2)

    def iota_sum(v, u, t):
        oh = (v.reshape(-1, 1) ==
              jax.lax.broadcasted_iota(jnp.int32, (1, 512), 1))
        return jnp.sum(jnp.where(oh, t[None, :], 0.0),
                       axis=1).reshape(v.shape)

    bench("tiny512_iota_sum", iota_sum, sidx, sidx, mip2)

    text = json.dumps(out, indent=1)
    if args.json:
        with open(args.json, "w") as f:
            f.write(text)
    print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
