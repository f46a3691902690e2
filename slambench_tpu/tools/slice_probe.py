"""Probe: slice-gathers vs scalar-gathers from the 256^3 volume table.

Hypothesis tested (and killed — PROFILE.md §10.5): if gather cost were
per-INDEX rather than per-element, ``volume.interp`` could fetch its 8
trilinear corners with 4 slice-2 indices (x-neighbours are adjacent in
the flat layout) and ``volume.grad`` its 32 lattice points with 4
slice-4 + 8 slice-2 indices, bit-identically — halving the raycast
refine+grad index count.

Measured (2026-08-21, real chip): the standalone chained cost is
dominated by a ~8 ms per-iteration floor with a 1-5 ns/index marginal
slope, and slice forms are NOT cheaper than scalar forms at equal
element count (slice2 k=20 13.1 ms vs scalar k=40 13.9; slice2 k=4 7.4
vs scalar k=8 8.0 — all within session noise). Combined with the
in-frame §10.3 attribution — the ICP's slice-6 gather runs at 10.7
ns/ELEM, the SLOWEST of the three phases despite issuing 6x fewer
indices per element — the in-frame pricing is per-element, and index
re-packing cannot win. The reformulation is not taken.

Methodology per CLAUDE.md: chained in-jit fori_loop (iteration i's
indices depend on i-1's values), scalar fetch after block_until_ready;
only within-session ratios are meaningful.

Usage: python -m slambench_tpu.tools.slice_probe
"""

from __future__ import annotations

import time

import numpy as np


def main(argv=None) -> int:
    from slambench_tpu.utils import backend as backend_select
    backend_select.select_backend()
    import jax
    import jax.numpy as jnp

    SX = 256
    NVOX = SX ** 3
    INNER = 8
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(-32766, 32766, NVOX).astype(np.int16))
    base = jnp.asarray(rng.integers(0, NVOX - 8, (600, 128)).astype(np.int32))

    def slice_gather(tbl, idx, s):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(idx.ndim,), collapsed_slice_dims=(),
            start_index_map=(0,))
        return jax.lax.gather(tbl, idx[..., None], dn, slice_sizes=(s,),
                              mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    def scalar_gather(tbl, idx):
        return tbl.at[idx].get(mode="promise_in_bounds")

    def make(kind, k, s):
        @jax.jit
        def run(b):
            def body(i, carry):
                acc, bb = carry
                idx = jnp.clip(
                    jnp.stack([bb + 3 * j for j in range(k)]), 0, NVOX - 8)
                if kind == "scalar":
                    g = scalar_gather(table, idx)          # [k,600,128]
                    v = g.astype(jnp.int32).sum(0)
                else:
                    g = slice_gather(table, idx, s)        # [k,600,128,s]
                    v = g.astype(jnp.int32).sum(axis=(0, -1))
                d = (v & 0)                                 # data dependence
                return (acc + v, bb + d)
            acc0 = jnp.zeros(b.shape, jnp.int32)
            return jax.lax.fori_loop(0, INNER, body, (acc0, b))[0]
        return run

    def timeit(fn):
        r = fn(base)
        jax.block_until_ready(r)
        best = 1e9
        for _ in range(3):
            t0 = time.monotonic()
            r = fn(base)
            jax.block_until_ready(r)
            _ = np.asarray(r).reshape(-1)[0]
            best = min(best, (time.monotonic() - t0) / INNER)
        return best * 1e3

    N = 600 * 128
    variants = [
        ("scalar k=1 (control)",       make("scalar", 1, 1), 1),
        ("scalar k=8 (interp today)",  make("scalar", 8, 1), 8),
        ("slice2 k=4 (interp alt)",    make("slice", 4, 2), 4),
        ("scalar k=32 (grad today)",   make("scalar", 32, 1), 32),
        ("slice4 k=4 (grad alt A)",    make("slice", 4, 4), 4),
        ("slice2 k=8 (grad alt B)",    make("slice", 8, 2), 8),
        ("slice2 k=20 (rescan alt)",   make("slice", 20, 2), 20),
        ("scalar k=40 (rescan today)", make("scalar", 40, 1), 40),
    ]
    print(f"{'variant':31s} {'ms/iter':>8s} {'ns/index':>9s}")
    for name, fn, k in variants:
        ms = timeit(fn)
        print(f"{name:31s} {ms:8.2f} {ms * 1e6 / (k * N):9.1f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
