"""Kernel-parameter tuning harness.

The TPU analogue of the reference's OpenCL work-group-size tuning route
(reference: kfusion/thirdparty/OCLWrapper.cpp:77-132 — the LD_PRELOAD
wrapper re-launches a chosen KERNEL with ls0..2/gs0..2 env overrides and
reports per-launch nanoseconds). Here the tunables are the Pallas/XLA
structural parameters:

* ``tile_rows`` — rows per grid step of the fused ICP reduction
  (ops/pallas/reduce.py; env ``SLAMBENCH_TILE_ROWS``),
* ``mip_block`` — min-mip cell edge of the accelerated raycast
  (ops/raycast_fast.py; env ``SLAMBENCH_MIP_BLOCK``),
* ``blocks`` — frustum-culled integrate block grid
  (ops/integrate.py; env ``SLAMBENCH_INTEGRATE_BLOCKS``),

and the output is the same ``name duration_ns`` stream check_kernels
consumes.

Timing methodology (this repo's shared-TPU reality): repeated identical
calls hit caches, so every measured iteration is *chained* — each input
depends on the previous output — and a scalar is fetched at the end.

CLI:
  python -m slambench_tpu.tools.autotune reduce  [--values 256,512,1024,2048]
  python -m slambench_tpu.tools.autotune mip     [--values 4,8,16,32]
  python -m slambench_tpu.tools.autotune --iters 8 --pixels 76800 ...
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _fetch(x) -> float:
    """Fence + value fetch (block_until_ready alone is not a reliable
    fence on the tunneled endpoint)."""
    import jax
    jax.block_until_ready(x)
    return float(np.asarray(x).ravel()[0])


def sweep_reduce(values, pixels: int, iters: int, out=sys.stdout):
    """Time the fused normal-equations reduction per tile height."""
    import jax
    import jax.numpy as jnp
    from slambench_tpu.ops.pallas.reduce import reduce_track_pallas

    interpret = jax.default_backend() == "cpu"   # Mosaic needs a TPU
    rng = np.random.default_rng(0)
    H = max(1, pixels // 320)
    data = {
        "result": jnp.asarray(
            rng.choice([1, -1, -2, -4, -5], size=(H, 320)).astype(np.int32)),
        "error": jnp.asarray(rng.standard_normal((H, 320), np.float32)),
        "J": jnp.asarray(rng.standard_normal((6, H, 320), np.float32)),
    }
    rows = []
    for tile in values:
        # Warm up / compile.
        _fetch(reduce_track_pallas(data, tile_rows=int(tile),
                                   interpret=interpret))
        d = dict(data)
        t0 = time.monotonic()
        for _ in range(iters):
            outv = reduce_track_pallas(d, tile_rows=int(tile),
                                       interpret=interpret)
            # Chain: fold the scalar result back into the next input.
            d = dict(d, error=d["error"] + outv[0] * 1e-30)
        last = _fetch(outv)
        ns = (time.monotonic() - t0) / iters * 1e9
        print(f"reduce[tile_rows={tile}] {ns:.0f} {pixels}", file=out)
        rows.append((int(tile), ns, last))
    return rows


def sweep_mip(values, resolution: int, iters: int, out=sys.stdout):
    """Time min-mip build + accelerated raycast per mip cell edge."""
    import jax
    import jax.numpy as jnp
    from slambench_tpu import params
    from slambench_tpu.ops.raycast_fast import make_min_mip, raycast_fast
    from slambench_tpu.volume import pack_tsdf

    n = resolution
    dim = (4.8, 4.8, 4.8)
    # Synthetic scene: a solid wall beyond z=2.4 m. TSDF is positive in
    # free space (in front of the surface, where the camera at z=0.2
    # sits) and negative inside it, so rays march through free space and
    # cross +->- at the slab — the sign convention the march requires.
    z = (np.arange(n, dtype=np.float32) + 0.5) * (dim[2] / n)
    sdf = np.clip((2.4 - z) / 0.1, -1.0, 1.0).astype(np.float32)
    tsdf = jnp.asarray(np.broadcast_to(
        sdf[:, None, None], (n, n, n)).copy())
    tsdf = pack_tsdf(tsdf)
    # view = pose @ inv(K): camera inside the volume looking down +z.
    K = np.array([[240.6, 0, 160, 0], [0, 240.0, 120, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (2.4, 2.4, 0.2)
    view = jnp.asarray(pose @ np.linalg.inv(K))

    step = min(dim) / n
    rows = []
    for m in values:
        m = int(m)
        mip = make_min_mip(tsdf, m=m)

        @jax.jit
        def rc(t, mp, v, m=m):
            return raycast_fast(t, mp, dim, v, (240, 320),
                                params.NEAR_PLANE, params.FAR_PLANE,
                                step, 0.075, m=m)[1]

        th = rc(tsdf, mip, view)
        hit_frac = float(np.mean(np.asarray(th) > 0))
        if hit_frac < 0.5:
            raise RuntimeError(
                f"mip sweep scene degenerate: only {hit_frac:.0%} of rays "
                "hit the wall — the timing would measure an empty march")
        v = view
        t0 = time.monotonic()
        for _ in range(iters):
            t_hit = rc(tsdf, mip, v)
            # Chain: nudge the view by a value derived from the result.
            v = v.at[0, 3].add(jnp.max(t_hit) * 1e-30)
        _fetch(t_hit)
        ns = (time.monotonic() - t0) / iters * 1e9
        print(f"raycast[mip_block={m}] {ns:.0f} {240 * 320}", file=out)
        rows.append((m, ns, hit_frac))
    return rows


def _mip_scene(n: int, dim):
    """Shared synthetic scene for the raycast sweeps: an undulating wall
    around z=2.4 m (varied bracket geometry so refinement accuracy is
    exercised), camera at z=0.2 looking down +z."""
    import jax.numpy as jnp
    from slambench_tpu.volume import pack_tsdf

    c = (np.arange(n, dtype=np.float32) + 0.5) * (dim[2] / n)
    Z, Y, X = np.meshgrid(c, c, c, indexing="ij")
    wall = 2.4 + 0.3 * np.sin(X * 2.1) * np.cos(Y * 1.7)
    sdf = np.clip((wall - Z) / 0.1, -1.0, 1.0).astype(np.float32)
    tsdf = pack_tsdf(jnp.asarray(sdf))
    K = np.array([[240.6, 0, 160, 0], [0, 240.0, 120, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (2.4, 2.4, 0.2)
    view = jnp.asarray(pose @ np.linalg.inv(K))
    return tsdf, view


def sweep_refine(values, resolution: int, iters: int, out=sys.stdout):
    """Time + accuracy per (nscan, fp_iters) refinement budget.

    Accuracy is the max |t_hit - t_ref| in voxels against a high-budget
    (nscan=10, fp=5) reference on the same scene — committed evidence
    for the default SLAMBENCH_RAYCAST_NSCAN/REFINE choice."""
    import jax
    import jax.numpy as jnp
    from slambench_tpu import params
    from slambench_tpu.ops.raycast_fast import make_min_mip, raycast_fast

    n = resolution
    dim = (4.8, 4.8, 4.8)
    tsdf, view = _mip_scene(n, dim)
    mip = make_min_mip(tsdf)
    step = min(dim) / n

    def make_rc(nscan, fp):
        @jax.jit
        def rc(t, mp, v):
            return raycast_fast(t, mp, dim, v, (240, 320),
                                params.NEAR_PLANE, params.FAR_PLANE,
                                step, 0.075, nscan=nscan, fp_iters=fp)[1]
        return rc

    t_ref = np.asarray(make_rc(10, 5)(tsdf, mip, view))
    hit_ref = t_ref > 0
    rows = []
    for spec in values:
        nscan, fp = (int(x) for x in str(spec).split(":"))
        rc = make_rc(nscan, fp)
        th = rc(tsdf, mip, view)
        t_np = np.asarray(th)
        m = hit_ref & (t_np > 0)
        err_vox = float(np.abs(t_np[m] - t_ref[m]).max() / step) if \
            m.any() else float("inf")
        v = view
        t0 = time.monotonic()
        for _ in range(iters):
            th = rc(tsdf, mip, v)
            v = v.at[0, 3].add(jnp.max(th) * 1e-30)
        _fetch(th)
        ns = (time.monotonic() - t0) / iters * 1e9
        print(f"raycast[nscan={nscan},fp={fp}] {ns:.0f} {240 * 320} "
              f"max_err_vox={err_vox:.4f}", file=out)
        rows.append(((nscan, fp), ns, err_vox))
    return rows


def sweep_blocks(values, resolution: int, iters: int, out=sys.stdout):
    """Time the frustum-culled integrate per block grid (NZxNY[xNX],
    env ``SLAMBENCH_INTEGRATE_BLOCKS``) at the canonical bench pose;
    uses the real bench-scene depth when the bench dataset exists."""
    import jax
    import jax.numpy as jnp
    from slambench_tpu import geometry as G
    from slambench_tpu import params
    from slambench_tpu.ops.integrate import (
        block_visibility, integrate, integrate_blocks)

    n = resolution
    dim = (4.8, 4.8, 4.8)
    rng = np.random.default_rng(0)
    try:
        from slambench_tpu.io.readers import RawDepthReader
        from slambench_tpu.ops.preprocess import mm2meters
        rd = RawDepthReader("/tmp/slambench_tpu_bench/synth.raw")
        depth = mm2meters(jnp.asarray(rd.read_next_depth_frame()), 2)
    except Exception:
        depth = jnp.asarray(
            (rng.random((240, 320)) * 3 + 0.5).astype(np.float32))
    K = jnp.asarray(np.array(
        [[240.6, 0, 160, 0], [0, 240.0, 120, 0],
         [0, 0, 1, 0], [0, 0, 0, 1]], np.float32))
    pose = G.translation_pose([0.34 * dim[0], 0.5 * dim[1], 0.24 * dim[2]])
    inv = G.rigid_inverse(pose)
    tsdf = jnp.asarray(np.full((n, n, n), 32766, np.int16))
    w0 = jnp.asarray(np.zeros((n, n, n), np.int8))

    rows = []
    for spec in values:
        parts = [int(x) for x in str(spec).lower().split("x")]
        nz, ny, nx = (parts + [1, 1])[:3]
        if n % nz or n % ny or n % nx:
            continue
        if (nz, ny, nx) == (1, 1, 1):
            fn = jax.jit(lambda t, w, d: integrate(
                t, w, d, inv, K, 0.1, params.MAX_WEIGHT, dim))
            vis_n, vis_d = 1, 1
        else:
            fn = jax.jit(lambda t, w, d, _z=nz, _y=ny, _x=nx:
                         integrate_blocks(t, w, d, inv, K, 0.1,
                                          params.MAX_WEIGHT, dim,
                                          n_z=_z, n_y=_y, n_x=_x))
            vis = np.asarray(block_visibility(nz, ny, dim, inv, K,
                                              depth, 0.1, n_x=nx))
            vis_n, vis_d = int(vis.sum()), vis.size
        t, w = fn(tsdf, w0, depth)
        jax.block_until_ready(t)
        t0 = time.monotonic()
        for _ in range(iters):
            t, w = fn(t, w, depth)     # chained: w saturates, t stable
        _fetch(t)
        ns = (time.monotonic() - t0) / iters * 1e9
        print(f"integrate[blocks={nz}x{ny}x{nx}] {ns:.0f} {n ** 3} "
              f"visible={vis_n}/{vis_d}", file=out)
        rows.append(((nz, ny, nx), ns))
    return rows


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("kernel", choices=["reduce", "mip", "refine", "blocks"])
    ap.add_argument("--values", default=None,
                    help="comma-separated parameter values to sweep")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--pixels", type=int, default=76800)
    ap.add_argument("--resolution", type=int, default=256)
    args = ap.parse_args(argv)

    if args.kernel == "reduce":
        values = [int(v) for v in
                  (args.values or "256,512,1024,2048").split(",")]
        rows = sweep_reduce(values, args.pixels, args.iters)
    elif args.kernel == "refine":
        values = (args.values or "8:4,6:3,4:3,4:2,3:2,2:2").split(",")
        rows = sweep_refine(values, args.resolution, args.iters)
    elif args.kernel == "blocks":
        values = (args.values
                  or "1x1x1,8x8x1,8x8x2,8x8x8,16x16x2,16x16x8").split(",")
        rows = sweep_blocks(values, args.resolution, args.iters)
    else:
        values = [int(v) for v in (args.values or "4,8,16,32").split(",")]
        rows = sweep_mip(values, args.resolution, args.iters)

    best = min(rows, key=lambda r: r[1])
    print(f"# best: {args.kernel}={best[0]} ({best[1]:.0f} ns/call)",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
