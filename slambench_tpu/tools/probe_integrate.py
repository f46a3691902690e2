"""Probe 3: decompose the integrate cost at 256^3 on the real chip.
Variants: full op / no depth gather / gather only / no sqrt-corr /
f32 weight / no weight stream. Chained fori_loop timing."""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp



from slambench_tpu import params
from slambench_tpu.volume import pack_tsdf, take_flat, voxel_centers_axis

OUT = {}
REPS = 3
V = 256
H, W = 240, 320


def timeit(name, fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.monotonic()
    r = fn(*args)
    jax.block_until_ready(r)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).reshape(-1)[:1]
    dt = (time.monotonic() - t0) / REPS
    OUT[name] = round(dt * 1e3, 1)
    print(f"{name:32s} {dt*1e3:9.1f} ms", flush=True)
    return dt


tsdf0 = jnp.asarray(np.full((V, V, V), 32766, np.int16))
w8 = jnp.asarray(np.zeros((V, V, V), np.int8))
w32 = jnp.asarray(np.zeros((V, V, V), np.float32))
inv_track = jnp.eye(4)
K = jnp.asarray(np.array([
    [240.6, 0, 160, 0], [0, 240.0, 120, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
    np.float32))
fd = jnp.asarray((np.random.rand(H, W) * 3 + 0.5).astype(np.float32))
dim = (4.8, 4.8, 4.8)
mu = 0.1


def proj(X, Y, Z, M):
    px = M[0, 0] * X + M[0, 1] * Y + M[0, 2] * Z + M[0, 3]
    py = M[1, 0] * X + M[1, 1] * Y + M[1, 2] * Z + M[1, 3]
    pz = M[2, 0] * X + M[2, 1] * Y + M[2, 2] * Z + M[2, 3]
    return px, py, pz


def coords():
    xs = voxel_centers_axis(V, dim[0])
    ys = voxel_centers_axis(V, dim[1])
    zs = voxel_centers_axis(V, dim[2])
    return xs[None, None, :], ys[None, :, None], zs[:, None, None]


def integ(tsdf, weight, depth, use_gather=True, use_corr=True,
          wdtype=None):
    X, Y, Z = coords()
    px, py, pz = proj(X, Y, Z, inv_track)
    cx, cy, cz = proj(px, py, pz, K)
    u = cx / cz + 0.5
    v = cy / cz + 0.5
    in_front = pz >= 1e-4
    in_img = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    ui = jnp.clip(u.astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, H - 1)
    if use_gather:
        d = take_flat(depth.reshape(-1), vi * W + ui)
    else:
        d = (vi * W + ui).astype(jnp.float32) * 1e-7 + 2.0
    if use_corr:
        corr = jnp.sqrt(1.0 + (px / pz) ** 2 + (py / pz) ** 2)
    else:
        corr = 1.0
    diff = (d - cz) * corr
    update = in_front & in_img & (d != 0) & (diff > -mu)
    sdf = jnp.minimum(1.0, diff / mu)
    wv = weight.astype(jnp.float32)
    val = tsdf.astype(jnp.float32) * params.TSDF_INV_SCALE
    new_val = jnp.clip((wv * val + sdf) / (wv + 1.0), -1.0, 1.0)
    new_w = jnp.minimum(wv + 1.0, 100.0)
    tsdf_out = jnp.where(update, pack_tsdf(new_val), tsdf)
    weight_out = jnp.where(update, new_w.astype(weight.dtype), weight)
    return tsdf_out, weight_out


def gather_only(tsdf, depth):
    X, Y, Z = coords()
    px, py, pz = proj(X, Y, Z, inv_track)
    cx, cy, cz = proj(px, py, pz, K)
    u = cx / cz + 0.5
    v = cy / cz + 0.5
    ui = jnp.clip(u.astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, H - 1)
    d = take_flat(depth.reshape(-1), vi * W + ui)
    return jnp.where(d > 2.0, tsdf, tsdf)  # force materialization @ int16


def loop(fn, n_out=2):
    @jax.jit
    def run(*args):
        def body(i, c):
            return fn(*c, *args[n_out:]) if n_out else fn(*args)
        if n_out:
            return jax.lax.fori_loop(0, REPS, body, args[:n_out])
        return jax.lax.fori_loop(0, REPS, lambda i, c: fn(*args), args[0])
    return run


timeit("integrate_full", loop(
    lambda t, w, d: integ(t, w, d), 2), tsdf0, w8, fd)
timeit("integrate_nogather", loop(
    lambda t, w, d: integ(t, w, d, use_gather=False), 2), tsdf0, w8, fd)
timeit("integrate_nocorr", loop(
    lambda t, w, d: integ(t, w, d, use_corr=False), 2), tsdf0, w8, fd)
timeit("integrate_w32", loop(
    lambda t, w, d: integ(t, w, d), 2), tsdf0, w32, fd)


@jax.jit
def gather_loop(t, d):
    return jax.lax.fori_loop(0, REPS, lambda i, c: gather_only(c, d), t)


timeit("gather_only", gather_loop, tsdf0, fd)


# streaming touch: read+write tsdf+weight, no gather/math
@jax.jit
def stream_loop(t, w):
    def body(i, c):
        t_, w_ = c
        return (t_ + jnp.int16(0), w_ + jnp.int8(0))
    return jax.lax.fori_loop(0, REPS, body, (t, w))


timeit("stream_touch", stream_loop, tsdf0, w8)

with open("/tmp/probe3.json", "w") as f:
    json.dump(OUT, f, indent=1)
print(json.dumps(OUT))
