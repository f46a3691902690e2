"""Straight-line NumPy re-implementations of the kernel contract, written
as literal loops from the reference's C++ semantics (reference:
kfusion/src/cpp/kernels.cpp). These play the role of the sequential C++
oracle in the reference's cross-backend testing strategy
(reference: commons.h:414-518 compare* helpers): the vectorized jnp ops
and the Pallas kernels are both validated against these buffers.

Deliberately slow and obvious — do not optimize.
"""

from __future__ import annotations

import numpy as np

INVALID = -2.0


def uintwrap_clamp(i: int, size: int) -> int:
    """C++ `clamp(uint(x+i), 0u, size-1)` with unsigned wraparound."""
    if i < 0:
        return size - 1
    return min(i, size - 1)


def bilateral_filter(depth: np.ndarray, gaussian: np.ndarray,
                     e_d: float, r: int) -> np.ndarray:
    H, W = depth.shape
    out = np.zeros_like(depth)
    e2 = e_d * e_d * 2
    for y in range(H):
        for x in range(W):
            center = depth[y, x]
            if center == 0:
                out[y, x] = 0
                continue
            t = 0.0
            s = 0.0
            for i in range(-r, r + 1):
                for j in range(-r, r + 1):
                    cx = uintwrap_clamp(x + i, W)
                    cy = uintwrap_clamp(y + j, H)
                    cur = depth[cy, cx]
                    if cur > 0:
                        mod = (cur - center) ** 2
                        factor = (gaussian[i + r] * gaussian[j + r]
                                  * np.exp(-mod / e2))
                        t += factor * cur
                        s += factor
            out[y, x] = t / s
    return out


def half_sample_robust(depth: np.ndarray, e_d: float, r: int = 1
                       ) -> np.ndarray:
    H, W = depth.shape
    oh, ow = H // 2, W // 2
    out = np.zeros((oh, ow), depth.dtype)
    for y in range(oh):
        for x in range(ow):
            cx, cy = 2 * x, 2 * y
            center = depth[cy, cx]
            t = 0.0
            s = 0.0
            for i in range(-r + 1, r + 1):
                for j in range(-r + 1, r + 1):
                    ux = min(max(cx + j, 0), 2 * ow - 1)
                    uy = min(max(cy + i, 0), 2 * oh - 1)
                    cur = depth[uy, ux]
                    if abs(cur - center) < e_d:
                        s += 1.0
                        t += cur
            out[y, x] = t / s
    return out


def depth2vertex(depth: np.ndarray, inv_k: np.ndarray) -> np.ndarray:
    H, W = depth.shape
    out = np.zeros((3, H, W), np.float32)
    for y in range(H):
        for x in range(W):
            d = depth[y, x]
            if d > 0:
                p = inv_k[:3, :3] @ np.array([x, y, 1.0], np.float32)
                out[:, y, x] = d * p
    return out


def vertex2normal(vertex: np.ndarray) -> np.ndarray:
    _, H, W = vertex.shape
    out = np.zeros((3, H, W), np.float32)
    for y in range(H):
        for x in range(W):
            left = vertex[:, y, max(x - 1, 0)]
            right = vertex[:, y, min(x + 1, W - 1)]
            up = vertex[:, max(y - 1, 0), x]
            down = vertex[:, min(y + 1, H - 1), x]
            if left[2] == 0 or right[2] == 0 or up[2] == 0 or down[2] == 0:
                out[:, y, x] = (INVALID, 0, 0)
                continue
            dxv = right - left
            dyv = down - up
            n = np.cross(dyv, dxv)
            norm = np.linalg.norm(n)
            out[:, y, x] = n / norm if norm > 0 else n * np.inf
    return out


def track(in_vertex, in_normal, ref_vertex, ref_normal, t_track, view,
          dist_threshold, normal_threshold):
    _, h, w = in_vertex.shape
    _, H, W = ref_vertex.shape
    result = np.zeros((h, w), np.int32)
    error = np.zeros((h, w), np.float32)
    J = np.zeros((6, h, w), np.float32)
    for y in range(h):
        for x in range(w):
            if in_normal[0, y, x] == INVALID:
                result[y, x] = -1
                continue
            pv = t_track[:3, :3] @ in_vertex[:, y, x] + t_track[:3, 3]
            pp = view[:3, :3] @ pv + view[:3, 3]
            px = pp[0] / pp[2] + 0.5
            py = pp[1] / pp[2] + 0.5
            if not (np.isfinite(px) and np.isfinite(py)) or \
               px < 0 or px > W - 1 or py < 0 or py > H - 1:
                result[y, x] = -2
                continue
            u, v = int(px), int(py)
            rn = ref_normal[:, v, u]
            if rn[0] == INVALID:
                result[y, x] = -3
                continue
            diff = ref_vertex[:, v, u] - pv
            pn = t_track[:3, :3] @ in_normal[:, y, x]
            if np.linalg.norm(diff) > dist_threshold:
                result[y, x] = -4
                continue
            if np.dot(pn, rn) < normal_threshold:
                result[y, x] = -5
                continue
            result[y, x] = 1
            error[y, x] = np.dot(rn, diff)
            J[:3, y, x] = rn
            J[3:, y, x] = np.cross(pv, rn)
    return result, error, J


def reduce_track(result, error, J):
    """Packed 32-vector, float64 accumulation for a tight oracle."""
    valid = result.reshape(-1) >= 1
    e = error.reshape(-1)[valid].astype(np.float64)
    Jm = J.reshape(6, -1)[:, valid].astype(np.float64)
    out = np.zeros(32)
    out[0] = np.sum(e * e)
    out[1:7] = Jm @ e
    G = Jm @ Jm.T
    out[7:28] = G[np.triu_indices(6)]
    r = result.reshape(-1)
    out[28] = np.sum(valid)
    out[29] = np.sum(r == -4)
    out[30] = np.sum(r == -5)
    out[31] = np.sum((r < 1) & (r > -4))
    return out.astype(np.float32)


def integrate(tsdf, weight, depth, inv_track, K, mu, maxweight, dim):
    sz, sy, sx = tsdf.shape
    H, W = depth.shape
    tsdf = tsdf.copy()
    weight = weight.copy()
    for z in range(sz):
        for y in range(sy):
            for x in range(sx):
                p = np.array([(x + 0.5) * dim[0] / sx,
                              (y + 0.5) * dim[1] / sy,
                              (z + 0.5) * dim[2] / sz], np.float32)
                pos = inv_track[:3, :3] @ p + inv_track[:3, 3]
                if pos[2] < 0.0001:
                    continue
                cam = K[:3, :3] @ pos + K[:3, 3]
                u = cam[0] / cam[2] + 0.5
                v = cam[1] / cam[2] + 0.5
                if u < 0 or u > W - 1 or v < 0 or v > H - 1:
                    continue
                d = depth[int(v), int(u)]
                if d == 0:
                    continue
                diff = (d - cam[2]) * np.sqrt(
                    1 + (pos[0] / pos[2]) ** 2 + (pos[1] / pos[2]) ** 2)
                if diff > -mu:
                    sdf = min(1.0, diff / mu)
                    w0 = float(weight[z, y, x])
                    v0 = float(tsdf[z, y, x]) * 0.00003051944088
                    nv = np.clip((w0 * v0 + sdf) / (w0 + 1), -1.0, 1.0)
                    tsdf[z, y, x] = np.int16(np.trunc(nv * 32766.0))
                    weight[z, y, x] = min(w0 + 1, maxweight)
    return tsdf, weight


def interp(tsdf, dim, p):
    """Trilinear interp at a single world point p (3,)."""
    sz, sy, sx = tsdf.shape
    size = np.array([sx, sy, sz], np.float32)
    scaled = p * size / np.asarray(dim, np.float32) - 0.5
    base = np.floor(scaled).astype(int)
    f = scaled - base
    lo = np.clip(base, 0, size.astype(int) - 1)
    hi = np.clip(base + 1, 0, size.astype(int) - 1)

    def vs(x, y, z):
        return float(tsdf[z, y, x])

    v = ((vs(lo[0], lo[1], lo[2]) * (1 - f[0]) + vs(hi[0], lo[1], lo[2]) * f[0]) * (1 - f[1])
         + (vs(lo[0], hi[1], lo[2]) * (1 - f[0]) + vs(hi[0], hi[1], lo[2]) * f[0]) * f[1]) * (1 - f[2]) \
        + ((vs(lo[0], lo[1], hi[2]) * (1 - f[0]) + vs(hi[0], lo[1], hi[2]) * f[0]) * (1 - f[1])
           + (vs(lo[0], hi[1], hi[2]) * (1 - f[0]) + vs(hi[0], hi[1], hi[2]) * f[0]) * f[1]) * f[2]
    return v * 0.00003051944088
