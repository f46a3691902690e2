"""Collective-traffic accounting for the sharded step.

The reference has no distributed story to measure (SURVEY.md §5.8); this
module is the evidence layer for OUR multi-chip design: how many bytes
per frame each collective moves, derived two independent ways —

* ``analytic_traffic``: closed-form from the step's structure
  (parallel/step.py — halo ``ppermute``, raycast ``pmin``/``psum``,
  per-ICP-iteration 32-float ``psum``, diagnostic ``all_gather``);
* ``hlo_collective_stats``: parsed out of the compiled step's HLO, so
  the analytic claim is checked against what XLA actually emits
  (tests/test_scaling.py asserts they agree).

``tools/scaling_report.py`` combines these with measured single-chip
phase times (tools/profile_frame.py) into the projected scaling curve
committed in SCALING.md.
"""

from __future__ import annotations

import re
from typing import Dict

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4,
    "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}

# `%psum.41 = f32[32]{0} all-reduce(...)`, `%ppermute.6 = s16[4,64,64]
# {2,1,0} collective-permute(...)` and tuple-shaped variants.
_COLL_RE = re.compile(
    r"=\s*\(?((?:[a-z]+\d*\[[\d,]*\](?:\{[\d,]*\})?(?:,\s*)?)+)\)?\s*"
    r"(all-reduce|all-gather|collective-permute|all-to-all|"
    r"reduce-scatter)(?:-start)?\(")
_SHAPE_RE = re.compile(r"([a-z]+\d*)\[([\d,]*)\]")


def analytic_traffic(kf, icp_iters: int | None = None) -> Dict[str, dict]:
    """Per-frame collective traffic of ``ShardedKFusion._sharded_step``,
    in closed form. Bytes are per-device payload (what one device sends).

    ``icp_iters`` defaults to the convergence-free worst case
    (sum of the pyramid iteration budget, reference
    default_parameters.h:26 => 10+5+4 = 19).
    """
    H, W = kf.H, kf.W
    iters = sum(kf.iterations) if icp_iters is None else icp_iters
    halo_bytes = 2 * kf.halo * kf.volume_resolution[0] \
        * kf.volume_resolution[1] * 2      # 2 directions, int16 planes
    out = {
        "halo_ppermute": {
            "bytes": halo_bytes,
            "count": 2,
            "what": f"{kf.halo} tsdf z-planes to each neighbour "
                    "(raycast halo, parallel/step.py:_halo_exchange)",
        },
        "raycast_pmin": {
            "bytes": H * W * 4,
            "count": 1,
            "what": "first-hit t composition across slabs (f32[H,W] min)",
        },
        "raycast_psum_normal": {
            "bytes": 3 * H * W * 4,
            "count": 1,
            "what": "owning-slab gradient normals (f32[3,H,W] sum)",
        },
        "icp_psum": {
            "bytes": iters * 32 * 4,
            "count": iters,
            "what": "packed normal equations, one f32[32] per ICP "
                    "iteration (worst case, no early convergence)",
        },
        "track_result_all_gather": {
            "bytes": H * W * 4,
            "count": 1,
            "what": "level-0 diagnostic result map reassembly (i32 rows)",
        },
    }
    # Row-sharded preprocessing falls back to fully-replicated when the
    # rows don't divide the mesh or under the Pallas tier
    # (parallel/step.py:_sharded_preprocessing) — only count its
    # all_gather when the sharded path is actually taken.
    n = getattr(kf, "n_shards", 1)
    if n > 1 and H % n == 0 and getattr(kf, "backend", "fast") != "pallas":
        out["preprocess_all_gather"] = {
            "bytes": H * W * 4,
            "count": 1,
            "what": "row-sharded bilateral-filter band reassembly "
                    "(f32 rows, parallel/step.py:_sharded_preprocessing)",
        }
    total = sum(v["bytes"] for v in out.values())
    out["total"] = {"bytes": total, "count": None,
                    "what": "per-frame per-device collective payload"}
    return out


def hlo_collective_stats(hlo_text: str) -> Dict[str, dict]:
    """Collective ops (kind -> {count, shapes, bytes}) appearing in an
    HLO module text. A collective inside a ``while`` body is counted
    once (static structure); multiply by the loop trip count for
    dynamic totals."""
    stats: Dict[str, dict] = {}
    for m in _COLL_RE.finditer(hlo_text):
        shapes_blob, kind = m.group(1), m.group(2)
        nbytes = 0
        shapes = []
        for sm in _SHAPE_RE.finditer(shapes_blob):
            dt, dims = sm.group(1), sm.group(2)
            n = 1
            for d in filter(None, dims.split(",")):
                n *= int(d)
            nbytes += n * _DTYPE_BYTES.get(dt, 4)
            shapes.append(f"{dt}[{dims}]")
        e = stats.setdefault(kind, {"count": 0, "bytes": 0, "shapes": []})
        e["count"] += 1
        e["bytes"] += nbytes
        e["shapes"].extend(shapes)
    return stats


def lower_step_hlo(kf, state, depth) -> str:
    """Optimized HLO text of the full sharded frame step (all phases on)."""
    lowered = kf._sharded_step.lower(
        state, depth, tracking_on=True, integrate_frame=True,
        force_integrate=False, raycast_on=True)
    compiled = lowered.compile()
    return "\n".join(compiled.as_text() if isinstance(compiled.as_text(), list)
                     else [compiled.as_text()])
