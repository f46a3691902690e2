"""The multi-chip communication account: the analytic per-frame
collective-traffic model (parallel/comm.py) must agree with what XLA
actually emits for the sharded step, and the scaling projection tool
must run from a profile dict."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slambench_tpu.parallel.comm import (
    analytic_traffic, hlo_collective_stats, lower_step_hlo,
)
from slambench_tpu.parallel.mesh import make_mesh
from slambench_tpu.parallel.step import ShardedKFusion


@pytest.fixture(scope="module")
def sharded_kf():
    kf = ShardedKFusion((160, 120), (64, 64, 64), (4.8, 4.8, 4.8),
                        (1.6, 2.4, 1.2), (10, 5, 4),
                        (120.0, 120.0, 80.0, 60.0), mesh=make_mesh(4))
    return kf


def test_hlo_matches_analytic_traffic(sharded_kf):
    kf = sharded_kf
    state = kf.init_state()
    depth = jnp.zeros((120, 160), jnp.uint16)
    hlo = lower_step_hlo(kf, state, depth)
    stats = hlo_collective_stats(hlo)
    model = analytic_traffic(kf)

    # Halo exchange: the emitted collective-permute payload equals the
    # modelled 2 x halo-planes of int16.
    assert "collective-permute" in stats, stats.keys()
    assert stats["collective-permute"]["bytes"] == \
        model["halo_ppermute"]["bytes"]

    # ICP normal-equations psum: a 32-float all-reduce must exist inside
    # the while body (static count 1 per level-loop structure).
    ar_shapes = stats.get("all-reduce", {}).get("shapes", [])
    assert any(s == "f32[32]" for s in ar_shapes), ar_shapes

    # Raycast composition: the f32[H,W] pmin and f32[3,H,W] normals psum.
    npix = kf.H * kf.W
    ar_bytes = stats.get("all-reduce", {}).get("bytes", 0)
    assert ar_bytes >= model["raycast_pmin"]["bytes"] + \
        model["raycast_psum_normal"]["bytes"]

    # Diagnostic map reassembly.
    assert "all-gather" in stats


def test_analytic_traffic_totals(sharded_kf):
    model = analytic_traffic(sharded_kf)
    parts = sum(v["bytes"] for k, v in model.items() if k != "total")
    assert model["total"]["bytes"] == parts
    # The dominant term at 64^3/halo-10 scale should be the halo or the
    # normals psum; order-of-magnitude sanity, not a tautology:
    assert model["total"]["bytes"] < 4 * 64 * 64 * 64  # << volume bytes


def test_scaling_report_runs(tmp_path):
    from slambench_tpu.tools.scaling_report import project_scaling
    profile = {
        "tracking_phase": {"ms": 60.0},
        "integrate_plus_mip_fused": {"ms": 40.0},
        "raycast_warm": {"ms": 80.0},
        "bilateral_filter": {"ms": 2.0},
        "mm2meters": {"ms": 0.5},
        "device_eff_gbps": 2.5,
    }
    rows = project_scaling(profile, image=(160, 120), volume=64,
                           halo=10, ici_gbps=45.0, ici_lat_us=1.0)
    assert [r["n"] for r in rows] == [1, 2, 4, 8, 16]
    assert rows[0]["efficiency"] == 1.0
    # Efficiency decreases monotonically but stays meaningful at 8 chips.
    effs = [r["efficiency"] for r in rows]
    assert all(e1 >= e2 for e1, e2 in zip(effs, effs[1:]))
    assert effs[3] > 0.5
