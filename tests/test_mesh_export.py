"""TSDF -> mesh export (tools/mesh_export.py, surface nets)."""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

from slambench_tpu.tools.mesh_export import (load_tsdf, surface_nets,
                                             write_obj, write_ply)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sphere_tsdf(n=48, r_frac=0.3, mu_vox=4.0):
    """Truncated signed distance to a centred sphere, in voxel units
    scaled so the zero crossing matches the pipeline's convention."""
    i = (np.arange(n) + 0.5) / n
    z, y, x = np.meshgrid(i, i, i, indexing="ij")
    d = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2) - r_frac
    return np.clip(d * n / mu_vox, -1.0, 1.0).astype(np.float32)


def test_sphere_mesh_geometry():
    n, r_frac, dim = 48, 0.3, 2.0
    verts, tris = surface_nets(_sphere_tsdf(n, r_frac), dim=(dim,) * 3)
    assert len(verts) > 1000 and len(tris) >= 2 * len(verts) - 100
    # Every vertex within half a voxel of the true sphere.
    r = np.linalg.norm(verts - dim / 2, axis=1)
    assert abs(r.mean() - r_frac * dim) < 0.25 * dim / n
    assert np.abs(r - r_frac * dim).max() < 0.75 * dim / n
    # Orientation: signed volume (divergence theorem over outward-wound
    # triangles) must come out positive and close to the sphere volume.
    a, b, c = (verts[tris[:, k]] - dim / 2 for k in range(3))
    vol = np.sum(np.einsum("ij,ij->i", a, np.cross(b, c))) / 6.0
    want = 4 / 3 * np.pi * (r_frac * dim) ** 3
    assert abs(vol - want) / want < 0.05, (vol, want)


def test_mesh_export_cli_roundtrip(tmp_path):
    """Reference-format dump (int16 shorts, value*32766) -> PLY + OBJ."""
    n = 32
    vol = _sphere_tsdf(n)
    dump = tmp_path / "vol.dump"
    (vol * 32766).astype("<i2").tofile(dump)

    ply = tmp_path / "mesh.ply"
    r = subprocess.run(
        [sys.executable, "-m", "slambench_tpu.tools.mesh_export",
         str(dump), "-o", str(ply), "--dim", "2.0"],
        cwd=REPO, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    head = ply.read_bytes()[:200]
    assert head.startswith(b"ply\nformat binary_little_endian")
    n_v = int([ln for ln in head.split(b"\n")
               if ln.startswith(b"element vertex")][0].split()[-1])
    assert n_v > 200

    # load_tsdf must invert the dump scaling exactly (C truncation means
    # at most 1 LSB of fixed-point error).
    back = load_tsdf(str(dump), None)
    assert back.shape == (n, n, n)
    assert np.abs(back - vol).max() <= 1.5 / 32766

    obj = tmp_path / "mesh.obj"
    verts, tris = surface_nets(vol, dim=(2.0,) * 3)
    write_obj(str(obj), verts, tris)
    lines = obj.read_text().splitlines()
    assert sum(ln.startswith("v ") for ln in lines) == len(verts)
    assert sum(ln.startswith("f ") for ln in lines) == len(tris)
    write_ply(str(tmp_path / "again.ply"), verts, tris)
