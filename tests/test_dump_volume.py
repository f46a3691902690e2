"""Volume-dump byte compatibility (reference: cpp/kernels.cpp:1006-1030
writes the int16 value component of every voxel, x-fastest order)."""

import numpy as np

from slambench_tpu.pipeline import KFusion


def test_dump_volume_format(tmp_path):
    kf = KFusion((32, 24), (8, 8, 8), (2.0,) * 3, (1.0, 1.0, 0.0),
                 (2, 2), (30.0, 30.0, 16.0, 12.0))
    st = kf.init_state()
    path = str(tmp_path / "vol.bin")
    kf.dump_volume(st, path)
    raw = np.fromfile(path, dtype="<i2")
    assert raw.size == 8 * 8 * 8
    # Fresh volume: every voxel holds 1.0 * 32766 (reference initVolume).
    assert (raw == 32766).all()
    # Byte order is x-fastest (the [z, y, x] C-order layout).
    st2 = st
    tsdf = np.asarray(st2.tsdf).copy()
    tsdf[0, 0, 3] = 1234            # voxel (x=3, y=0, z=0)
    import dataclasses
    import jax.numpy as jnp
    st2 = dataclasses.replace(st2, tsdf=jnp.asarray(tsdf))
    kf.dump_volume(st2, path)
    raw = np.fromfile(path, dtype="<i2")
    assert raw[3] == 1234
