"""Reference rate-gate semantics and real-time (fps) mode tests."""

import time

import numpy as np
import jax.numpy as jnp
import pytest

from slambench_tpu.io.raw import RawWriter
from slambench_tpu.io.readers import RawDepthReader
from slambench_tpu.io.synthetic import generate_dataset
from slambench_tpu.pipeline import KFusion


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    # Gentle motion: with integration_rate=3 the map holds only the 4
    # bootstrap frames for a while, and valid-pixel coverage sits near
    # the 15% track threshold — the same integrate-requires-tracked
    # cliff the reference has (cpp/kernels.cpp:994). Slow motion keeps
    # the gate tests off that cliff.
    out = str(tmp_path_factory.mktemp("synth_rates"))
    return generate_dataset(out, n_frames=14, image_size=(160, 120),
                            dim=(4.8,) * 3, amp=0.06, period=60)


def test_tracking_rate_gate(dataset):
    """frame % tracking_rate != 0 skips tracking entirely: pose frozen,
    tracked false (reference: cpp/kernels.cpp:927)."""
    man = dataset
    rd = RawDepthReader(man["raw"])
    init = [f * d for f, d in zip(man["init_pos_factor"], man["dim"])]
    kf = KFusion((160, 120), (64,) * 3, man["dim"], init, (10, 5, 4),
                 man["camera"])
    st = kf.init_state()
    poses = []
    trackeds = []
    for frame in range(12):
        d = rd.read_next_depth_frame()
        st = kf.process_frame(st, jnp.asarray(np.ascontiguousarray(d)),
                              frame, tracking_rate=2)
        poses.append(np.asarray(st.pose))
        trackeds.append(bool(st.tracked))
    # Odd frames (gated off) must not be tracked...
    assert not any(trackeds[1::2])
    # ...and the pose must carry over from the preceding even frame.
    for i in range(5, 12, 2):
        np.testing.assert_array_equal(poses[i], poses[i - 1])
    # Even frames past bootstrap do track.
    assert any(trackeds[4::2])


def test_integration_rate_gate(dataset):
    """integrated flag follows (tracked && frame%rate==0) || frame<=3
    (reference: cpp/kernels.cpp:994)."""
    man = dataset
    rd = RawDepthReader(man["raw"])
    init = [f * d for f, d in zip(man["init_pos_factor"], man["dim"])]
    kf = KFusion((160, 120), (64,) * 3, man["dim"], init, (10, 5, 4),
                 man["camera"])
    st = kf.init_state()
    flags = []
    for frame in range(12):
        d = rd.read_next_depth_frame()
        st = kf.process_frame(st, jnp.asarray(np.ascontiguousarray(d)),
                              frame, integration_rate=3)
        flags.append(bool(st.integrated))
    assert flags[0] and flags[1] and flags[2] and flags[3]  # bootstrap
    # After bootstrap: only multiples of 3 (given tracking succeeds).
    assert flags[6] and flags[9]
    assert not flags[4] and not flags[5] and not flags[7] and not flags[8]


def test_fps_mode_drops_frames(tmp_path):
    """In fps mode the frame index follows wall-clock: a slow consumer
    skips frames (reference: interface.h:49-80)."""
    path = str(tmp_path / "t.raw")
    with RawWriter(path, 16, 12) as w:
        for i in range(50):
            w.write(np.full((12, 16), i, np.uint16))
    rd = RawDepthReader(path, fps=100)  # 10 ms per frame
    first = rd.read_next_depth_frame()
    time.sleep(0.12)                    # consumer stalls ~12 frames
    second = rd.read_next_depth_frame()
    assert int(second[0, 0]) - int(first[0, 0]) >= 10


def test_blocking_read_paces(tmp_path):
    path = str(tmp_path / "t.raw")
    with RawWriter(path, 16, 12) as w:
        for i in range(8):
            w.write(np.full((12, 16), i, np.uint16))
    rd = RawDepthReader(path, fps=50, blocking_read=True)
    t0 = time.monotonic()
    n = 0
    while rd.read_next_depth_frame() is not None:
        n += 1
    elapsed = time.monotonic() - t0
    # 8 frames at 50 fps >= ~120 ms of pacing (loose lower bound).
    assert elapsed >= 0.08, elapsed


def test_scan_chunk_fallback_is_loud(dataset, capsys):
    """--scan-chunk combined with per-frame-observation flags (--stats,
    breakpoints) falls back to per-frame dispatch — and must SAY so on
    stderr, because the two tiers have different dispatch cost profiles
    and a silent downgrade would misattribute benchmark numbers
    (frontend/benchmark.py scan_ok)."""
    from slambench_tpu.config import Configuration
    from slambench_tpu.frontend import benchmark as fb

    man = dataset
    cfg = Configuration()
    cfg.input_file = man["raw"]
    cfg.log_file = "/dev/null"
    cfg.volume_resolution = (32, 32, 32)
    cfg.volume_size = man["dim"]
    cfg.initial_pos_factor = man["init_pos_factor"]
    cfg.camera = man["camera"]
    cfg.camera_overrided = True
    cfg.pyramid = (3, 2, 2)
    fb.run(cfg, fused=True, scan_chunk=8, break_at_frame=5,
           max_frames=6, quiet=True)
    err = capsys.readouterr().err
    assert "--scan-chunk 8 disabled" in err
    assert "breakpoint flags" in err
