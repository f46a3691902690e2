"""ONI container reader/writer (io/oni.py) + oni2raw converter.

The reference's oni2raw replays recordings through the OpenNI runtime
(reference: kfusion/thirdparty/oni2raw.cpp:76-255); here the container
is parsed directly, so the suite round-trips the record layout and the
two supported depth codecs, checks re-sync on corrupted records, and
runs the full .oni -> RAW -> reader chain.
"""

import io
import struct

import numpy as np
import pytest

from slambench_tpu.io.oni import (
    MAGIC_FILE, OniReader, OniWriter,
    _compress_depth_16z, _uncompress_depth_16z,
)


def _frames(n=3, h=12, w=16, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        d = (rng.random((h, w)) * 5000).astype(np.uint16)
        d[rng.random((h, w)) < 0.2] = 0          # kinect holes
        out.append(d)
    return out


@pytest.mark.parametrize("codec", [b"UNC_", b"16zP", b"16zT"])
def test_oni_roundtrip(tmp_path, codec):
    path = str(tmp_path / "rec.oni")
    frames = _frames()
    w = OniWriter(path, 16, 12, codec=codec)
    for i, d in enumerate(frames):
        w.write(d, timestamp_us=33333 * i)
    w.close()

    rd = OniReader(path)
    got = list(rd.depth_frames())
    rd.close()
    assert len(got) == len(frames)
    for a, b in zip(got, frames):
        np.testing.assert_array_equal(a, b)
    node = rd.depth_node
    assert node is not None
    assert node.resolution == (16, 12)
    assert node.name == b"Depth1"


def test_16z_codec_inverse():
    rng = np.random.default_rng(1)
    d = (rng.random(640) * 65535).astype(np.uint16)
    back = _uncompress_depth_16z(_compress_depth_16z(d), d.size)
    np.testing.assert_array_equal(back, d)


def test_16z_zero_runs_and_deltas():
    """Hand-built nibble stream: zero-run then delta pairs."""
    # 0xF3: zero run of 3; 0xFF + 100: value 100; 0x87: +2 then +1.
    stream = bytes([0xF3, 0xFF, 100, 0, 0x87])
    out = _uncompress_depth_16z(stream, 6)
    np.testing.assert_array_equal(out, [0, 0, 0, 100, 102, 103])


def test_oni_resync_on_corruption(tmp_path):
    """A corrupted byte range inside one NEW_DATA record must not lose
    the later frames: the reader re-syncs on the record magic."""
    path = str(tmp_path / "rec.oni")
    frames = _frames(4)
    w = OniWriter(path, 16, 12)
    for d in frames:
        w.write(d)
    w.close()

    blob = bytearray(open(path, "rb").read())
    # Find the second NEW_DATA record header and trash its type field so
    # header parsing fails mid-stream.
    needle = struct.pack("<I", 0x0052494E)
    hits = []
    i = blob.find(needle)
    while i >= 0:
        hits.append(i)
        i = blob.find(needle, i + 1)
    # records: NODE_ADDED, XRes, YRes, READY, DATA x4, END
    second_data = hits[5]
    blob[second_data:second_data + 4] = b"XXXX"
    open(path, "wb").write(bytes(blob))

    rd = OniReader(path)
    got = list(rd.depth_frames())
    rd.close()
    assert len(got) == 3          # frame 2 lost, the rest recovered
    np.testing.assert_array_equal(got[0], frames[0])
    np.testing.assert_array_equal(got[-1], frames[-1])


def test_oni_corrupt_tail_terminates(tmp_path):
    """A trashed FINAL record followed by garbage must terminate (the
    resync scan previously made zero progress on a <4-byte tail and
    spun forever) and still return the intact frames."""
    path = str(tmp_path / "rec.oni")
    frames = _frames(2)
    w = OniWriter(path, 16, 12)
    for d in frames:
        w.write(d)
    w.close()
    blob = bytearray(open(path, "rb").read())
    needle = struct.pack("<I", 0x0052494E)
    last = blob.rfind(needle)                 # the END record
    blob[last:last + 4] = b"XXXX"
    blob += b"\x4e" * 41                      # garbage tail, no magic
    open(path, "wb").write(bytes(blob))

    rd = OniReader(path)
    got = list(rd.depth_frames())             # must not hang
    rd.close()
    assert len(got) == 2
    np.testing.assert_array_equal(got[1], frames[1])


def test_oni_bad_magic(tmp_path):
    path = str(tmp_path / "not.oni")
    open(path, "wb").write(b"RIFFxxxx")
    with pytest.raises(ValueError, match="not an ONI recording"):
        OniReader(path)


def test_oni2raw_cli(tmp_path):
    """Full converter chain: .oni -> RAW -> RawDepthReader."""
    from slambench_tpu.tools.oni2raw import main
    from slambench_tpu.io.readers import RawDepthReader

    oni = str(tmp_path / "rec.oni")
    raw = str(tmp_path / "rec.raw")
    frames = _frames(3, h=24, w=32, seed=2)
    w = OniWriter(oni, 32, 24, codec=b"16zT")
    for d in frames:
        w.write(d)
    w.close()

    assert main([oni, raw]) == 0
    rd = RawDepthReader(raw)
    for want in frames:
        got = rd.read_next_depth_frame()
        np.testing.assert_array_equal(got, want)
    assert rd.read_next_depth_frame() is None
