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


def _independent_oni_bytes() -> bytes:
    """A recording assembled byte-by-byte from the OpenNI 1.x on-disk
    structures (XnRecordingHeader / RecordHeaderData / NodeAdded_1_0_0_5
    / NewDataRecord, the layout oni2raw.cpp's xn::Player consumes) —
    deliberately NOT via :class:`OniWriter`, and carrying record variants
    the writer never emits:

    * real XnVersion field packing in the file header,
    * a NODE_ADDED_1_0_0_5 (0x0D) depth node with the trailing
      frame-count / min- / max-timestamp fields,
    * codec id ``NONE`` (XN_CODEC_UNCOMPRESSED's fourcc) instead of the
      writer's ``UNC_``,
    * an image node (type 3) whose NEW_DATA payload must be ignored,
    * STRING_PROPERTY / GENERAL_PROPERTY / SEEK_TABLE records,
    * inter-record garbage that forces a magic re-sync.

    This pins the record-walk against a second, independent encoding of
    the documented layout; the 16z codec nibble semantics remain
    validated by round-trip only (no camera recordings exist in this
    environment).
    """
    REC = struct.Struct("<IIIIIQ")
    RECORD_MAGIC = 0x0052494E

    def s(b: bytes) -> bytes:                    # XnString: len incl \0
        return struct.pack("<I", len(b) + 1) + b + b"\0"

    def rec(rtype, node, fields, payload=b"", undo=0):
        return REC.pack(RECORD_MAGIC, rtype, node,
                        REC.size + len(fields), len(payload), undo) \
            + fields + payload

    out = bytearray()
    # XnRecordingHeader: magic, XnVersion{u8 major, u8 minor,
    # u16 maintenance, u32 build}, u64 nGlobalMaxTimeStamp, u32 nMaxNodeID
    out += b"NI10" + struct.pack("<BBHI", 1, 0, 0, 23)
    out += struct.pack("<QI", 66666, 2)

    # Image node 1 (ignored by the depth extractor).
    out += rec(0x0D, 1, s(b"Image1") + struct.pack("<I", 3) + b"JPEG"
               + struct.pack("<IQQ", 2, 0, 66666))
    # Depth node 2, NODE_ADDED_1_0_0_5 with trailing fields.
    out += rec(0x0D, 2, s(b"Depth1") + struct.pack("<I", 1) + b"NONE"
               + struct.pack("<IQQ", 2, 0, 66666))
    out += rec(0x03, 2, s(b"XRes") + struct.pack("<Q", 4))
    out += rec(0x03, 2, s(b"YRes") + struct.pack("<Q", 3))
    out += rec(0x03, 2, s(b"ZPD") + struct.pack("<Q", 120))
    out += rec(0x05, 2, s(b"SupportedMapOutputModesCount") + s(b"1"))
    out += rec(0x06, 2, s(b"S2RD") + struct.pack("<II", 8, 0)
               + b"\0" * 8)                       # general property blob
    out += rec(0x09, 1, b"")                      # image state ready
    out += rec(0x09, 2, b"")                      # depth state ready
    out += rec(0x08, 2, b"")                      # NODE_DATA_BEGIN

    f0 = np.arange(12, dtype=np.uint16).reshape(3, 4) * 100
    f1 = (f0 + 7).astype(np.uint16)
    # Image NEW_DATA first — junk payload, must be skipped.
    out += rec(0x0A, 1, struct.pack("<QI", 0, 1), b"\xAB" * 10)
    out += rec(0x0A, 2, struct.pack("<QI", 0, 1), f0.tobytes())
    out += b"\xDE\xAD\xBE\xEF" * 5                # garbage: forces resync
    out += rec(0x0A, 2, struct.pack("<QI", 33333, 2), f1.tobytes())
    # Seek table (type 0x0C) then END.
    out += rec(0x0C, 0, b"", b"\0" * 32)
    out += rec(0x0B, 0, b"")
    return bytes(out)


def test_oni_independent_fixture(tmp_path):
    """Frame extraction from the hand-assembled OpenNI-layout recording
    (no OniWriter involvement)."""
    path = str(tmp_path / "cam.oni")
    open(path, "wb").write(_independent_oni_bytes())
    r = OniReader(path)
    got = list(r.depth_frames())
    assert len(got) == 2
    f0 = np.arange(12, dtype=np.uint16).reshape(3, 4) * 100
    np.testing.assert_array_equal(got[0], f0)
    np.testing.assert_array_equal(got[1], f0 + 7)
    node = r.depth_node
    assert node is not None and node.resolution == (4, 3)
    assert node.codec == b"NONE" and node.frames == 2
    # The image node was seen but its data ignored.
    assert r.nodes[1].node_type == 3 and r.nodes[1].frames == 0
    r.close()
