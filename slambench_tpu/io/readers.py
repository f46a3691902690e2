"""Depth-stream readers with the reference's real-time pacing semantics.

TPU-native equivalents of the reference reader hierarchy
(reference: kfusion/include/interface.h:28-318, kfusion/src/reader.cpp:
33-209). The fps>0 "real-time mode" computes the frame index from
wall-clock time so slow compute DROPS frames (reference:
interface.h:49-80) — a capability the evaluation layer accounts for by
padding dropped frames (reference: thirdparty/checkPos.py:53-57).
"""

from __future__ import annotations

import math
import os
import re
import time
from typing import Optional, Tuple

import numpy as np

from slambench_tpu.io.raw import frame_nbytes, read_raw_header

# ICL-NUIM scene camera (reference: interface.h:89-97).
SCENE_K = (481.20, -480.00, 319.50, 239.50)
SCENE_SIZE = (640, 480)


class DepthReader:
    """Base reader: frame counting + fps pacing (reference:
    interface.h:28-87)."""

    def __init__(self, fps: int = 0, blocking_read: bool = False):
        self._frame = -1
        self._fps = fps
        self._blocking_read = blocking_read
        self._first_time: Optional[float] = None
        self.camera_open = False
        self.camera_active = False

    def get_frame_number(self) -> int:
        return self._frame

    def restart(self) -> None:
        self._frame = -1
        self._first_time = None

    def get_next_frame(self) -> None:
        """Advance the frame cursor; in fps mode the index is derived from
        wall-clock so frames are skipped when the consumer is too slow
        (reference: interface.h:49-80)."""
        if self._fps == 0:
            self._frame += 1
            return
        now = time.monotonic()
        if self._first_time is None:
            self._first_time = now
        frame = math.ceil((now - self._first_time) * self._fps)
        self._frame = frame
        if self._blocking_read:
            ttw = frame * (1.0 / self._fps) - (now - self._first_time)
            if ttw > 0:
                time.sleep(ttw)

    # Subclass API ------------------------------------------------------
    def read_next_depth_frame(self) -> Optional[np.ndarray]:
        """uint16 millimetre depth [H, W], or None at end of stream."""
        raise NotImplementedError

    def get_k(self) -> Tuple[float, float, float, float]:
        raise NotImplementedError

    def get_input_size(self) -> Tuple[int, int]:
        """(width, height), reference order."""
        raise NotImplementedError


class RawDepthReader(DepthReader):
    """Packed RAW container reader (reference: interface.h:199-318).

    Uses a memory map for O(1) frame seeks; the native C++ loader
    (slambench_tpu.native) provides a prefetching fast path with the same
    container format.
    """

    def __init__(self, filename: str, fps: int = 0,
                 blocking_read: bool = False):
        super().__init__(fps, blocking_read)
        self._path = filename
        w, h = read_raw_header(filename)
        self._size = (w, h)
        self._mm = np.memmap(filename, dtype=np.uint8, mode="r")
        self._frame_bytes = frame_nbytes(w, h)
        self.camera_open = True
        self.camera_active = True

    def read_next_depth_frame(self) -> Optional[np.ndarray]:
        self.get_next_frame()
        w, h = self._size
        off = self._frame_bytes * self._frame
        if off < 0 or off + self._frame_bytes > self._mm.size:
            return None
        return np.frombuffer(
            self._mm[off + 8: off + 8 + w * h * 2], dtype="<u2"
        ).reshape(h, w)

    def read_next_rgb_frame(self) -> Optional[np.ndarray]:
        w, h = self._size
        off = self._frame_bytes * self._frame
        if off < 0 or off + self._frame_bytes > self._mm.size:
            return None
        roff = off + 16 + w * h * 2
        return np.frombuffer(self._mm[roff: roff + w * h * 3],
                             dtype=np.uint8).reshape(h, w, 3)

    def get_k(self):
        # Reference default for RAW without -k override
        # (reference: interface.h:314-316).
        return (531.15, 531.15, 640 / 2, 480 / 2)

    def get_input_size(self):
        return self._size


class SceneDepthReader(DepthReader):
    """ICL-NUIM scene-directory reader: ASCII ``.depth`` files with
    euclidean ray lengths, converted to planar z
    (reference: interface.h:99-197)."""

    def __init__(self, dirname: str, fps: int = 0,
                 blocking_read: bool = False):
        super().__init__(fps, blocking_read)
        self._dir = dirname
        self._size = SCENE_SIZE
        self.camera_open = os.path.isdir(dirname)
        self.camera_active = self.camera_open
        if self.camera_open:
            self._frame = -1
        # Planarization factor (reference: interface.h:182-193).
        w, h = SCENE_SIZE
        fx, fy, cx, cy = SCENE_K
        u = np.arange(w, dtype=np.float32)[None, :]
        v = np.arange(h, dtype=np.float32)[:, None]
        ux = (u - cx) / fx
        vy = (v - cy) / fy
        self._planar = 1.0 / np.sqrt(ux * ux + vy * vy + 1.0)

    def read_next_depth_frame(self) -> Optional[np.ndarray]:
        self.get_next_frame()
        path = os.path.join(self._dir, "scene_00_%04d.depth" % self._frame)
        if not os.path.exists(path):
            return None
        w, h = self._size
        with open(path) as f:
            vals = np.array(f.read().split(), dtype=np.float32)
        depth = vals[: w * h].reshape(h, w)
        depth = depth * self._planar
        return (depth * 1000.0).astype(np.uint16)

    def get_k(self):
        # Positive-fy convention of the reference reader
        # (reference: interface.h:134-137).
        return (481.20, 480.00, 319.50, 239.50)

    def get_input_size(self):
        return self._size


class NativeBackedRawReader(DepthReader):
    """RawDepthReader drop-in whose frame payloads come from the native
    mmap/prefetch loader (slambench_tpu/native/slamio.cpp — the C++
    reader half, reference: interface.h:199-318) while the fps-pacing /
    frame-dropping semantics stay in the shared DepthReader base."""

    def __init__(self, filename: str, fps: int = 0,
                 blocking_read: bool = False):
        super().__init__(fps, blocking_read)
        from slambench_tpu.io import native
        self._native = native.NativeRawReader(filename)
        self._size = self._native.get_input_size()
        self.camera_open = True
        self.camera_active = True

    def read_next_depth_frame(self) -> Optional[np.ndarray]:
        self.get_next_frame()
        if self._frame < 0:
            return None
        return self._native.read_depth(self._frame)

    def get_k(self):
        return self._native.get_k()

    def get_input_size(self):
        return self._size

    def restart(self) -> None:
        super().restart()
        self._native.restart()


def _parse_scf(path: str) -> dict:
    """Parse a ``.scf`` scene-config file: ``key = value`` lines with
    relative paths resolved against the file's directory
    (reference: kfusion/src/reader.cpp:38-170)."""
    base = os.path.dirname(os.path.abspath(path))
    out = {}
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = re.match(r"([A-Za-z_]+)\s*=\s*(.*)", line)
        if m:
            key, val = m.group(1), m.group(2).strip().strip('"')
            if key in ("input_file", "input"):
                if not os.path.isabs(val):
                    val = os.path.join(base, val)
            out[key] = val
    return out


def make_reader(config) -> Optional[DepthReader]:
    """Reader factory with extension dispatch
    (reference: kfusion/src/reader.cpp:172-207 ``createReader``):
    ``.raw`` files -> RawDepthReader, directories -> SceneDepthReader,
    ``.scf`` -> parse and recurse."""
    path = config.input_file if hasattr(config, "input_file") else str(config)
    fps = getattr(config, "fps", 0)
    blocking = getattr(config, "blocking_read", False)
    if path.endswith(".scf"):
        scf = _parse_scf(path)
        inner = scf.get("input_file") or scf.get("input")
        if inner is None:
            return None
        if "camera" in scf and hasattr(config, "camera"):
            from slambench_tpu.config import parse_float4
            config.camera = parse_float4(scf["camera"])
            config.camera_overrided = True
        path = inner
    if os.path.isdir(path):
        return SceneDepthReader(path, fps, blocking)
    if os.path.isfile(path):
        # Prefer the native mmap/prefetch loader when libslamio builds
        # (SLAMBENCH_NATIVE_IO=0 forces the pure-numpy reader); fall back
        # gracefully if the toolchain or build is unavailable.
        if os.environ.get("SLAMBENCH_NATIVE_IO", "1") not in ("0", "off"):
            try:
                from slambench_tpu.io import native
                if native.available():
                    return NativeBackedRawReader(path, fps, blocking)
            except Exception:                      # noqa: BLE001
                pass
        return RawDepthReader(path, fps, blocking)
    return None
