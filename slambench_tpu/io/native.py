"""ctypes bindings to the native IO library (libslamio.so).

The native layer is the TPU-framework equivalent of the reference's C++
readers (reference: kfusion/include/interface.h): a memory-mapped RAW
container with next-frame prefetch, a fast ASCII .depth parser and the
euclidean->planar converter. Python falls back to the pure-numpy readers
when the library has not been built (``make -C slambench_tpu/native``);
``NativeRawReader`` is a drop-in for ``RawDepthReader``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_LIB_DIR, "libslamio.so"))
_lib = None


def _load(build_if_missing: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        try:
            subprocess.run(["make", "-C", os.path.abspath(_LIB_DIR)],
                           check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, OSError):
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.slamio_open_raw.restype = ctypes.c_void_p
    lib.slamio_open_raw.argtypes = [ctypes.c_char_p]
    lib.slamio_close.argtypes = [ctypes.c_void_p]
    lib.slamio_raw_info.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint64)]
    lib.slamio_depth_ptr.restype = ctypes.POINTER(ctypes.c_uint16)
    lib.slamio_depth_ptr.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.slamio_rgb_ptr.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.slamio_rgb_ptr.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.slamio_read_depth.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint16)]
    lib.slamio_write_frame.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_uint8)]
    lib.slamio_parse_depth_ascii.restype = ctypes.c_int64
    lib.slamio_parse_depth_ascii.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.slamio_planarize_mm.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint16),
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeRawReader:
    """Zero-copy mmap'd RAW reader with OS prefetch; same surface as
    ``slambench_tpu.io.readers.RawDepthReader``."""

    def __init__(self, filename: str, fps: int = 0,
                 blocking_read: bool = False):
        lib = _load()
        if lib is None:
            raise RuntimeError("libslamio.so not available")
        self._lib = lib
        self._h = lib.slamio_open_raw(filename.encode())
        if not self._h:
            raise IOError(f"cannot open RAW file {filename}")
        w = ctypes.c_uint32()
        h = ctypes.c_uint32()
        n = ctypes.c_uint64()
        lib.slamio_raw_info(self._h, ctypes.byref(w), ctypes.byref(h),
                            ctypes.byref(n))
        self._size = (w.value, h.value)
        self.n_frames = n.value
        self._frame = -1
        self._fps = fps
        self._blocking = blocking_read
        self.camera_open = True
        self.camera_active = True

    def get_input_size(self) -> Tuple[int, int]:
        return self._size

    def get_k(self):
        return (531.15, 531.15, 640 / 2, 480 / 2)

    def restart(self):
        self._frame = -1

    def read_next_depth_frame(self) -> Optional[np.ndarray]:
        self._frame += 1
        return self.read_depth(self._frame)

    def read_depth(self, frame: int) -> Optional[np.ndarray]:
        """Zero-copy view into the mapping (valid until close)."""
        p = self._lib.slamio_depth_ptr(self._h, frame)
        if not p:
            return None
        w, h = self._size
        return np.ctypeslib.as_array(p, shape=(h, w))

    def close(self):
        if self._h:
            self._lib.slamio_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def parse_depth_ascii(path: str, n: int) -> Optional[np.ndarray]:
    """Fast ASCII .depth parse; returns float32 [n] or None."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(n, np.float32)
    got = lib.slamio_parse_depth_ascii(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n)
    if got < n:
        return None
    return out


def planarize_mm(euclid: np.ndarray, fx: float, fy: float,
                 cx: float, cy: float) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    h, w = euclid.shape
    euclid = np.ascontiguousarray(euclid, np.float32)
    out = np.empty((h, w), np.uint16)
    lib.slamio_planarize_mm(
        euclid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        w, h, fx, fy, cx, cy)
    return out


def write_frame(path: str, append: bool, depth_mm: np.ndarray,
                rgb: Optional[np.ndarray] = None) -> bool:
    lib = _load()
    if lib is None:
        return False
    h, w = depth_mm.shape
    depth_mm = np.ascontiguousarray(depth_mm, np.uint16)
    rgb_ptr = None
    if rgb is not None:
        rgb = np.ascontiguousarray(rgb, np.uint8)
        rgb_ptr = rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    rc = lib.slamio_write_frame(
        path.encode(), 1 if append else 0, w, h,
        depth_mm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), rgb_ptr)
    return rc == 0
