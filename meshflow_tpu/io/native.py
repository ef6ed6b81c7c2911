"""ctypes bindings for the native C++ video IO runtime.

native/videoio.cpp provides a libavformat/libavcodec decoder with a
background prefetch thread (decode overlaps device compute) and a matching
encoder.  When the shared library is present (scripts/build_native.sh),
io.video routes through it; otherwise everything falls back to cv2.
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "native",
    "libmeshflow_videoio.so",
)

_lib = None


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.mf_reader_open.restype = ctypes.c_void_p
    lib.mf_reader_open.argtypes = [ctypes.c_char_p]
    lib.mf_reader_info.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_uint),
    ]
    lib.mf_reader_read.restype = ctypes.c_long
    lib.mf_reader_read.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_long,
    ]
    lib.mf_reader_close.argtypes = [ctypes.c_void_p]
    lib.mf_writer_open.restype = ctypes.c_void_p
    lib.mf_writer_open.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_double,
        ctypes.c_uint,
    ]
    lib.mf_writer_write.restype = ctypes.c_long
    lib.mf_writer_write.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_long,
    ]
    lib.mf_writer_close.restype = ctypes.c_int
    lib.mf_writer_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


class NativeReader:
    """Streaming decoder with background prefetch."""

    def __init__(self, path: str):
        lib = load_library()
        if lib is None:
            raise IOError("native video IO library not built")
        self._lib = lib
        self._handle = lib.mf_reader_open(path.encode())
        if not self._handle:
            raise IOError(f"Could not open video at <{path}>.")
        w = ctypes.c_int()
        h = ctypes.c_int()
        fps = ctypes.c_double()
        nb = ctypes.c_long()
        fourcc = ctypes.c_uint()
        lib.mf_reader_info(
            self._handle,
            ctypes.byref(w), ctypes.byref(h), ctypes.byref(fps),
            ctypes.byref(nb), ctypes.byref(fourcc),
        )
        self.width = w.value
        self.height = h.value
        self.fps = fps.value
        self.num_frames = nb.value
        self.fourcc = int(fourcc.value)

    def read(self, max_frames: int) -> np.ndarray:
        """Up to max_frames BGR frames, (n, H, W, 3) uint8 (n=0 at EOF)."""
        buf = np.empty((max_frames, self.height, self.width, 3), np.uint8)
        got = self._lib.mf_reader_read(
            self._handle,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            max_frames,
        )
        return buf[:got]

    def close(self):
        if self._handle:
            self._lib.mf_reader_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class NativeWriter:
    def __init__(self, path: str, width: int, height: int, fps: float, fourcc: int):
        lib = load_library()
        if lib is None:
            raise IOError("native video IO library not built")
        self._lib = lib
        self._handle = lib.mf_writer_open(
            path.encode(), width, height, fps, fourcc & 0xFFFFFFFF
        )
        if not self._handle:
            raise IOError(f"Could not open a video encoder for <{path}>.")

    def write(self, frames: np.ndarray) -> int:
        frames = np.ascontiguousarray(frames, dtype=np.uint8)
        return self._lib.mf_writer_write(
            self._handle,
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            frames.shape[0],
        )

    def close(self) -> int:
        if self._handle:
            rc = self._lib.mf_writer_close(self._handle)
            self._handle = None
            return rc
        return 0

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
