"""Native (C++) runtime components.

- ``videoio.cpp`` → ``libvideoio.so``: threaded FFmpeg decode + prefetch
  ring (the reference's VideoCapture runtime, made asynchronous). Loaded via
  ctypes; auto-built with the in-tree Makefile on first use.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_DIR, "libvideoio.so")


def build(force: bool = False) -> str | None:
    """Compile libvideoio.so (returns path, or None if the build fails)."""
    src = os.path.join(_DIR, "videoio.cpp")
    if not force and os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(src):
        return _LIB
    try:
        subprocess.run(
            ["make", "-C", _DIR, "libvideoio.so"],
            check=True,
            capture_output=True,
            text=True,
        )
        return _LIB
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


_lib = None


def load():
    """ctypes handle to the native library (builds on demand); None if
    unavailable (callers fall back to cv2)."""
    global _lib
    if _lib is not None:
        return _lib
    path = build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.vio_open.restype = ctypes.c_void_p
    lib.vio_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.vio_info.restype = ctypes.c_int
    lib.vio_info.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.vio_read_batch.restype = ctypes.c_long
    lib.vio_read_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_long,
    ]
    lib.vio_close.argtypes = [ctypes.c_void_p]
    lib.vio_writer_open.restype = ctypes.c_void_p
    lib.vio_writer_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_double,
    ]
    lib.vio_writer_write.restype = ctypes.c_int
    lib.vio_writer_write.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long,
    ]
    lib.vio_writer_close.restype = ctypes.c_int
    lib.vio_writer_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class VideoWriter:
    """Native MJPEG/AVI writer (cv::VideoWriter MJPG parity; the container+
    codec the reference uses for fgavi/btavi, trackingMain.cpp:168-215).
    Same call surface as cv2.VideoWriter: ``write(bgr_u8_hwc)`` /
    ``release()``. Raises if the native library is unavailable — callers
    (runner/cli._writer) fall back to cv2."""

    def __init__(self, path: str, fps: float, size):  # size = (w, h)
        import numpy as np

        self._np = np
        lib = load()
        if lib is None:
            raise RuntimeError("native videoio unavailable")
        self._lib = lib
        self.w, self.h = int(size[0]), int(size[1])
        self._h = lib.vio_writer_open(
            str(path).encode(), self.w, self.h, float(fps)
        )
        if not self._h:
            raise RuntimeError(f"vio_writer_open failed for {path}")

    def write(self, frame) -> None:
        np = self._np
        arr = np.ascontiguousarray(frame, dtype=np.uint8)
        if arr.ndim == 2:  # gray → BGR, as cv2.VideoWriter(isColor=True) expects 3ch
            arr = np.repeat(arr[:, :, None], 3, axis=2)
        assert arr.shape == (self.h, self.w, 3), (arr.shape, (self.h, self.w))
        ptr = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
        if self._lib.vio_writer_write(self._h, ptr, 1) != 0:
            raise RuntimeError("vio_writer_write failed")

    def release(self) -> None:
        if self._h:
            rc = self._lib.vio_writer_close(self._h)
            self._h = None
            if rc != 0:
                raise RuntimeError("vio_writer_close failed")

    def isOpened(self) -> bool:  # cv2.VideoWriter API parity
        return self._h is not None
