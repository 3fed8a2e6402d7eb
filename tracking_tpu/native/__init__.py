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
    _lib = lib
    return lib
