"""Native (C++) host-side components, loaded via ctypes.

Currently: the PCD IO fast path (pcd_io.cpp). The library auto-builds once
with the system compiler on first use (cached as libpcrtpu_native.so beside
the sources); every consumer has a pure-NumPy fallback, so the native layer
is an accelerator, never a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libpcrtpu_native.so")
_lib: ctypes.CDLL | None = None
_tried = False


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["sh", os.path.join(_DIR, "build.sh")],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.pcd_num_points.restype = ctypes.c_long
        lib.pcd_num_points.argtypes = [ctypes.c_char_p]
        lib.pcd_read_xyz.restype = ctypes.c_int
        lib.pcd_read_xyz.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
        ]
        lib.pcd_write_xyz.restype = ctypes.c_int
        lib.pcd_write_xyz.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib
