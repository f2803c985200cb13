"""Native (C++) runtime components, loaded via ctypes.

Compiled on first use with g++ into a cached shared library; every entry has
a pure-python fallback so the framework works without a toolchain.
"""

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_dir() -> str:
    d = os.path.join(os.path.dirname(__file__), "_build")
    os.makedirs(d, exist_ok=True)
    return d


def load_native_lib():
    """Returns the ctypes lib, building it if needed; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(os.path.dirname(__file__), "colmap_parser.cpp")
        out = os.path.join(_build_dir(), "libsgs_native.so")
        try:
            if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", out, src],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(out)
            lib.colmap_read_points3d.restype = ctypes.c_longlong
            lib.colmap_read_cameras.restype = ctypes.c_longlong
            lib.colmap_read_images.restype = ctypes.c_longlong
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB
