"""ctypes bindings for the native runtime components (native/fastio.cc).

Builds the shared library on first use with g++ (cached next to the sources);
every entry point degrades gracefully to the NumPy implementation when no
compiler is available, so the framework stays importable anywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "native", "fastio.cc")
_LIB = os.path.join(_ROOT, "native", "libfastio.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(
            _SRC
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            for suffix, ptr_t in (("f64", ctypes.c_double), ("f32", ctypes.c_float)):
                fn = getattr(lib, f"fastio_savetxt_{suffix}")
                fn.restype = ctypes.c_int
                fn.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ptr_t),
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.c_char_p,
                    ctypes.c_char_p,
                ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def savetxt(path: str, arr: np.ndarray, fmt: str = "%.18e", append: bool = False):
    """Drop-in np.savetxt for 1-D/2-D float arrays (space sep, one row per
    line — the reference artifact format)."""
    a = np.ascontiguousarray(arr)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError("savetxt supports 1-D/2-D arrays")
    lib = _load()
    mode = b"ab" if append else b"wb"
    if lib is not None and a.dtype in (np.float32, np.float64):
        suffix = "f32" if a.dtype == np.float32 else "f64"
        fn = getattr(lib, f"fastio_savetxt_{suffix}")
        ptr_t = ctypes.c_float if a.dtype == np.float32 else ctypes.c_double
        rc = fn(
            path.encode(),
            a.ctypes.data_as(ctypes.POINTER(ptr_t)),
            a.shape[0],
            a.shape[1],
            fmt.encode(),
            mode,
        )
        if rc == 0:
            return
        # fall through to numpy on any IO error
    with open(path, mode.decode().replace("b", "") + "b") as f:
        np.savetxt(f, a, fmt=fmt)


def available() -> bool:
    return _load() is not None
