"""ctypes loader for the native I/O kernels (native/qkxtm_native.cpp).

Builds the shared library on first use with g++ (cached next to the
source, keyed on source mtime) and falls back to pure numpy when no
compiler is available — the same graceful degradation the reference's
CMake feature toggles provide (reference CMakeLists.txt:85-121).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "native", "qkxtm_native.cpp")
_SO = os.path.join(_HERE, "..", "native", "_qkxtm_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded native library, or None (numpy fallback)."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        stale = (not os.path.exists(_SO)
                 or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
        if stale and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        for name in ("be64_to_f64", "be32_to_f64", "f64_to_be64",
                     "f64_to_be32"):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                           ctypes.c_size_t, ctypes.c_int]
        _lib = lib
        return _lib


def decode_be(buf: bytes, precision: int) -> np.ndarray:
    """Big-endian f64/f32 payload → native float64 array (threaded
    native path when available)."""
    lib = get_lib()
    if precision == 64:
        n = len(buf) // 8
        if lib is None:
            return np.frombuffer(buf, dtype=">f8").astype(np.float64)
        out = np.empty(n, np.float64)
        src = np.frombuffer(buf, dtype=np.uint8)
        lib.be64_to_f64(src.ctypes.data, out.ctypes.data, n, 0)
        return out
    n = len(buf) // 4
    if lib is None:
        return np.frombuffer(buf, dtype=">f4").astype(np.float64)
    out = np.empty(n, np.float64)
    src = np.frombuffer(buf, dtype=np.uint8)
    lib.be32_to_f64(src.ctypes.data, out.ctypes.data, n, 0)
    return out


def encode_be(arr: np.ndarray, precision: int) -> bytes:
    """Native float64 array → big-endian f64/f32 payload."""
    arr = np.ascontiguousarray(arr, np.float64)
    lib = get_lib()
    if lib is None:
        dt = ">f8" if precision == 64 else ">f4"
        return arr.astype(dt).tobytes()
    if precision == 64:
        out = np.empty(arr.size, np.uint64)
        lib.f64_to_be64(arr.ctypes.data, out.ctypes.data, arr.size, 0)
    else:
        out = np.empty(arr.size, np.uint32)
        lib.f64_to_be32(arr.ctypes.data, out.ctypes.data, arr.size, 0)
    return out.tobytes()
