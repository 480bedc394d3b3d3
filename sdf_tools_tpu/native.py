"""ctypes bindings for the native support library (native/sdf_native.cpp).

Auto-builds ``native/libsdf_native.so`` with make on first use (cached).
Falls back gracefully (``available() == False``) if no toolchain exists.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsdf_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    for name in ("edt_exact_i64", "edt_reference_i64"):
        fn = getattr(lib, name)
        fn.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64p]
        fn.restype = ctypes.c_int
    lib.zlib_compress_bound.argtypes = [ctypes.c_int64]
    lib.zlib_compress_bound.restype = ctypes.c_int64
    lib.zlib_compress.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int64]
    lib.zlib_compress.restype = ctypes.c_int64
    lib.zlib_decompress.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int64]
    lib.zlib_decompress.restype = ctypes.c_int64
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def edt_exact(mask: np.ndarray) -> np.ndarray:
    """Exact squared EDT (int64) of a 3D bool/uint8 mask; C++ Felzenszwalb."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    m = np.ascontiguousarray(mask, np.uint8)
    out = np.empty(m.shape, np.int64)
    rc = lib.edt_exact_i64(m, *m.shape, out)
    if rc != 0:
        raise RuntimeError("edt_exact_i64 failed")
    return out


def edt_reference(mask: np.ndarray) -> np.ndarray:
    """Reference-faithful bucket-queue EDT (int64 d^2; may overestimate)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    m = np.ascontiguousarray(mask, np.uint8)
    out = np.empty(m.shape, np.int64)
    rc = lib.edt_reference_i64(m, *m.shape, out)
    if rc != 0:
        raise RuntimeError("edt_reference_i64 failed")
    return out


def compress(data: bytes) -> bytes:
    lib = _load()
    if lib is None:
        import zlib

        return zlib.compress(data)
    src = np.frombuffer(data, np.uint8)
    cap = int(lib.zlib_compress_bound(len(data)))
    dst = np.empty(cap, np.uint8)
    n = int(lib.zlib_compress(src, len(data), dst, cap))
    if n < 0:
        raise RuntimeError("zlib_compress failed")
    return dst[:n].tobytes()


def decompress(data: bytes, expected_size: int) -> bytes:
    lib = _load()
    if lib is None:
        import zlib

        return zlib.decompress(data)
    src = np.frombuffer(data, np.uint8)
    dst = np.empty(expected_size, np.uint8)
    n = int(lib.zlib_decompress(src, len(data), dst, expected_size))
    if n < 0:
        raise RuntimeError("zlib_decompress failed")
    return dst[:n].tobytes()
