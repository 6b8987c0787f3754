"""ctypes loader for the native host library (cbird_host.cpp).

Builds the shared library on first use with the system compiler (g++ -O3
-march=native) into the package directory; callers fall back to the pure
Python implementations when no compiler is available, so nothing here is a
hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "cbird_host.cpp")
_SO = os.path.join(_DIR, "libcbird_host.so")

_lib = None
_tried = False
_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
             "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        c = ctypes
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.cbird_jpeg_payload_offset.restype = c.c_int64
        lib.cbird_jpeg_payload_offset.argtypes = [u8p, c.c_int64]
        lib.cbird_window_compress.restype = c.c_int64
        lib.cbird_window_compress.argtypes = [u64p, c.c_int64, c.c_int,
                                              i32p, u64p]
        lib.cbird_hamming_scan.restype = c.c_int64
        lib.cbird_hamming_scan.argtypes = [u64p, u32p, c.c_int64, c.c_uint64,
                                           c.c_int, i32p, i32p, c.c_int64]
        lib.cbird_hamming_knn.restype = None
        lib.cbird_hamming_knn.argtypes = [u64p, u32p, c.c_int64, u64p,
                                          c.c_int64, c.c_int, i32p, i32p]
        lib.cbird_hamming256_knn.restype = None
        lib.cbird_hamming256_knn.argtypes = [u64p, u32p, c.c_int64, u64p,
                                             c.c_int64, c.c_int, i32p, i32p]
        _lib = lib
        return _lib


def jpeg_payload_offset(data: bytes) -> Optional[int]:
    lib = load()
    if lib is None:
        return None
    arr = np.frombuffer(data, dtype=np.uint8)
    return int(lib.cbird_jpeg_payload_offset(arr, len(arr)))


def window_compress(hashes: np.ndarray, threshold: int):
    lib = load()
    if lib is None:
        return None
    hashes = np.ascontiguousarray(hashes, dtype=np.uint64)
    n = len(hashes)
    if n == 0:
        return np.zeros(0, np.int32), np.zeros(0, np.uint64)
    out_f = np.zeros(n + 1, dtype=np.int32)
    out_h = np.zeros(n + 1, dtype=np.uint64)
    cnt = lib.cbird_window_compress(hashes, n, threshold, out_f, out_h)
    return out_f[:cnt].copy(), out_h[:cnt].copy()


def hamming_knn(hashes: np.ndarray, ids: np.ndarray, needles: np.ndarray,
                k: int):
    lib = load()
    if lib is None:
        return None
    hashes = np.ascontiguousarray(hashes, dtype=np.uint64)
    ids = np.ascontiguousarray(ids, dtype=np.uint32)
    needles = np.ascontiguousarray(needles, dtype=np.uint64)
    q = len(needles)
    out_i = np.zeros((q, k), dtype=np.int32)
    out_d = np.zeros((q, k), dtype=np.int32)
    lib.cbird_hamming_knn(hashes, ids, len(hashes), needles, q, k, out_i, out_d)
    return out_d, out_i
