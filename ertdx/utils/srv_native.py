"""ctypes binding to the C++ .srv column reader (csrc/srv_reader.cpp).

Build with `make -C csrc` (produces ertdx/utils/_srv_reader.so). All
callers fall back to numpy parsing when the library is absent or a file
trips the parser, so the extension is a pure fast path (~40-100x over
np.genfromtxt on the 259-header survey files). The C ABI uses fixed-width
int64_t on both sides (never platform `long`, which is 32-bit on LLP64)."""
from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = Path(__file__).parent / "_srv_reader.so"
    if not so.exists():
        return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.srv_count_rows.restype = ctypes.c_int64
        lib.srv_count_rows.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.srv_read_column.restype = ctypes.c_int64
        lib.srv_read_column.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64]
        if hasattr(lib, "srv_count_batch"):
            lib.srv_count_batch.restype = ctypes.c_int64
            lib.srv_count_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64]
            lib.srv_read_batch.restype = ctypes.c_int64
            lib.srv_read_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def read_srv_column(path: str, skip_header: int,
                    usecols: int) -> Optional[np.ndarray]:
    """Returns the parsed column, or None to signal numpy fallback."""
    lib = _load()
    if lib is None:
        return None
    p = str(path).encode()
    n = lib.srv_count_rows(p, skip_header)
    if n < 0:
        return None
    out = np.empty(n, dtype=np.float64)
    got = lib.srv_read_column(
        p, skip_header, usecols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n)
    if got < 0:
        return None
    return out[:got]


def read_srv_batch(paths, skip_header: int, usecols: int,
                   return_counts: bool = False):
    """Parse MANY files with the C++ thread pool; returns the flat
    concatenation of every file's column (file order preserved) — or
    (flat, per-file row counts) with return_counts=True so callers can
    validate shape uniformity. None signals the per-file/numpy fallback.
    Prototypes are declared once in _load()."""
    lib = _load()
    if lib is None or not paths:
        return None
    if not hasattr(lib, "srv_count_batch"):      # stale .so: rebuild csrc
        return None

    n = len(paths)
    enc = [str(p).encode() for p in paths]
    arr = (ctypes.c_char_p * n)(*enc)
    counts = np.zeros(n, dtype=np.int64)
    counts_p = counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    if lib.srv_count_batch(arr, n, skip_header, counts_p, 0) != 0:
        return None
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    out = np.empty(int(counts.sum()), dtype=np.float64)
    rc = lib.srv_read_batch(
        arr, n, skip_header, usecols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        counts_p, 0)
    if rc != 0:
        return None
    return (out, counts) if return_counts else out
