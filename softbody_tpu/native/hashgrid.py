"""ctypes bindings for the native spatial-hash neighbor builder.

The shared library is compiled lazily on first use (g++ -O3) and cached next
to the source; everything degrades gracefully to the scipy/numpy fallbacks in
topology/neighbors.py when no compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "hashgrid.cc"
_LIB = _HERE / "_hashgrid.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", str(_LIB), str(_SRC)],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            return None
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int64)
        lib.nb_count.argtypes = [dp, ctypes.c_int64, ctypes.c_double, ip]
        lib.nb_count.restype = ctypes.c_int
        lib.nb_fill.argtypes = [dp, ctypes.c_int64, ctypes.c_double, ip, ip]
        lib.nb_fill.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def neighbor_csr(points: np.ndarray, radius: float):
    """(offsets (n+1,), indices) CSR neighbor structure within ``radius``."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native hashgrid unavailable")
    pts = np.ascontiguousarray(points, dtype=np.float64)
    n = len(pts)
    counts = np.zeros(n, dtype=np.int64)
    dp = pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    rc = lib.nb_count(dp, n, radius, counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        raise RuntimeError(f"nb_count failed: {rc}")
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    indices = np.zeros(int(offsets[-1]), dtype=np.int64)
    rc = lib.nb_fill(
        dp, n, radius,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise RuntimeError(f"nb_fill failed: {rc}")
    return offsets, indices


def neighbor_lists(points: np.ndarray, radius: float):
    """List-of-arrays API matching topology.neighbors.neighbor_lists."""
    offsets, indices = neighbor_csr(points, radius)
    return [indices[offsets[i]: offsets[i + 1]] for i in range(len(points))]
