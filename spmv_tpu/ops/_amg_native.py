"""ctypes bridge to the native SA-AMG aggregation (csrc/amg.cpp).

Same on-demand build + graceful-degradation pattern as
spmv_tpu.ops._ic_native: ``available()`` is False without a compiler
and ops.amg falls back to the pure-Python aggregation loop (whose
semantics the native pass mirrors exactly — lockstep-tested in
tests/test_amg.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["available", "aggregate"]

_CSRC_DIR = os.path.join(
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
    "csrc",
)
_LIB_PATH = os.path.join(_CSRC_DIR, "build", "libamg.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_lib() -> bool:
    src = os.path.join(_CSRC_DIR, "amg.cpp")
    if not os.path.exists(src):
        return False
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-std=c++17", "-fPIC", "-shared",
        "-o", _LIB_PATH, src,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True,
                       timeout=120)
    except (OSError, subprocess.SubprocessError):
        return False
    return True


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        src = os.path.join(_CSRC_DIR, "amg.cpp")
        stale = (
            not os.path.exists(_LIB_PATH)
            or (os.path.exists(src)
                and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))
        )
        if stale and not _build_lib():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.spmv_amg_aggregate.argtypes = [
            ctypes.c_int64, i64p, i32p, i64p, i64p]
        lib.spmv_amg_aggregate.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def aggregate(rp: np.ndarray, cols: np.ndarray):
    """Greedy aggregation over a strength-graph CSR; returns
    (agg ids (n,), count) like ops.amg._aggregate_py."""
    lib = _load()
    assert lib is not None
    n = len(rp) - 1
    rp = np.ascontiguousarray(rp, np.int64)
    cols = np.ascontiguousarray(cols, np.int32)
    agg = np.empty(n, np.int64)
    scratch = np.empty(n, np.int64)
    cnt = lib.spmv_amg_aggregate(
        n,
        rp.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        agg.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return agg, int(cnt)
