"""ctypes bridge to the native partitioner cores (csrc/partition.cpp).

Same on-demand build + graceful-degradation pattern as
models._cw_native: ``available()`` is False without a compiler, and
``partition_graph`` falls back to the pure-Python matching/FM loops.
``hem_match`` is bit-identical to the Python loop for the same visit
order (pinned by tests/test_reorder_quality.py); ``fm_refine`` runs
the same algorithm but its heap breaks equal-gain ties by LARGEST
node id where Python's heapq breaks them by smallest, so refined
partitions can differ between the two implementations (the test
bounds the cut gap instead of asserting equality).

The native cores replace exactly the two per-node/per-move Python
loops that dominated wall time on irregular graphs (100k-row
random_sparse at P=8: 181 s python -> ~2 s native; the vectorized
numpy coarsening/contraction/recursion stays in reorder.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["available", "hem_match", "fm_refine"]

_CSRC_DIR = os.path.join(
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
    "csrc",
)
_LIB_PATH = os.path.join(_CSRC_DIR, "build", "libpartition.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_I64P = ctypes.POINTER(ctypes.c_int64)
_U8P = ctypes.POINTER(ctypes.c_uint8)


def _build_lib() -> bool:
    src = os.path.join(_CSRC_DIR, "partition.cpp")
    if not os.path.exists(src):
        return False
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-std=c++17", "-fPIC", "-shared",
        "-o", _LIB_PATH, src,
    ]
    try:
        # makedirs inside the try: a read-only package directory must
        # degrade to the Python fallback, not raise out of available()
        os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
        subprocess.run(cmd, check=True, capture_output=True,
                       timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            if not _build_lib():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.hem_match.restype = ctypes.c_int64
        lib.hem_match.argtypes = [
            ctypes.c_int64, _I64P, _I64P, _I64P, _I64P, _I64P,
        ]
        lib.fm_refine.restype = ctypes.c_int64
        lib.fm_refine.argtypes = [
            ctypes.c_int64, _I64P, _I64P, _I64P, _I64P, _U8P,
            ctypes.c_double, ctypes.c_double, ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _i64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def hem_match(ptr, adj, wgt, order):
    """Greedy heavy-edge matching; returns (cid, nc)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native partition unavailable")
    ptr = _i64(ptr)
    adj = _i64(adj)
    wgt = _i64(wgt)
    order = _i64(order)
    n = ptr.size - 1
    cid = np.empty(n, dtype=np.int64)
    nc = lib.hem_match(
        n,
        ptr.ctypes.data_as(_I64P), adj.ctypes.data_as(_I64P),
        wgt.ctypes.data_as(_I64P), order.ctypes.data_as(_I64P),
        cid.ctypes.data_as(_I64P),
    )
    return cid, int(nc)


def fm_refine(ptr, adj, wgt, vwgt, side, limit_a, limit_b,
              passes=4):
    """Boundary FM passes; mutates and returns ``side`` (bool)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native partition unavailable")
    ptr = _i64(ptr)
    adj = _i64(adj)
    wgt = _i64(wgt)
    vwgt = _i64(vwgt)
    s8 = np.ascontiguousarray(side, dtype=np.uint8)
    lib.fm_refine(
        ptr.size - 1,
        ptr.ctypes.data_as(_I64P), adj.ctypes.data_as(_I64P),
        wgt.ctypes.data_as(_I64P), vwgt.ctypes.data_as(_I64P),
        s8.ctypes.data_as(_U8P),
        float(limit_a), float(limit_b), int(passes),
    )
    return s8.astype(bool)
