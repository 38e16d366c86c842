"""ctypes bridge to the native simulation core (csrc/simcache.cpp).

Builds ``csrc/build/libsimcache.so`` on demand with g++ (no
pybind11/pip in this environment; plain C ABI + ctypes).  All entry
points degrade gracefully: ``available()`` is False when no compiler is
present, and callers fall back to the pure Python simulator.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["available", "replay_interleaved", "replay_single"]

_CSRC_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
)
_LIB_PATH = os.path.join(_CSRC_DIR, "build", "libsimcache.so")

# (refs_done, refs_total, is_warmup) — the SIGALRM-progress analogue
_PROGRESS_FN = ctypes.CFUNCTYPE(
    None, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int
)

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_CSRC_DIR, "simcache.cpp")
    if not os.path.exists(src):
        return False
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-std=c++17", "-fPIC", "-shared",
        "-o", _LIB_PATH, src,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
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
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            # binding raises AttributeError on a stale .so built from
            # pre-progress sources — fall back to the Python replay
            lib.simcache_replay_interleaved_progress
        except (OSError, AttributeError):
            return None
        lib.simcache_replay_interleaved_progress.restype = ctypes.c_int
        lib.simcache_replay_interleaved_progress.argtypes = [
            ctypes.c_int,      # policy
            ctypes.c_uint64,   # cache_lines
            ctypes.c_uint64,   # line_size
            ctypes.c_int,      # num_threads
            ctypes.POINTER(ctypes.c_uint64),   # addresses
            ctypes.POINTER(ctypes.c_int32),    # numa_domains
            ctypes.POINTER(ctypes.c_uint64),   # offsets
            ctypes.c_int,      # num_numa_domains
            ctypes.c_int,      # warmup
            ctypes.c_uint64,   # seed
            ctypes.POINTER(ctypes.c_int64),    # misses_out
            _PROGRESS_FN,      # progress callback (may be null)
            ctypes.c_uint64,   # progress_interval_ms
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def replay_interleaved(
    policy: int,
    cache_lines: int,
    line_size: int,
    strings: Sequence[Tuple[np.ndarray, np.ndarray]],
    num_numa_domains: int,
    warmup: bool = False,
    seed: int = 1,
    progress=None,
    progress_interval: float = 0.0,
) -> np.ndarray:
    """Run the interleaved replay in C++; returns (P, domains) int64."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native simcache library unavailable")
    P = len(strings)
    offsets = np.zeros(P + 1, dtype=np.uint64)
    for p, (a, _) in enumerate(strings):
        offsets[p + 1] = offsets[p] + a.size
    total = int(offsets[-1])
    addresses = np.empty(total, dtype=np.uint64)
    numas = np.empty(total, dtype=np.int32)
    for p, (a, d) in enumerate(strings):
        lo, hi = int(offsets[p]), int(offsets[p + 1])
        addresses[lo:hi] = a
        numas[lo:hi] = d

    misses = np.zeros(P * num_numa_domains, dtype=np.int64)
    cb = _PROGRESS_FN()
    if progress is not None and progress_interval > 0:
        def _cb(done, total, is_warmup):
            progress(int(done), int(total), bool(is_warmup))
        cb = _PROGRESS_FN(_cb)
    rc = lib.simcache_replay_interleaved_progress(
        int(policy),
        int(cache_lines),
        int(line_size),
        P,
        addresses.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        numas.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        int(num_numa_domains),
        1 if warmup else 0,
        int(seed) & 0xFFFFFFFFFFFFFFFF,
        misses.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cb,
        int(progress_interval * 1000),
    )
    if rc != 0:
        raise RuntimeError(f"simcache_replay_interleaved failed: rc={rc}")
    return misses.reshape(P, num_numa_domains)


def replay_single(
    policy: int,
    cache_lines: int,
    line_size: int,
    addresses: np.ndarray,
    numa_domains: np.ndarray,
    num_numa_domains: int,
    seed: int = 1,
) -> np.ndarray:
    out = replay_interleaved(
        policy, cache_lines, line_size,
        [(addresses, numa_domains)], num_numa_domains, seed=seed,
    )
    return out[0]
