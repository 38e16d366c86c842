"""AOT trace cache: skip Python tracing / Mosaic lowering on warm runs.

The persistent XLA compilation cache (``compilecache.py``) removes the
backend-compile cost of a fresh process, but JAX still has to *trace
and lower* every kernel before it can even look the program up: for
the heavily-unrolled WELL-CW kernels that Python-side work is ~4 s per
process at a 16 k-row shape (measured; it grows with the unroll
factors, not the matrix), which kept warm time-to-solution seconds
away from the reference's milliseconds-to-run product experience
(`/root/reference/src/main.cpp:166-259` pays no equivalent cost).

This module caches the *trace* the same way the compilation cache
caches the executable: on the first call at a given input signature
the function is exported (`jax.export`) and the serialized StableHLO
is written next to the compilation cache; later processes deserialize
it (~3 ms) and compile it (persistent-cache hit, ~40 ms) without ever
running the Python tracer.  Measured warm path for the WELL-CW SpMV:
5.5 s -> 0.04 s.

Keying: function name + the defining module's source bytes (so any
kernel edit invalidates the entry) + jax version + device platform +
input avals/treedef + static kwargs.  Entries are tiny (~0.5 MB).

The cache is only consulted at top level (never under a trace — inner
calls inside a user's ``jit``/``scan`` keep normal inlining) and only
when the persistent compilation cache is enabled; ``SPMV_TPU_NO_CACHE=1``
disables both.
"""

from __future__ import annotations

import hashlib
import os
import threading

__all__ = ["aot_call", "aot_enabled", "clear_memo"]

_MEMO: dict = {}
_SRC_HASH: dict = {}
_LOCK = threading.Lock()


def aot_enabled() -> bool:
    return os.environ.get("SPMV_TPU_NO_CACHE", "") in ("", "0") and \
        os.environ.get("SPMV_TPU_NO_AOT_CACHE", "") in ("", "0")


def clear_memo() -> None:
    with _LOCK:
        _MEMO.clear()


def _module_source_hash(fn) -> str:
    """Hash of the ENTIRE spmv_tpu package source plus the wrapped
    function's own module.

    Hashing only the function's module is not enough: the traced
    computation also depends on imported code (packing semantics in
    models/, LANE/round_up constants, ...), and a stale StableHLO blob
    would silently compute with old kernel logic after such an edit.
    The package-wide hash invalidates on ANY library change — coarse
    but safe, and computed once per process (~1 MB of reads)."""
    mod = getattr(fn, "__module__", None) or "?"
    with _LOCK:
        h = _SRC_HASH.get(mod)
    if h is not None:
        return h
    try:
        import importlib

        hasher = hashlib.sha256()
        import spmv_tpu

        pkg_root = os.path.dirname(os.path.abspath(spmv_tpu.__file__))
        for dirpath, dirnames, filenames in sorted(os.walk(pkg_root)):
            dirnames.sort()
            for name in sorted(filenames):
                if name.endswith(".py"):
                    with open(os.path.join(dirpath, name), "rb") as f:
                        hasher.update(f.read())
        m = importlib.import_module(mod)
        if m.__file__ and not m.__file__.startswith(pkg_root):
            with open(m.__file__, "rb") as f:
                hasher.update(f.read())
        h = hasher.hexdigest()[:16]
    except Exception:  # noqa: BLE001 — unhashable module: never cache
        h = None
    with _LOCK:
        _SRC_HASH[mod] = h
    return h


def _cache_dir() -> str | None:
    from spmv_tpu.utils.compilecache import enable_persistent_cache

    base = enable_persistent_cache()
    if base is None:
        return None
    d = os.path.join(base, "aot-trace")
    try:
        os.makedirs(d, exist_ok=True)
    except OSError:
        return None
    return d


def _at_top_level() -> bool:
    try:
        from jax._src import core as _core

        return _core.trace_state_clean()
    except Exception:  # noqa: BLE001 — private API moved: be safe
        return False


def aot_call(name: str, fn, args: tuple, **static_kwargs):
    """Call ``fn(*args, **static_kwargs)`` through the AOT trace cache.

    ``fn`` must be functionally pure in ``args`` (a pytree of arrays)
    with hashable ``static_kwargs``.  Falls back to a plain call when
    caching is disabled, the call happens under a trace, or anything
    about the entry is unusable (wrong platform, stale format, ...).
    """
    if not (aot_enabled() and _at_top_level()):
        return fn(*args, **static_kwargs)
    src = _module_source_hash(fn)
    d = _cache_dir()
    if src is None or d is None:
        return fn(*args, **static_kwargs)
    import jax

    flat, treedef = jax.tree.flatten(args)
    try:
        dev = jax.devices()[0]
        platform = dev.platform
        sig = "|".join([
            name, src, jax.__version__, platform,
            getattr(dev, "device_kind", "?"),
            str(treedef),
            ";".join(f"{a.shape}:{a.dtype}" for a in flat),
            repr(sorted(static_kwargs.items())),
        ])
    except Exception:  # noqa: BLE001 — unkeyable: plain call
        return fn(*args, **static_kwargs)
    key = name + "-" + hashlib.sha256(sig.encode()).hexdigest()[:24]
    with _LOCK:
        cached = _MEMO.get(key)
    if cached is not None:
        return jax.tree.unflatten(cached[1], cached[0](*flat))

    from jax import export as jexport

    path = os.path.join(d, key + ".jaxexport")
    exp = None
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                exp = jexport.deserialize(bytearray(f.read()))
        except Exception:  # noqa: BLE001 — stale/corrupt entry
            exp = None
    out_treedef_path = path + ".outtree"
    if exp is not None:
        try:
            import pickle

            with open(out_treedef_path, "rb") as f:
                out_treedef = pickle.load(f)
            call = jax.jit(exp.call)
            out_leaves = call(*flat)
            with _LOCK:
                _MEMO[key] = (call, out_treedef)
            return jax.tree.unflatten(out_treedef, out_leaves)
        except Exception:  # noqa: BLE001 — fall through to re-trace
            pass

    # Miss: trace ONCE through export (the trace is the expensive
    # part), capturing the output treedef as a trace-time side effect;
    # input containers flatten away, so only that treedef needs
    # persisting (pickled next to the blob).
    box = {}

    def flat_fn(*leaves):
        res = fn(*jax.tree.unflatten(treedef, leaves),
                 **static_kwargs)
        out_leaves, box["out_treedef"] = jax.tree.flatten(res)
        return out_leaves

    try:
        import pickle

        exp = jexport.export(jax.jit(flat_fn))(*flat)
        out_treedef = box["out_treedef"]
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(exp.serialize())
        os.replace(tmp, path)
        tmp2 = out_treedef_path + f".tmp{os.getpid()}"
        with open(tmp2, "wb") as f:
            pickle.dump(out_treedef, f)
        os.replace(tmp2, out_treedef_path)
        call = jax.jit(exp.call)
        with _LOCK:
            _MEMO[key] = (call, out_treedef)
        _prune(d)
        return jax.tree.unflatten(out_treedef, call(*flat))
    except Exception:  # noqa: BLE001 — export unsupported: plain path
        return fn(*args, **static_kwargs)


_MAX_ENTRIES = 128


def _prune(d: str) -> None:
    """Keep the newest _MAX_ENTRIES blobs (every distinct shape
    signature writes one; unbounded growth would otherwise accrete in
    the user's cache dir).  Best-effort."""
    try:
        blobs = [os.path.join(d, n) for n in os.listdir(d)
                 if n.endswith(".jaxexport")]
        if len(blobs) <= _MAX_ENTRIES:
            return
        blobs.sort(key=os.path.getmtime)
        for path in blobs[: len(blobs) - _MAX_ENTRIES]:
            for p in (path, path + ".outtree"):
                try:
                    os.remove(p)
                except OSError:
                    pass
    except OSError:
        pass
