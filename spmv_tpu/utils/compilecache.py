"""Persistent XLA compilation cache wiring.

The reference's entire load->run workflow is milliseconds-to-seconds
(`/root/reference/src/matrix/matrix-market.cpp:777` ->
`/root/reference/src/profile-kernel.cpp:197`): it pays no compile tax,
so time-to-solution IS its product experience.  A fresh JAX process,
by contrast, pays the full Pallas/XLA compile (~9 s at the bench's
2 M-row shape) before the first useful FLOP.  Enabling JAX's
persistent compilation cache amortizes that across processes: measured
on the target chip, first-SpMV drops from 0.61 s (cold) to 0.16 s
(warm) at a 64 k-row DIA shape, and the bench's ``file_driven`` leg
reports the cold/warm pair at scale.

Called by the CLI entry point and ``bench.py``; library users can call
:func:`enable_persistent_cache` themselves (it is idempotent and safe
before or after backend initialization, as long as nothing was
compiled yet in this process).

Environment knobs:

- ``SPMV_TPU_CACHE_DIR`` — cache directory (default
  ``~/.cache/spmv_tpu/jax-cache``).
- ``SPMV_TPU_NO_CACHE=1`` — opt out entirely.
- ``JAX_COMPILATION_CACHE_DIR`` — if the user already set JAX's own
  knob, we leave it alone.
"""

from __future__ import annotations

import os

__all__ = ["enable_persistent_cache", "default_cache_dir"]

_ENABLED: str | None = None


def default_cache_dir() -> str:
    env = os.environ.get("SPMV_TPU_CACHE_DIR")
    if env:
        return env
    xdg = os.environ.get("XDG_CACHE_HOME")
    base = xdg if xdg else os.path.join(
        os.path.expanduser("~"), ".cache")
    return os.path.join(base, "spmv_tpu", "jax-cache")


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Returns the directory in use, or ``None`` when caching is disabled
    (``SPMV_TPU_NO_CACHE=1``) or the directory cannot be created.
    Respects a user-set ``JAX_COMPILATION_CACHE_DIR``.  Idempotent.
    """
    global _ENABLED
    if os.environ.get("SPMV_TPU_NO_CACHE", "") not in ("", "0"):
        return None
    if _ENABLED is not None:
        return _ENABLED
    import jax

    target = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not target:
        target = cache_dir if cache_dir else default_cache_dir()
    try:
        # private: the AOT trace cache under this directory stores
        # pickled treedefs, which must never be loadable from a
        # location other users can write to
        os.makedirs(target, mode=0o700, exist_ok=True)
    except OSError:
        return None
    jax.config.update("jax_compilation_cache_dir", target)
    # Cache everything: the default 1 s / small-entry floors skip
    # exactly the many medium-size kernels whose compiles sum to the
    # multi-second wall in front of the first SpMV.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _ENABLED = target
    return target
