"""Kernel timing harness.

The measured-profiling counterpart of the reference's profile-kernel
path (src/profile-kernel.cpp:197-313): warmup, n timed runs, full
sample statistics.  Hardware counters (libpfm4 there) map to the JAX
profiler here (see spmv_tpu.profile.report for the report shapes).

Remote-executed backends (this image tunnels to the TPU through a
relay) make per-call wall timing unreliable: dispatch returns before
the device finishes, and fetching large outputs prices the tunnel, not
the chip.  ``time_kernel`` therefore times a *chained* K-iteration jit
program whose output is reduced to a scalar, at two different K, and
uses the slope — device time per iteration with dispatch/transfer
overhead cancelled.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.utils.sample import Sample, compute_sample

__all__ = ["time_kernel", "profile_kernel_fn", "KernelTiming"]


@dataclasses.dataclass
class KernelTiming:
    """Per-iteration device time estimate plus raw run samples."""

    seconds_per_iteration: float
    k_small: int
    k_large: int
    runs_small: Sample
    runs_large: Sample

    def to_json(self) -> dict:
        return {
            "seconds_per_iteration": self.seconds_per_iteration,
            "k_small": self.k_small,
            "k_large": self.k_large,
            "runs_small_seconds": self.runs_small.to_json(),
            "runs_large_seconds": self.runs_large.to_json(),
        }


def _time_once(fn, args) -> float:
    t0 = time.perf_counter()
    out = fn(*args)
    # Force full execution: fetch the scalar to host.
    np.asarray(out)
    return time.perf_counter() - t0


def time_kernel(
    step: Callable,
    args: tuple,
    k_small: int = 2,
    k_large: int = 12,
    runs: int = 5,
    warmup: int = 1,
    min_signal_s: Optional[float] = None,
    max_chain_s: float = 4.0,
) -> KernelTiming:
    """Estimate seconds per iteration of ``step``.

    ``step(*args)`` must be a pure function whose output feeds the next
    iteration (the harness chains it with lax.fori_loop and reduces the
    final value to a scalar).  The first arg is the iterated value; the
    rest are loop constants.

    ``min_signal_s``: minimum required gap between the large and small
    chain's wall time.  Tunneled dispatch overhead is ~30 ms with
    multi-ms run-to-run variance, so a slope whose signal is smaller
    than that variance is noise (measured: the K=4/24 slope of a
    483 us kernel can read anywhere from 270 to 570 us).  When the gap
    is below this floor, ``k_large`` is extended (recompiling the
    chain) until the signal dominates.  Default: 0.06 s on non-CPU
    backends, off on CPU where dispatch is cheap and deterministic.
    """
    if min_signal_s is None:
        platform = jax.devices()[0].platform
        min_signal_s = 0.0 if platform == "cpu" else 0.06

    def chained(k):
        @jax.jit
        def run(*a):
            def body(_, v):
                return step(v, *a[1:])
            out = jax.lax.fori_loop(0, k, body, a[0])
            return _to_scalar(out)

        return run

    def _warm(fn):
        # The tunneled backend's remote-compile endpoint drops
        # connections under load ("broken pipe" / "response body
        # closed"); one delayed retry rides out the transient instead
        # of losing a whole measurement (observed repeatedly on this
        # chip; the self-healing window is tens of seconds).
        for attempt in (0, 1):
            try:
                for _ in range(warmup):
                    np.asarray(fn(*args))
                return
            except Exception as e:  # noqa: BLE001 — retry transport
                msg = str(e)
                transient = ("remote_compile" in msg
                             or "UNAVAILABLE" in msg
                             or "Broken pipe" in msg
                             or "response body closed" in msg)
                if attempt or not transient:
                    raise
                time.sleep(45)

    fn_s = chained(k_small)
    _warm(fn_s)
    t_small = [_time_once(fn_s, args) for _ in range(runs)]

    for _attempt in range(4):
        fn_l = chained(k_large)
        _warm(fn_l)
        t_large = [_time_once(fn_l, args) for _ in range(runs)]
        signal = min(t_large) - min(t_small)
        if (min_signal_s <= 0.0
                or signal >= min_signal_s
                or min(t_large) >= max_chain_s
                or k_large - k_small >= 65536):
            break
        # Signal below the overhead-variance floor: extend the chain.
        per_est = max(signal / (k_large - k_small),
                      min(t_large) / k_large / 8, 1e-7)
        k_large = k_small + max(
            min(int(np.ceil(min_signal_s / per_est)), 65536),
            2 * (k_large - k_small),
        )

    if min_signal_s > 0.0:
        # Re-measure the small chain AFTER the large phase and take
        # the min across both phases: sustained tunnel congestion
        # during only the small phase inflates min(t_small) and makes
        # the slope read FASTER than physically possible (observed: a
        # 443 us DIA SpMV reported as 340 us / 1.27x roofline).
        # Congestion during the large phase merely under-reports —
        # the safe direction — so only the small side needs the
        # second phase.
        t_small = t_small + [_time_once(fn_s, args)
                             for _ in range(runs)]

    per_iter = (min(t_large) - min(t_small)) / (k_large - k_small)
    per_iter = max(per_iter, 1e-12)
    return KernelTiming(
        seconds_per_iteration=per_iter,
        k_small=k_small,
        k_large=k_large,
        runs_small=compute_sample(t_small, unit="s"),
        runs_large=compute_sample(t_large, unit="s"),
    )


def _to_scalar(out):
    leaves = jax.tree_util.tree_leaves(out)
    acc = None
    for l in leaves:
        s = jnp.sum(l).astype(jnp.float32)
        acc = s if acc is None else acc + s
    return acc


def profile_kernel_fn(
    fn: Callable,
    args: tuple,
    runs: int = 10,
    warmup: bool = True,
    between_runs: Optional[Callable] = None,
) -> Sample:
    """Direct n-run wall timing of fn(*args) -> scalar-reducible output.

    The plain analogue of profile_kernel (one timed kernel.run per run,
    profile-kernel.cpp:137-179).  On tunneled backends prefer
    ``time_kernel``.
    """
    jitted = jax.jit(lambda *a: _to_scalar(fn(*a)))
    if warmup:
        np.asarray(jitted(*args))
    times = []
    for _ in range(runs):
        if between_runs is not None:
            # The analogue of the reference's cache flushing between
            # profiled runs (profile-kernel.cpp:181-192).
            between_runs()
        times.append(_time_once(jitted, args))
    return compute_sample(times, unit="s")
