"""Profiling report construction — the library form of the CLI's
profile-mode output.

The reference emits its profiling report from profile_kernel's result
(src/profile-kernel.cpp:376-391: trace_config, kernel, execution_time
statistics, per-event blocks).  This module builds the same document
shape for any kernel, so programs embedding the framework get reports
without going through the CLI.
"""

from __future__ import annotations

from typing import Optional

from spmv_tpu.profile.xplane import profiling_events_section
from spmv_tpu.utils.sample import Sample, compute_sample

__all__ = ["profiling_report"]


def profiling_report(
    kernel,
    runs_sample: Sample,
    seconds_per_iteration: float,
    num_runs: int,
    warmup: bool,
    flush_caches: bool = False,
    trace_config=None,
    jax_profile_dir: Optional[str] = None,
    machine=None,
    op_info: Optional[dict] = None,
    flops_per_run: Optional[int] = None,
    bytes_per_run: Optional[int] = None,
) -> dict:
    """Assemble the profiling JSON document.

    ``kernel`` is a spmv_tpu.kernels.Kernel (describe / bytes_per_run /
    flops_per_run); ``runs_sample`` the wall-time statistics of the N
    runs; ``seconds_per_iteration`` the chained device-time estimate
    (the honest number on tunneled backends).
    """
    import jax

    from spmv_tpu.perfmodel.tiling import TPU_V5E, roofline_time

    machine = machine or TPU_V5E
    flops = (flops_per_run if flops_per_run is not None
             else kernel.flops_per_run())
    if bytes_per_run is not None:
        nbytes = bytes_per_run
        stream, resident = nbytes, 0
    else:
        nbytes = kernel.bytes_per_run()
        stream, resident = kernel.traffic_split()
    # residency-aware speed-of-light: the chained iterate stays
    # on-chip when it fits (roofline_time folds it back into the
    # stream at the measured r+w rate otherwise)
    roof = roofline_time(stream, flops, machine=machine,
                         resident_rw_bytes=resident)
    dev = jax.devices()[0]
    t = seconds_per_iteration
    return {
        "op": op_info or {"kind": "spmv"},
        "trace_config": (
            trace_config.to_json() if trace_config is not None else None
        ),
        "kernel": kernel.describe(),
        "warmup": bool(warmup),
        "flush_caches": bool(flush_caches),
        "runs": num_runs,
        "device": {
            "platform": dev.platform,
            "device_kind": dev.device_kind,
        },
        "jax_profile_dir": jax_profile_dir,
        # Measured per-kernel device events parsed from the xplane
        # capture — the reference's profiling_events section
        # (profile-kernel.cpp:376-391) with device kernels in place of
        # perf counter groups.  None without --jax-profile.
        "profiling_events": profiling_events_section(jax_profile_dir),
        # Reference report shape (profile-kernel.cpp:376-391): wall
        # times of N whole runs in NANOSECONDS, the reference's unit
        # (duration_type, sample.hpp print via operator<< "ns").  On a
        # tunneled backend these include dispatch/fetch; the chained
        # estimate isolates device time.
        "execution_time": compute_sample(
            [t * 1e9 for t in runs_sample.values], unit="ns"
        ).to_json(),
        "device_seconds_per_iteration": t,
        "roofline": roof,
        "achieved": {
            "gflop_per_s": flops / t / 1e9,
            "gb_per_s_modeled": nbytes / t / 1e9,
            "fraction_of_roofline": roof["time_roofline_s"] / t,
        },
    }
