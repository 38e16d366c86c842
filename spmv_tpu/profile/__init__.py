"""Measured profiling: timing harness, statistics, reports."""

from spmv_tpu.profile.harness import (
    time_kernel,
    profile_kernel_fn,
    KernelTiming,
)
from spmv_tpu.profile.report import profiling_report
from spmv_tpu.profile.xplane import (
    summarize_xplane,
    profiling_events_section,
    list_profile_events,
    hlo_bytes_accessed,
)

__all__ = [
    "time_kernel",
    "profile_kernel_fn",
    "KernelTiming",
    "profiling_report",
    "summarize_xplane",
    "profiling_events_section",
    "list_profile_events",
    "hlo_bytes_accessed",
]
