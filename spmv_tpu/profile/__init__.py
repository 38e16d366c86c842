"""Measured profiling: timing harness, statistics, reports."""

from spmv_tpu.profile.harness import (
    time_kernel,
    profile_kernel_fn,
    KernelTiming,
)

__all__ = ["time_kernel", "profile_kernel_fn", "KernelTiming"]
