"""spmv_tpu — a TPU-native sparse linear-algebra framework.

A from-scratch reimplementation of the capabilities of the reference C++
tool ``jamtrott/spmv-cache-trace`` (see SURVEY.md), redesigned TPU-first:

- ``spmv_tpu.io``        Matrix Market ingestion (.mtx / .mtx.gz /
                         SuiteSparse .tar.gz), symmetry handling,
                         reordering suffixes (``__RCM`` / ``__GP<n>``).
- ``spmv_tpu.models``    Sparse storage formats: the reference's
                         COO / CSR / ELLPACK / hybrid plus the
                         TPU-native DIA, WELL and BSR, as host-side
                         dataclasses with device (pytree) counterparts;
                         row partitioners, RCM/GP/sigma reordering, and
                         automatic format selection (``auto_format``).
- ``spmv_tpu.ops``       SpMV / SpMM / triad compute kernels: XLA
                         (gather + segment-sum) paths and Pallas TPU
                         kernels, and iterative solvers built on them.
- ``spmv_tpu.parallel``  Mesh construction, sharded (multi-chip /
                         multi-host) SpMV via shard_map with halo
                         exchange, and the communication-volume model.
- ``spmv_tpu.perfmodel`` The performance-model subsystem: machine-model
                         config (the analogue of the reference's JSON
                         trace config), per-kernel memory reference
                         strings, multi-level cache simulation
                         (LRU/FIFO/RAND) with NUMA attribution, and the
                         TPU HBM<->VMEM tiling / roofline model.
- ``spmv_tpu.profile``   Measured profiling: warmup + n-run timing with
                         full sample statistics and JSON reports in the
                         reference's report shapes.

The command-line driver lives in ``spmv_tpu.cli`` (``python -m spmv_tpu``).
"""

__version__ = "0.5.0"

from spmv_tpu.errors import (
    SpmvError,
    MatrixError,
    KernelError,
    TraceConfigError,
)

__all__ = [
    "SpmvError",
    "MatrixError",
    "KernelError",
    "TraceConfigError",
    "__version__",
]
