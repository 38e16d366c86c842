"""Sparse matrix storage formats (the framework's "model families").

Host-side (numpy) containers for COO / CSR / ELLPACK / hybrid ELL+COO
with converters that reproduce the reference's layout semantics exactly
(row-aligned CSR padding, ELL pad-with-last-column or sentinel, hybrid
2/3-median split), plus row partitioners (equal-rows, as in the
reference, and nnz-balanced, the TPU upgrade) and bandwidth-reducing
reordering (RCM / graph partition).

Device-side pytree counterparts for JAX live in
``spmv_tpu.models.device``.
"""

from spmv_tpu.models.coo import CooMatrix
from spmv_tpu.models.csr import CsrMatrix
from spmv_tpu.models.dia import DiaMatrix
from spmv_tpu.models.well import WellMatrix
from spmv_tpu.models.wellcw import WellCwMatrix
from spmv_tpu.models.select import auto_format
from spmv_tpu.models.bsr import BsrMatrix
from spmv_tpu.models.ell import EllMatrix, ELL_PAD_SENTINEL
from spmv_tpu.models.hybrid import HybridMatrix
from spmv_tpu.models.partition import (
    rows_partition_equal,
    rows_partition_balanced_nnz,
    partition_bounds_to_sizes,
)

__all__ = [
    "CooMatrix",
    "CsrMatrix",
    "DiaMatrix",
    "WellMatrix",
    "WellCwMatrix",
    "auto_format",
    "BsrMatrix",
    "EllMatrix",
    "HybridMatrix",
    "ELL_PAD_SENTINEL",
    "rows_partition_equal",
    "rows_partition_balanced_nnz",
    "partition_bounds_to_sizes",
]
