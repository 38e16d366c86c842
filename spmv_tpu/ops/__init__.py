"""Compute kernels: SpMV / SpMM / triad, XLA and Pallas paths, solvers."""

from spmv_tpu.ops.spmv import spmv, spmv_padded, spmm, fast_spmv
from spmv_tpu.ops.triad import triad
from spmv_tpu.ops.eigen import (
    EigResult,
    dia_eigsh,
    lobpcg,
)
from spmv_tpu.ops.solvers import (
    batched_conjugate_gradient,
    bicgstab,
    conjugate_gradient,
    dia_batched_conjugate_gradient,
    dia_conjugate_gradient,
    extract_diagonal,
    jacobi_preconditioner,
    preconditioned_conjugate_gradient,
)
from spmv_tpu.ops.incomplete import (
    DeviceTriSolve,
    build_level_schedule,
    ic0_factor,
    ic0_preconditioner,
    ilu0_factor,
    ilu0_preconditioner,
    tri_solve_sweeps,
)
from spmv_tpu.ops.amg import (
    AmgHierarchy,
    amg_preconditioner,
    amg_solve,
    block_aggregation_setup,
    block_amg_preconditioner,
    smoothed_aggregation_setup,
)
from spmv_tpu.ops.fused_vcycle import (
    FusedVcycle,
    fused_block_setup,
    fused_vcycle,
    fused_vcycle_device,
    fused_vcycle_preconditioner,
)
from spmv_tpu.ops.krylov import chebyshev, gmres, lanczos_bounds
from spmv_tpu.ops.refine import RefineResult, iterative_refinement
from spmv_tpu.ops.pallas_kernels import dia_spmv, dia_spmv_padded, well_spmv, well_spmv_padded
from spmv_tpu.ops.traffic import (
    spmv_irregular_traffic,
    spmv_regular_traffic,
    traffic_variant_bytes,
)

__all__ = [
    "spmv", "spmv_padded", "spmm", "fast_spmv", "triad",
    "conjugate_gradient", "preconditioned_conjugate_gradient",
    "batched_conjugate_gradient", "dia_batched_conjugate_gradient",
    "lobpcg", "dia_eigsh", "EigResult",
    "dia_conjugate_gradient",
    "jacobi_preconditioner", "extract_diagonal",
    "dia_spmv", "dia_spmv_padded", "well_spmv", "well_spmv_padded",
    "spmv_regular_traffic", "spmv_irregular_traffic",
    "traffic_variant_bytes",
    "bicgstab", "ic0_factor", "ilu0_factor", "ic0_preconditioner",
    "ilu0_preconditioner", "DeviceTriSolve", "build_level_schedule",
    "tri_solve_sweeps",
    "gmres", "chebyshev", "lanczos_bounds",
    "iterative_refinement", "RefineResult",
    "amg_preconditioner", "smoothed_aggregation_setup",
    "AmgHierarchy",
    "amg_solve", "block_aggregation_setup",
    "block_amg_preconditioner",
    "FusedVcycle", "fused_block_setup", "fused_vcycle",
    "fused_vcycle_device", "fused_vcycle_preconditioner",
]
