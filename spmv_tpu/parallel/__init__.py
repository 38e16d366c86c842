"""Multi-chip / multi-host parallel SpMV.

The reference's only parallelism is OpenMP fork-join over pinned threads
with NUMA page placement (SURVEY.md section 2, "Parallelism strategies").
The TPU-native counterpart implemented here:

- a 1-D device mesh (``make_mesh``) stands in for the thread->CPU->NUMA
  topology of the reference's trace config;
- contiguous nnz-balanced row blocks of the matrix are sharded over the
  mesh (``ShardedCsr``), replacing ``ceil(rows/threads)`` equal-rows
  blocks (csr-matrix.cpp:77-95);
- the input vector is row-sharded too; each SpMV all-gathers x over ICI
  (the collective stand-in for the reference's remote-NUMA reads) and
  reduces rows locally — no scatter, no atomics;
- the communication-volume model (``halo``) prices each shard's remote
  x-traffic per peer shard, the direct analogue of the reference's
  [thread][numa_domain] miss matrices (cache-trace.cpp:156-160).
"""

from spmv_tpu.parallel.mesh import make_mesh, mesh_info
from spmv_tpu.parallel.shard import (
    ShardedCsr,
    shard_csr,
    stack_vector,
    unstack_vector,
    sharded_spmv,
    make_sharded_matvec,
)
from spmv_tpu.parallel.halo import communication_volume, HaloPlan, build_halo_plan
from spmv_tpu.parallel.halo_shard import (
    ShardedCsrHalo,
    shard_csr_halo,
    sharded_halo_spmv,
    make_sharded_halo_matvec,
    sharded_halo_spmm,
    make_sharded_halo_matmat,
    stack_block,
    unstack_block,
)
from spmv_tpu.parallel.precond_shard import (
    ShardedBlockJacobiIC0,
    block_jacobi_ic0,
    make_sharded_block_ic0_preconditioner,
    sharded_block_ic0_apply,
)
from spmv_tpu.parallel.distributed import (
    initialize_distributed,
    is_multi_host,
    global_mesh,
    global_device_put,
    host_local_info,
)
from spmv_tpu.parallel.well_shard import (
    ShardedWell,
    shard_well,
    sharded_well_spmv,
    make_sharded_well_matvec,
    ShardedWellHalo,
    shard_well_halo,
    sharded_well_halo_spmv,
    make_sharded_well_halo_matvec,
)
from spmv_tpu.parallel.wellcw_shard import (
    ShardedWellCwHalo,
    shard_wellcw_halo,
    sharded_wellcw_halo_spmv,
    make_sharded_wellcw_halo_matvec,
    sharded_wellcw_halo_spmm,
    make_sharded_wellcw_halo_matmat,
)
from spmv_tpu.parallel.bsr_shard import (
    ShardedBsrHalo,
    shard_bsr_halo,
    sharded_bsr_spmm,
    sharded_bsr_spmv,
    make_sharded_bsr_matvec,
)
from spmv_tpu.parallel.dia_shard import (
    ShardedDia,
    shard_dia,
    sharded_dia_spmv,
    sharded_dia_spmm,
    make_sharded_dia_matvec,
    make_sharded_dia_matmat,
    stack_dia_vector,
    unstack_dia_vector,
    stack_dia_matrix,
    unstack_dia_matrix,
)

__all__ = [
    "make_mesh",
    "mesh_info",
    "ShardedCsr",
    "shard_csr",
    "stack_vector",
    "unstack_vector",
    "sharded_spmv",
    "make_sharded_matvec",
    "communication_volume",
    "HaloPlan",
    "build_halo_plan",
    "ShardedCsrHalo",
    "shard_csr_halo",
    "sharded_halo_spmv",
    "make_sharded_halo_matvec",
    "sharded_halo_spmm",
    "make_sharded_halo_matmat",
    "stack_block",
    "unstack_block",
    "ShardedBlockJacobiIC0",
    "block_jacobi_ic0",
    "make_sharded_block_ic0_preconditioner",
    "sharded_block_ic0_apply",
    "ShardedBsrHalo",
    "shard_bsr_halo",
    "sharded_bsr_spmm",
    "sharded_bsr_spmv",
    "make_sharded_bsr_matvec",
    "ShardedDia",
    "shard_dia",
    "sharded_dia_spmv",
    "sharded_dia_spmm",
    "make_sharded_dia_matvec",
    "make_sharded_dia_matmat",
    "stack_dia_vector",
    "unstack_dia_vector",
    "stack_dia_matrix",
    "unstack_dia_matrix",
    "initialize_distributed",
    "is_multi_host",
    "global_mesh",
    "global_device_put",
    "host_local_info",
    "ShardedWell",
    "shard_well",
    "sharded_well_spmv",
    "make_sharded_well_matvec",
    "ShardedWellHalo",
    "shard_well_halo",
    "sharded_well_halo_spmv",
    "make_sharded_well_halo_matvec",
    "ShardedWellCwHalo",
    "shard_wellcw_halo",
    "sharded_wellcw_halo_spmv",
    "make_sharded_wellcw_halo_matvec",
    "sharded_wellcw_halo_spmm",
    "make_sharded_wellcw_halo_matmat",
]
