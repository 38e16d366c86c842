"""Sharded solves over a device mesh.

On a real pod this uses every attached chip; on a CPU host, set
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
to validate the sharding logic on 8 virtual devices (the same way
this repo's test suite and the driver dryrun do).
"""

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import CsrMatrix
from spmv_tpu.ops import conjugate_gradient, preconditioned_conjugate_gradient
from spmv_tpu.parallel import (
    block_jacobi_ic0,
    make_mesh,
    make_sharded_block_ic0_preconditioner,
    make_sharded_halo_matvec,
    shard_csr,
    shard_csr_halo,
    stack_vector,
    unstack_vector,
)

P = len(jax.devices())
mesh = make_mesh(P)
mm = poisson2d(32, 4 * P)
host = CsrMatrix.from_matrix_market(mm)

# ragged halo exchange: only the needed x strips move over ICI
A = shard_csr(host, P, partition="nnz", mesh=mesh)
Ah = shard_csr_halo(host, P, partition="nnz", mesh=mesh)
matvec = make_sharded_halo_matvec(Ah, mesh)

rng = np.random.default_rng(0)
x_true = rng.standard_normal(mm.num_rows)
bs = stack_vector(host.spmv(x_true), A, mesh=mesh)

res = jax.jit(lambda b: conjugate_gradient(
    matvec, b, tol=1e-6, max_iterations=500))(bs)
err = np.linalg.norm(unstack_vector(res.x, A) - x_true) \
    / np.linalg.norm(x_true)
print(f"sharded CG over {P} devices: iters {int(res.iterations)} "
      f"rel_err {err:.2e} (halo {Ah.comm_elements_padded} elems/step)")

# block-Jacobi with LOCAL IC(0) solves: zero extra collectives
M = block_jacobi_ic0(host, Ah.bounds, Ah.rows_per_shard, mesh=mesh)
pre = make_sharded_block_ic0_preconditioner(M, mesh)
res_b = jax.jit(lambda b: preconditioned_conjugate_gradient(
    matvec, b, pre, tol=1e-6, max_iterations=500))(bs)
print(f"block-Jacobi-IC(0) PCG: iters {int(res_b.iterations)}")
