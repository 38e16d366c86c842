"""Krylov solves and eigenpairs on device.

CG on the DIA fast path, IC(0)-preconditioned CG on a CSR operator,
and a few smallest eigenpairs via LOBPCG.
"""

import jax.numpy as jnp
import numpy as np

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import CsrMatrix, DiaMatrix
from spmv_tpu.models.device import DeviceDia, device_put_matrix
from spmv_tpu.ops import (
    conjugate_gradient,
    dia_conjugate_gradient,
    dia_eigsh,
    ic0_factor,
    ic0_preconditioner,
    preconditioned_conjugate_gradient,
    spmv,
)

mm = poisson2d(64, 64)
host = CsrMatrix.from_matrix_market(mm)
n = mm.num_rows
rng = np.random.default_rng(0)
x_true = rng.standard_normal(n)
b = jnp.asarray(host.spmv(x_true))

# plain CG through the DIA fast path (auto: XLA when resident,
# fused-dot Pallas when streaming)
Ad = DeviceDia.from_host(DiaMatrix.from_matrix_market(mm))
res = dia_conjugate_gradient(Ad, b, tol=1e-8, max_iterations=2000)
print("CG        iters", int(res.iterations),
      "rel_x", float(np.linalg.norm(np.asarray(res.x) - x_true)
                     / np.linalg.norm(x_true)))

# IC(0)-preconditioned CG
A = device_put_matrix(host)
L = ic0_factor(host)
apply_m, info = ic0_preconditioner(L)
res_p = preconditioned_conjugate_gradient(
    lambda v: spmv(A, v), b, apply_m, tol=1e-8, max_iterations=2000)
print("IC(0)-PCG iters", int(res_p.iterations), "method", info["method"])

# four smallest eigenpairs (analytic spectrum available for poisson)
eig = dia_eigsh(Ad, k=4, which="smallest", tol=1e-8)
print("smallest eigenvalues", np.round(np.asarray(eig.eigenvalues), 6))
