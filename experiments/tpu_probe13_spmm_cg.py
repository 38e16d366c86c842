"""Probe 13: SpMM (multi-vector) and CG on the chip.

a) XLA DIA SpMM at k=1..16: does amortizing index/data traffic over k
   columns approach the roofline without a dedicated Pallas kernel?
b) CG with the zero-copy Pallas DIA core: time per iteration vs the
   roofline (1 SpMV + ~5n axpy/dot traffic).
"""

import numpy as np
import jax
import jax.numpy as jnp

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import DiaMatrix
from spmv_tpu.models.device import DeviceDia
from spmv_tpu.ops import spmm, conjugate_gradient
from spmv_tpu.ops.pallas_kernels import (
    dia_prepare_x, dia_spmv_core, dia_extract_y,
)
from spmv_tpu.profile.harness import time_kernel

N = 2048
mm = poisson2d(N, N)
dia = DiaMatrix.from_matrix_market(mm)
n, nnz = dia.num_rows, dia.num_entries
A = DeviceDia.from_host(dia, dtype=jnp.float32)
rng = np.random.default_rng(0)
D = dia.num_diagonals

print(f"n={n*1e-6:.1f}M nnz={nnz*1e-6:.1f}M D={D}", flush=True)

# a) XLA DIA SpMM
for k in (1, 4, 8, 16):
    X = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))

    def step(X, A):
        return spmm(A, X)

    t = time_kernel(step, (X, A), k_small=2, k_large=8,
                    runs=3).seconds_per_iteration
    bytes_min = (D * 4 * n) + 2 * k * n * 4
    roof = bytes_min / 819e9
    print(f"  spmm k={k:3d}: {t*1e6:8.1f} us  "
          f"{k*nnz/t/1e9:6.1f} Gnnz/s  frac819 {roof/t:.2f}", flush=True)

# b) CG with Pallas DIA core (padded-layout matvec)
x2d0 = dia_prepare_x(A, jnp.zeros((n,), jnp.float32))
b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
b2d = dia_prepare_x(A, b)

def matvec(v2d):
    return dia_spmv_core(A, v2d)

@jax.jit
def cg_iters(b2d, iters):
    res = conjugate_gradient(matvec, b2d, tol=0.0, max_iterations=iters)
    return res.residual_norm

import time
for iters in (4, 16):
    np.asarray(cg_iters(b2d, iters))  # compile
t0 = time.perf_counter(); np.asarray(cg_iters(b2d, 4)); t4 = time.perf_counter() - t0
t0 = time.perf_counter(); np.asarray(cg_iters(b2d, 16)); t16 = time.perf_counter() - t0
per_iter = (t16 - t4) / 12
spmv_bytes = (D + 2) * 4 * n
cg_bytes = spmv_bytes + 10 * 4 * n   # r,p,x updates + dots, padded layout
print(f"  CG: {per_iter*1e6:8.1f} us/iter  "
      f"roofline(819) {cg_bytes/819e9*1e6:.1f} us  "
      f"frac {cg_bytes/819e9/per_iter:.2f}", flush=True)
