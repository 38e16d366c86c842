"""Probe 6: Pallas DIA stencil kernel on the real chip — correctness + speed."""

import numpy as np
import jax
import jax.numpy as jnp

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import CsrMatrix, DiaMatrix
from spmv_tpu.models.device import DeviceDia
from spmv_tpu.ops import dia_spmv, dia_spmv_padded
from spmv_tpu.profile.harness import time_kernel

N = 1024
mm = poisson2d(N, N)
dia = DiaMatrix.from_matrix_market(mm)
host_csr = CsrMatrix.from_matrix_market(mm)
n = dia.num_rows
nnz = dia.num_entries
A = DeviceDia.from_host(dia, dtype=jnp.float32)

rng = np.random.default_rng(0)
x = rng.standard_normal(n).astype(np.float32)
xj = jnp.asarray(x)

# correctness on chip
y = np.asarray(dia_spmv(A, xj))
want = dia.spmv(x.astype(np.float64))
err = np.abs(y - want).max() / np.abs(want).max()
print("rel err vs fp64 host:", err)
assert err < 1e-5

for tile_rows in (8, 32, 64, 128, 256):
    def step(x, A):
        return dia_spmv_padded(A, x, tile_rows=tile_rows)[:n]
    t = time_kernel(step, (xj, A), k_small=8, k_large=64, runs=3).seconds_per_iteration
    bytes_min = (dia.num_diagonals + 2) * 4 * n
    print(f"tile_rows={tile_rows:4d}  {t*1e6:8.1f} us  "
          f"{nnz/t/1e9:6.2f} Gnnz/s  {bytes_min/t/1e9:6.1f} GB/s(min-traffic)")
