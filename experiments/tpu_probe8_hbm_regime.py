"""Probe 8: Pallas DIA in the true HBM-streaming regime (4096^2, 335MB)."""

import numpy as np
import jax.numpy as jnp

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import DiaMatrix
from spmv_tpu.models.device import DeviceDia
from spmv_tpu.ops import dia_spmv_padded
from spmv_tpu.profile.harness import time_kernel

N = 4096
mm = poisson2d(N, N)
dia = DiaMatrix.from_matrix_market(mm)
n = dia.num_rows
nnz = dia.num_entries
A = DeviceDia.from_host(dia, dtype=jnp.float32)
rng = np.random.default_rng(0)
xj = jnp.asarray(rng.standard_normal(n).astype(np.float32))
bytes_min = (dia.num_diagonals + 2) * 4 * n
print(f"n={n*1e-6:.1f}M nnz={nnz*1e-6:.1f}M min traffic {bytes_min/1e6:.1f} MB "
      f"roofline {bytes_min/819e9*1e6:.1f} us")

# spot correctness on a slice
y = np.asarray(dia_spmv_padded(A, xj, tile_rows=256)[:n])
want = dia.spmv(np.asarray(xj, np.float64))
err = np.abs(y - want).max() / np.abs(want).max()
print("rel err:", err)

for tile_rows in (128, 256, 512):
    def step(x, A):
        return dia_spmv_padded(A, x, tile_rows=tile_rows)[:n]
    t = time_kernel(step, (xj, A), k_small=2, k_large=10, runs=3).seconds_per_iteration
    print(f"tile_rows={tile_rows:4d}  {t*1e6:8.1f} us  "
          f"{nnz/t/1e9:6.2f} Gnnz/s  {bytes_min/t/1e9:6.1f} GB/s  "
          f"roofline frac {bytes_min/819e9/t:.2f}")
