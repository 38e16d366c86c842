"""Probe 7: Pallas DIA at sizes beyond VMEM residency + per-tile correctness."""

import numpy as np
import jax.numpy as jnp

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import DiaMatrix
from spmv_tpu.models.device import DeviceDia
from spmv_tpu.ops import dia_spmv, dia_spmv_padded
from spmv_tpu.profile.harness import time_kernel

# Correctness at every tile size (1024x1024 grid).
mm = poisson2d(512, 512)
dia = DiaMatrix.from_matrix_market(mm)
A = DeviceDia.from_host(dia, dtype=jnp.float32)
rng = np.random.default_rng(0)
x = rng.standard_normal(dia.num_rows).astype(np.float32)
want = dia.spmv(x.astype(np.float64))
for tr in (8, 32, 64, 128, 256):
    y = np.asarray(dia_spmv(A, jnp.asarray(x), tile_rows=tr))
    err = np.abs(y - want).max() / np.abs(want).max()
    print(f"tile_rows={tr:4d} rel err {err:.2e}")
    assert err < 1e-5, (tr, err)

# Timing at 2048^2 (~4.2M rows): diagonals = 84 MB > VMEM budget.
N = 2048
mm = poisson2d(N, N)
dia = DiaMatrix.from_matrix_market(mm)
n = dia.num_rows
nnz = dia.num_entries
A = DeviceDia.from_host(dia, dtype=jnp.float32)
xj = jnp.asarray(rng.standard_normal(n).astype(np.float32))
bytes_min = (dia.num_diagonals + 2) * 4 * n
print(f"n={n} nnz={nnz} min traffic {bytes_min/1e6:.1f} MB "
      f"roofline {bytes_min/819e9*1e6:.1f} us")

for tile_rows in (64, 128, 256, 512):
    def step(x, A):
        return dia_spmv_padded(A, x, tile_rows=tile_rows)[:n]
    t = time_kernel(step, (xj, A), k_small=4, k_large=24, runs=3).seconds_per_iteration
    print(f"tile_rows={tile_rows:4d}  {t*1e6:8.1f} us  "
          f"{nnz/t/1e9:6.2f} Gnnz/s  {bytes_min/t/1e9:6.1f} GB/s  "
          f"roofline frac {bytes_min/819e9/t:.2f}")
