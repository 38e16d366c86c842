"""Probe 10: chained dia_spmv_core (padded layout, no per-iteration pad).

Large-array fetches over the tunnel take minutes — correctness is
checked via a SCALAR checksum on device; timing fetches scalars only.
"""

import numpy as np
import jax
import jax.numpy as jnp

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import DiaMatrix
from spmv_tpu.models.device import DeviceDia
from spmv_tpu.ops.pallas_kernels import (
    dia_prepare_x, dia_spmv_core, dia_extract_y,
)
from spmv_tpu.profile.harness import time_kernel

N = 4096
mm = poisson2d(N, N)
dia = DiaMatrix.from_matrix_market(mm)
n, nnz = dia.num_rows, dia.num_entries
A = DeviceDia.from_host(dia, dtype=jnp.float32)
rng = np.random.default_rng(0)
x = rng.standard_normal(n).astype(np.float32)
want = dia.spmv(x.astype(np.float64))
want_sum = float(np.abs(want).sum())
bytes_min = (dia.num_diagonals + 2) * 4 * n
print(f"N={N} n={n*1e-6:.1f}M data {dia.num_diagonals*4*n/1e6:.0f} MB "
      f"min traffic {bytes_min/1e6:.1f} MB "
      f"roofline(819) {bytes_min/819e9*1e6:.1f} us "
      f"roofline(650) {bytes_min/650e9*1e6:.1f} us", flush=True)

for tile_rows in (256, 512):
    x2d = dia_prepare_x(A, jnp.asarray(x), tile_rows)

    def step(x2d, A):
        return dia_spmv_core(A, x2d, tile_rows=tile_rows)

    @jax.jit
    def checksum(x2d, A):
        y = dia_extract_y(A, dia_spmv_core(A, x2d, tile_rows=tile_rows),
                          tile_rows)
        return jnp.abs(y.astype(jnp.float64)).sum()

    got = float(checksum(x2d, A))
    rel = abs(got - want_sum) / want_sum
    assert rel < 1e-5, (tile_rows, rel, got, want_sum)

    t = time_kernel(step, (x2d, A), k_small=2, k_large=10,
                    runs=3).seconds_per_iteration
    print(f"  tile_rows={tile_rows:4d}  {t*1e6:8.1f} us  "
          f"{nnz/t/1e9:6.2f} Gnnz/s  {bytes_min/t/1e9:6.1f} GB/s  "
          f"frac819 {bytes_min/819e9/t:.2f}  checksum rel {rel:.1e}",
          flush=True)
