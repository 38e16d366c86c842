"""Probe 12: WELL kernel on the real chip — correctness + throughput.

Matrices: poisson2d 1024^2 (banded; DIA's home turf, so this measures
the general path's overhead) and a random banded matrix (bandwidth
4096, ~16 nnz/row) that DIA cannot store efficiently.
"""

import numpy as np
import jax.numpy as jnp

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import WellMatrix
from spmv_tpu.models.device import DeviceWell
from spmv_tpu.ops import well_spmv
from spmv_tpu.ops.pallas_kernels import well_spmv_padded
from spmv_tpu.profile.harness import time_kernel
from spmv_tpu.io.matrix_market import MatrixMarket

rng = np.random.default_rng(0)


def banded_random(n, bw, per_row):
    rows = np.repeat(np.arange(n, dtype=np.int64), per_row)
    off = rng.integers(-bw, bw + 1, rows.size)
    cols = np.clip(rows + off, 0, n - 1)
    key = rows * n + cols
    key = np.unique(key)
    r, c = key // n, key % n
    v = rng.standard_normal(r.size)
    return MatrixMarket(
        "matrix", "coordinate", "real", "general", n, n, r.size,
        (r + 1).astype(np.int64), (c + 1).astype(np.int64), v,
    )


def bench(name, mm, window_rows):
    w = WellMatrix.from_matrix_market(mm, window_rows=window_rows)
    A = DeviceWell.from_host(w, dtype=jnp.float32)
    n = w.num_rows
    x = rng.standard_normal(mm.num_columns).astype(np.float32)
    xj = jnp.asarray(x)

    # correctness via checksum
    import jax
    @jax.jit
    def checksum(xj, A):
        return jnp.abs(well_spmv(A, xj)).sum()
    want = float(np.abs(w.spmv(x.astype(np.float64))).sum())
    got = float(checksum(xj, A))
    rel = abs(got - want) / want
    print(f"{name}: nnz={w.num_entries} chunks={w.num_chunks} "
          f"spill={w.spill_fraction:.3f} fill={w.fill_ratio:.2f} "
          f"chk_rel={rel:.1e}", flush=True)
    assert rel < 1e-4

    def step(xj, A):
        y = well_spmv_padded(A, xj)
        return y[: mm.num_columns]

    t = time_kernel(step, (xj, A), k_small=2, k_large=10,
                    runs=3).seconds_per_iteration
    bytes_moved = (A.value.nbytes // 2 * 2 + A.local_index.nbytes
                   + 4 * (n + mm.num_columns))
    print(f"  {t*1e6:8.1f} us  {w.num_entries/t/1e9:6.2f} Gnnz/s  "
          f"{bytes_moved/t/1e9:6.1f} GB/s(stored)", flush=True)


bench("poisson2d 1024^2 m=2", poisson2d(1024, 1024), 2)
bench("banded random n=1M bw=4096 m=4", banded_random(1 << 20, 4096, 16), 4)
