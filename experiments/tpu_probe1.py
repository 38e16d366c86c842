"""Probe 1: baseline perf of XLA paths on the real chip.

- triad streaming bandwidth (roofline denominator)
- CSR segment-sum SpMV and ELL gather SpMV, fp32, poisson2d
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import CsrMatrix, EllMatrix
from spmv_tpu.models.device import DeviceCsr, DeviceEll
from spmv_tpu.ops import spmv, triad


def bench(fn, *args, runs=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times), float(np.median(times))


def main():
    print("devices:", jax.devices())

    # --- triad ---
    n = 1 << 26  # 64M fp32 = 256MB per array
    b = jnp.ones(n, jnp.float32)
    c = jnp.ones(n, jnp.float32)
    f = jax.jit(lambda b, c: triad(b, c, 2.0))
    tmin, tmed = bench(f, b, c)
    bw = 3 * 4 * n / tmin / 1e9
    print(f"triad n={n}: min={tmin*1e3:.3f} ms -> {bw:.1f} GB/s")

    # --- SpMV ---
    print("building poisson2d(1024)...", flush=True)
    mm = poisson2d(1024, 1024)  # 1,048,576 rows, ~5.2M nnz
    host = CsrMatrix.from_matrix_market(mm)
    nnz = host.num_entries
    print(f"rows={host.num_rows} nnz={nnz}")

    A = DeviceCsr.from_host(host, dtype=jnp.float32)
    x = jnp.ones((mm.num_columns,), jnp.float32)
    f = jax.jit(spmv)
    tmin, tmed = bench(f, A, x)
    gf = 2 * nnz / tmin / 1e9
    # bytes: vals 4 + cols 4 + rowids 4 per nnz, y 4/row, x gather >= 4/elem
    bytes_min = nnz * 12 + host.num_rows * 8
    print(
        f"CSR segsum spmv: min={tmin*1e3:.3f} ms med={tmed*1e3:.3f} "
        f"-> {gf:.2f} GFLOP/s, >= {bytes_min/tmin/1e9:.1f} GB/s effective"
    )

    ell_host = EllMatrix.from_matrix_market(mm)
    E = DeviceEll.from_host(ell_host, dtype=jnp.float32)
    tmin, tmed = bench(f, E, x)
    gf = 2 * nnz / tmin / 1e9
    stored = E.value.size
    bytes_ell = stored * 8 + host.num_rows * 8
    print(
        f"ELL gather spmv (L={ell_host.row_length}): min={tmin*1e3:.3f} ms "
        f"-> {gf:.2f} GFLOP/s, {bytes_ell/tmin/1e9:.1f} GB/s effective"
    )


if __name__ == "__main__":
    main()
