"""Probe 1d: slope-based timing with scalar outputs (trustworthy)."""

import jax
import jax.numpy as jnp

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import CsrMatrix, EllMatrix
from spmv_tpu.models.device import DeviceCsr, DeviceEll
from spmv_tpu.ops import spmv
from spmv_tpu.profile.harness import time_kernel

# triad
n = 1 << 24
b = jnp.ones(n, jnp.float32)
c = jnp.ones(n, jnp.float32)
t = time_kernel(lambda v, c: v + 2.0 * c, (b, c), k_small=2, k_large=22,
                runs=4)
bw = 3 * 4 * n / t.seconds_per_iteration / 1e9
print(f"triad 16M: {t.seconds_per_iteration*1e3:.3f} ms/iter -> {bw:.1f} GB/s")

# matmul (calibration: v5e ~ 197 bf16 TFLOP/s peak)
N = 4096
a = jnp.ones((N, N), jnp.bfloat16)
eye = jnp.eye(N, dtype=jnp.bfloat16)
t = time_kernel(
    lambda v, m: jnp.dot(v, m, preferred_element_type=jnp.bfloat16),
    (a, eye), k_small=2, k_large=22, runs=4,
)
tf = 2 * N**3 / t.seconds_per_iteration / 1e12
print(f"matmul 4096 bf16: {t.seconds_per_iteration*1e3:.3f} ms -> {tf:.1f} TFLOP/s")

# spmv
mm = poisson2d(1024, 1024)
host = CsrMatrix.from_matrix_market(mm)
nnz = host.num_entries
x = jnp.ones((mm.num_columns,), jnp.float32)

A = DeviceCsr.from_host(host, dtype=jnp.float32)
t = time_kernel(
    lambda v, A: spmv(A, v[: A.num_columns])[: v.shape[0]],
    (x, A), k_small=2, k_large=12, runs=4,
)
per = t.seconds_per_iteration
print(f"csr spmv: {per*1e3:.3f} ms -> {2*nnz/per/1e9:.2f} GFLOP/s, "
      f"{(12*nnz + 8*host.num_rows)/per/1e9:.1f} GB/s")

E = DeviceEll.from_host(EllMatrix.from_matrix_market(mm), dtype=jnp.float32)
t = time_kernel(
    lambda v, E: spmv(E, v[: E.num_columns])[: v.shape[0]],
    (x, E), k_small=2, k_large=12, runs=4,
)
per = t.seconds_per_iteration
stored = E.value.size
print(f"ell spmv: {per*1e3:.3f} ms -> {2*nnz/per/1e9:.2f} GFLOP/s, "
      f"{(8*stored + 8*host.num_rows)/per/1e9:.1f} GB/s")
