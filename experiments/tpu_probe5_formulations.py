"""Probe 5: time XLA SpMV formulations on the real chip.

a) CSR segment-sum (current ops.spmv path)
b) ELL gather: x[col] with jnp.take
c) DIA: shifted dynamic slices + FMA (no gather at all)

Matrix: poisson2d 1024x1024 (~1M rows, 5.2M nnz), fp32.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import CsrMatrix
from spmv_tpu.models.device import DeviceCsr, DeviceEll
from spmv_tpu.models.ell import EllMatrix
from spmv_tpu.ops import spmv_padded
from spmv_tpu.profile.harness import time_kernel

N = 1024
mm = poisson2d(N, N)
host = CsrMatrix.from_matrix_market(mm)
n = host.num_rows
print("rows", n, "nnz", host.num_entries)

A = DeviceCsr.from_host(host, dtype=jnp.float32)
x0 = jnp.ones((n,), jnp.float32)


def report(name, t, extra_bytes=0):
    csr_bytes = host.num_entries * 8 + 4 * n * 2
    print(f"{name:24s} {t*1e6:10.1f} us  {host.num_entries/t/1e9:7.2f} Gnnz/s")


# a) CSR segment-sum
def step_csr(x, A):
    return spmv_padded(A, x)[:n]

t = time_kernel(step_csr, (x0, A), k_small=2, k_large=8, runs=3).seconds_per_iteration
report("csr segment_sum", t)

# b) ELL gather
ell = EllMatrix.from_matrix_market(mm)
E = DeviceEll.from_host(ell, dtype=jnp.float32)

def step_ell(x, E):
    y = (E.value * jnp.take(x, E.column_index, axis=0)).sum(axis=1)
    return y[:n]

t = time_kernel(step_ell, (x0, E), k_small=2, k_large=8, runs=3).seconds_per_iteration
report("ell take-gather", t)

# c) DIA: build diagonals on host
row = np.repeat(np.arange(n), np.diff(host.row_ptr))
col = np.asarray(host.column_index)
val = np.asarray(host.value, np.float32)
offs = np.unique(col - row)
print("diagonals:", offs)
P = int(max(-offs.min(), offs.max()))
diags = np.zeros((len(offs), n), np.float32)
for k, o in enumerate(offs):
    sel = (col - row) == o
    diags[k, row[sel]] = val[sel]
dd = jnp.asarray(diags)
offs_t = tuple(int(o) for o in offs)

def step_dia(x, dd):
    xp = jnp.pad(x, (P, P))
    y = jnp.zeros_like(x)
    for k, o in enumerate(offs_t):
        y = y + dd[k] * jax.lax.dynamic_slice(xp, (P + o,), (n,))
    return y

t = time_kernel(step_dia, (x0, dd), k_small=4, k_large=32, runs=3).seconds_per_iteration
report("dia shifted-slices", t)

# correctness cross-check
y_csr = np.asarray(step_csr(x0, A))
y_ell = np.asarray(step_ell(x0, E))
y_dia = np.asarray(step_dia(x0, dd))
print("ell vs csr max err", np.abs(y_ell - y_csr).max())
print("dia vs csr max err", np.abs(y_dia - y_csr).max())
print("roofline est: dia bytes", (len(offs) + 2) * 4 * n / 1e6, "MB ->",
      (len(offs) + 2) * 4 * n / 819e9 * 1e6, "us")
