"""Probe 25: in-place (aliased) DIA SpMV/SpMM vs the round-1 path.

Probe 24's law: cross-buffer r+w mixes at ~325 GB/s, same-buffer at
~640.  The in_place kernels write y into the donated x buffer; this
measures the real gain on the headline shapes and gates correctness
with an on-device checksum against the host fp64 reference.

  spmv  — poisson 4096^2 (84M nnz), f32
  spmm  — poisson 4096^2, k=4, f32  (the round-1 0.48-roofline case)
"""

import numpy as np
import jax
import jax.numpy as jnp

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import DiaMatrix
from spmv_tpu.ops.pallas_kernels import (
    dia_spmv_core, dia_spmm_core, dia_prepare_x, dia_prepare_X,
    dia_extract_y, dia_extract_Y,
)
from spmv_tpu.models.device import DeviceDia
from spmv_tpu.profile.harness import time_kernel

N = 4096
TR = 256
K = 4
ROOF = 819e9

print("building matrix...", flush=True)
mm = poisson2d(N, N)
dia = DiaMatrix.from_matrix_market(mm)
n, D = dia.num_rows, dia.num_diagonals
A = DeviceDia.from_host(dia, dtype=jnp.float32)
rng = np.random.default_rng(0)
x = rng.standard_normal(n).astype(np.float32)
X = rng.standard_normal((n, K)).astype(np.float32)

# modeled minimum traffic per iteration (bytes)
spmv_bytes = D * n * 4 + 2 * n * 4
spmm_bytes = D * n * 4 + 2 * n * K * 4


def report(name, t, nbytes, nnz_mult):
    frac = nbytes / t / ROOF
    print(f"{name:14s}: {t*1e6:8.1f} us  {dia.num_entries*nnz_mult/t/1e9:7.1f} "
          f"Gnnz/s  roofline {frac:5.3f}", flush=True)


for ip in (False, True):
    tag = "ip" if ip else "oop"
    v = dia_prepare_x(A, jnp.asarray(x), TR)
    step = lambda v, Aa, _ip=ip: dia_spmv_core(Aa, v, TR, in_place=_ip)
    # checksum: 2 chained applications vs host fp64
    y2 = dia_extract_y(A, step(step(v, A), A), TR)
    want = dia.spmv(dia.spmv(x.astype(np.float64)))
    chk = abs(float(jnp.sum(y2)) - want.sum()) / max(1.0, abs(want.sum()))
    t = time_kernel(step, (dia_prepare_x(A, jnp.asarray(x), TR), A),
                    k_small=4, k_large=16, runs=4).seconds_per_iteration
    report(f"spmv_{tag}", t, spmv_bytes, 1)
    print(f"   chk={chk:.2e}", flush=True)

for ip in (False, True):
    tag = "ip" if ip else "oop"
    v = dia_prepare_X(A, jnp.asarray(X), TR)
    step = lambda v, Aa, _ip=ip: dia_spmm_core(Aa, v, TR, in_place=_ip)
    Y2 = dia_extract_Y(A, step(step(v, A), A), TR)
    wantY = np.stack(
        [dia.spmv(dia.spmv(X[:, j].astype(np.float64))) for j in range(K)],
        axis=1)
    chk = abs(float(jnp.sum(Y2)) - wantY.sum()) / max(1.0, abs(wantY.sum()))
    t = time_kernel(step, (dia_prepare_X(A, jnp.asarray(X), TR), A),
                    k_small=2, k_large=8, runs=4).seconds_per_iteration
    report(f"spmm_{tag}", t, spmm_bytes, K)
    print(f"   chk={chk:.2e}", flush=True)
