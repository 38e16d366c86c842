"""Probe 30: sanity-check the in-place DIA headline timing.

The bench reports 271 us/iter for ~470 MB of modeled traffic
(= 1733 GB/s), which exceeds the v5e physical HBM peak (819 GB/s)
and the measured read-only peak (672 GB/s, probe 23).  Either the
slope harness is mis-measuring the chained in-place kernel, or the
kernel is not doing the work we think per iteration.

This probe:
  1. wall-clocks whole chains end-to-end at K = 4, 24, 64, 128 and
     prints raw totals (linearity check: per-iter from long chains
     can't hide dispatch effects);
  2. validates the K=24 chained result against 24 host fp64 SpMVs;
  3. compares in-place vs out-of-place at K=64.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import DiaMatrix
from spmv_tpu.models.device import DeviceDia
from spmv_tpu.ops.pallas_kernels import (
    dia_extract_y,
    dia_prepare_x,
    dia_spmv_core,
)

N = 4096
TR = 256

print("building matrix...", flush=True)
mm = poisson2d(N, N)
dia = DiaMatrix.from_matrix_market(mm)
n, D = dia.num_rows, dia.num_diagonals
A = DeviceDia.from_host(dia, dtype=jnp.float32)
rng = np.random.default_rng(0)
x = rng.standard_normal(n).astype(np.float32)
x2d0 = dia_prepare_x(A, jnp.asarray(x), TR)

bytes_iter = D * n * 4 + 2 * n * 4
print(f"n={n} D={D} modeled bytes/iter={bytes_iter/1e6:.0f} MB", flush=True)


def chained(k, ip):
    @jax.jit
    def run(v, A):
        def body(_, v):
            return dia_spmv_core(A, v, TR, in_place=ip)
        out = jax.lax.fori_loop(0, k, body, v)
        return jnp.sum(out).astype(jnp.float32)
    return run


# 2. correctness of the chain itself (K=24, in-place)
fn24 = chained(24, True)
got = float(fn24(x2d0, A))
w = x.astype(np.float64)
for _ in range(24):
    w = dia.spmv(w)
want = w.sum()
print(f"chain24 checksum rel err: {abs(got - want)/abs(want):.2e}",
      flush=True)

# 1. wall-clock whole chains
for ip in (True, False):
    for k in (4, 24, 64, 128):
        fn = chained(k, ip)
        float(fn(x2d0, A))  # warmup/compile
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(fn(x2d0, A))
            ts.append(time.perf_counter() - t0)
        tmin = min(ts)
        per = tmin / k
        print(f"ip={ip} K={k:4d}: total {tmin*1e3:8.2f} ms  "
              f"per-iter {per*1e6:7.1f} us  "
              f"-> {bytes_iter/per/1e9:7.1f} GB/s  "
              f"(all runs ms: {['%.2f' % (t*1e3) for t in ts]})",
              flush=True)
