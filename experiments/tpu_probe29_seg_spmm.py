"""Probe 29: segmented WELL SpMM on chip — correctness + rate.

Validates the 3D (win_rows, nvec, LANE) sliding-segment DMA on real
hardware (alignment: first dim is a multiple of 8; trailing dims are
full) and measures the rate vs the whole-x kernel and the XLA path.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import WellMatrix
from spmv_tpu.models.device import DeviceWell
from spmv_tpu.ops.pallas_kernels import well_spmm

dev = jax.devices()[0]
print("device:", dev)

# 2048^2 poisson => 4.2M rows, 21M nnz; x is 16.8 MB > 8 MB budget so
# from_host auto-segments.
mm = poisson2d(2048, 2048)
w = WellMatrix.from_matrix_market(mm, window_rows=2)
A = DeviceWell.from_host(w, dtype=jnp.float32)
print("segment_rows:", A.segment_rows, "chunks:", A.num_chunks,
      "K:", A.chunks_per_step, "B:", A.blocks_per_out,
      "spill nnz:", 0 if A.spill is None else A.spill.num_entries)
assert A.segment_rows is not None

k = 4
rng = np.random.default_rng(0)
X = rng.standard_normal((w.num_columns, k)).astype(np.float32)
Xd = jnp.asarray(X)

Y = np.asarray(well_spmm(A, Xd))
want = np.stack(
    [w.spmv(X[:, j].astype(np.float64)) for j in range(k)], axis=1
)
rel = np.abs(Y - want).max() / np.abs(want).max()
print("max rel err:", rel)
assert rel < 1e-4, rel

# fetch-synced long-chain marginal (block_until_ready does not
# synchronize through the tunnel; see RESULTS.md probes 30-33)
def mk(kc):
    @jax.jit
    def f(X, A):
        def body(_, V):
            Y = well_spmm(A, V)
            return Y[: V.shape[0]]
        return jnp.sum(jax.lax.fori_loop(0, kc, body, X)) * 1e-9
    return f

f1, f2 = mk(2), mk(14)
for f in (f1, f2):
    float(f(Xd, A))
best = []
for f in (f1, f2):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(Xd, A))
        ts.append(time.perf_counter() - t0)
    best.append(min(ts))
dt = (best[1] - best[0]) / 12
print(f"seg spmm k={k}: {dt*1e3:.3f} ms, "
      f"{k*w.num_entries/dt/1e9:.2f} Gnnz/s")
