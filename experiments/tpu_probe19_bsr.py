"""Probe 19: BSR MXU SpMM on the chip.

Block-structured matrix: 256 block-rows x 8 dense 128x128 blocks each
(2048 blocks, 33.5M stored values = 134 MB fp32), k in {16, 128}.
Expected regime: compute riding the MXU with block streaming from HBM.
"""

import numpy as np
import jax
import jax.numpy as jnp

from spmv_tpu.models.bsr import BsrMatrix, BLOCK
from spmv_tpu.models.device import DeviceBsr
from spmv_tpu.ops.pallas_kernels import bsr_spmm
from spmv_tpu.profile.harness import time_kernel

rng = np.random.default_rng(0)
NBR, NCB, BPR = 256, 256, 8
nb = NBR * BPR

# Build the BSR host object directly with dense random blocks.
blocks = rng.standard_normal((nb, BLOCK, BLOCK))
bcols = np.concatenate([
    np.sort(rng.choice(NCB, size=BPR, replace=False)) for _ in range(NBR)
]).astype(np.int32)
rowptr = np.arange(NBR + 1, dtype=np.int64) * BPR
host = BsrMatrix(
    num_rows=NBR * BLOCK, num_columns=NCB * BLOCK,
    num_entries=nb * BLOCK * BLOCK,
    blocks=blocks, block_col=bcols, block_rowptr=rowptr,
)
A = DeviceBsr.from_host(host, dtype=jnp.float32)
n = host.num_rows
print(f"blocks={nb} stored={nb*BLOCK*BLOCK/1e6:.1f}M vals "
      f"({nb*BLOCK*BLOCK*4/1e6:.0f} MB fp32)", flush=True)

for k in (16, 128):
    X = rng.standard_normal((host.num_columns, k)).astype(np.float32)
    Xj = jnp.asarray(X)

    @jax.jit
    def checksum(Xj, A):
        return jnp.abs(bsr_spmm(A, Xj)).sum()

    # fp64 host reference on a FEW block rows only (full is slow):
    got = float(checksum(Xj, A))
    want = float(np.abs(host.spmm(X.astype(np.float64))).sum())
    rel = abs(got - want) / want
    assert rel < 1e-3, rel

    # direct large-delta chained timing (the slope harness is
    # dispatch-dominated at these sub-ms kernel times)
    import time as _t

    @jax.jit
    def chain(Xj, A, iters):
        def body(_, v):
            return bsr_spmm(A, v)
        return jax.lax.fori_loop(0, iters, body, Xj).sum()

    np.asarray(chain(Xj, A, 8)); np.asarray(chain(Xj, A, 64))
    t0 = _t.perf_counter(); np.asarray(chain(Xj, A, 8))
    ta = _t.perf_counter() - t0
    t0 = _t.perf_counter(); np.asarray(chain(Xj, A, 64))
    tb = _t.perf_counter() - t0
    t = (tb - ta) / 56
    flops = 2 * nb * BLOCK * BLOCK * k
    bytes_blocks = nb * BLOCK * BLOCK * 4
    bytes_xy = (NCB + 2 * NBR) * BLOCK * k * 4
    t_mem = (bytes_blocks + bytes_xy) / 819e9
    t_mxu = flops / (98.3e12 / 2)       # fp32 peak on v5e
    print(f"k={k:4d}: {t*1e6:8.1f} us  {flops/t/1e12:6.2f} TFLOP/s  "
          f"mem-roofline {t_mem*1e6:.0f} us  mxu-roofline {t_mxu*1e6:.0f} us  "
          f"frac {max(t_mem, t_mxu)/t:.2f}  chk {rel:.1e}", flush=True)
