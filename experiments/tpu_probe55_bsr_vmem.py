"""Probe 55: can CompilerParams(vmem_limit_bytes) unlock the whole-X
BSR path at the driver-bench shape?

BENCH_r03 crashed: the whole-X bsr_spmm pallas_call allocates a 65 MB
resident X but the driver environment compiles with a 16 MB scoped
VMEM default ("Scoped allocation with size 65.12M and limit 16.00M").
Round-3 probes ran fine interactively, so the limit is an environment
default, not hardware.  This probe AOT-compiles and runs the whole-X
kernel at the exact bench shape (131072 rows, 8 blocks/block-row,
k=128) with an explicit vmem_limit_bytes, and also times the streamed
fallback for comparison.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.io.generate import block_random
from spmv_tpu.models.bsr import BsrMatrix
from spmv_tpu.models.device import DeviceBsr
from spmv_tpu.ops.pallas_kernels import bsr_spmm
from spmv_tpu.profile.harness import time_kernel

N = 1 << 17
K = 128

mm = block_random(N, N, 8, seed=2)
host = BsrMatrix.from_matrix_market(mm)
rng = np.random.default_rng(0)
X = rng.standard_normal((N, K)).astype(np.float32)
want = np.abs(host.spmm(X.astype(np.float64))).sum()

A = DeviceBsr.from_host(host, dtype=jnp.float32)
Xd = jnp.asarray(X)

out = {}


def run(tag):
    def step(Xd, A):
        return bsr_spmm(A, Xd)

    got = float(jnp.abs(step(Xd, A)).sum())
    rel = abs(got - want) / want
    t = time_kernel(step, (Xd, A), k_small=4, k_large=24,
                    runs=6).seconds_per_iteration
    nb = int(A.blocks.shape[0])
    flops = 2 * nb * A.block_rows * 128 * K
    out[tag] = {"seconds": t, "tflops": flops / t / 1e12,
                "checksum_rel_err": rel}
    print(tag, out[tag], flush=True)


run("wholex_with_vmem_limit")

import spmv_tpu.ops.pallas_kernels as pk

saved = pk._BSR_WHOLEX_BYTES
pk._BSR_WHOLEX_BYTES = 0  # force the streamed path
try:
    bsr_spmm._clear_cache()
except Exception:
    pass
run("streamed")
pk._BSR_WHOLEX_BYTES = saved

with open("experiments/probe55_bsr_vmem.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
