"""Probe 57d: the shipped bsr_spmm after the tree-sum landing.

Probe 57 measured the accumulator chain at 1.407 ms and the tree-sum
variant at 1.188 ms (f32, 537 MB driver shape); probe 57c measured the
explicit async-staging kernel at 1.499 ms f32 / 0.708 ms bf16 — i.e.
staging measured NEGATIVE on both dtypes (the VMEM->VMEM copies
contend worse than Mosaic's own implicit staging).  The tree-sum is
therefore what ships.  This probe re-times the *shipped* kernel at the
exact driver shape for both dtypes, with the fp64 host checksum gate.
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

print("device:", jax.devices()[0], flush=True)
mm = block_random(N, N, 8, seed=2)
host = BsrMatrix.from_matrix_market(mm)
rng = np.random.default_rng(0)
X = rng.standard_normal((N, K)).astype(np.float32)
want = np.abs(host.spmm(X.astype(np.float64))).sum()
print("host ready", flush=True)
out = {}


def report(tag, A, tol):
    Xd = jnp.asarray(X)

    def step(Xd, A):
        return bsr_spmm(A, Xd)

    got = float(jnp.abs(step(Xd, A)).sum())
    rel = abs(got - want) / want
    assert rel < tol, (tag, rel)
    t = time_kernel(step, (Xd, A), k_small=4, k_large=24,
                    runs=6).seconds_per_iteration
    nb = int(host.blocks.shape[0])
    flops = 2 * nb * A.block_rows * 128 * K
    stream = int(A.blocks.shape[0]) * A.block_rows * 128 \
        * A.blocks.dtype.itemsize
    out[tag] = {"seconds": t, "tflops": flops / t / 1e12,
                "stream_gbps": stream / t / 1e9,
                "checksum_rel_err": rel}
    print(tag, out[tag], flush=True)


report("tree_f32", DeviceBsr.from_host(host, dtype=jnp.float32), 1e-4)
report("tree_bf16", DeviceBsr.from_host(host, dtype=jnp.bfloat16), 1e-2)

with open("experiments/probe57d_tree_shipped.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
