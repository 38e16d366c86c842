"""Probe 57b: the dense ceiling for the BSR SpMM access pattern.

Probe 57 measured baseline 1.407 ms, tree-sum 1.188 ms, concat-K
1.191 ms at the driver shape — so neither the accumulator chain nor
the matmul K-depth explains the distance to the 0.70 ms "roofline".
This probe measures the attainable ceiling: a plain dense streamed
matmul moving the SAME bytes (537 MB block stream in, 64 MB Y out)
with a FIXED resident X (no scalar-prefetch, no dynamic VMEM
indexing, no first-of-row select).  If the ceiling lands near 1.1 ms,
the BSR kernel is near-optimal and the 0.70 ms roofline (spec-sheet
HBM bandwidth, no read+write mixing penalty) was mis-specified —
the fix is the model, not the kernel.

Also re-measures concat-K with bf16 blocks (probe 57 died before it).
"""

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.io.generate import block_random
from spmv_tpu.models.bsr import BsrMatrix
from spmv_tpu.models.device import DeviceBsr
from spmv_tpu.ops.pallas_kernels import LANE
from spmv_tpu.profile.harness import time_kernel

N = 1 << 17
K = 128
KB = 8
BH = 128

mm = block_random(N, N, 8, seed=2)
host = BsrMatrix.from_matrix_market(mm)
A = DeviceBsr.from_host(host, dtype=jnp.float32)
rng = np.random.default_rng(0)
out = {}


def transpose_blocks(blocks_np):
    ns = blocks_np.shape[0] // KB
    return np.ascontiguousarray(
        blocks_np.reshape(ns, KB, BH, LANE)
        .transpose(0, 2, 1, 3).reshape(ns, BH, KB * LANE))


blocks_host = np.asarray(A.blocks)
blocks_t = jnp.asarray(transpose_blocks(blocks_host))
NS = blocks_t.shape[0]
FLOPS = 2 * A.num_blocks * BH * LANE * K


def _dense_kernel(blk_ref, x_ref, y_ref, *, dtype):
    y_ref[0] = jnp.dot(blk_ref[0], x_ref[:],
                       preferred_element_type=dtype)


def _dense(bt, xfix, dtype):
    return pl.pallas_call(
        functools.partial(_dense_kernel, dtype=jnp.float32),
        grid=(NS,),
        in_specs=[
            pl.BlockSpec((1, BH, KB * LANE), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KB * LANE, K), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BH, K), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NS, BH, K), jnp.float32),
    )(bt, xfix)


@jax.jit
def dense_step(xfix, bt):
    y = _dense(bt, xfix, jnp.float32)
    # feed a (KB*LANE, K)-shaped function of y back so the timing
    # harness can chain iterations
    return y.reshape(NS * BH, K)[: KB * LANE]


xfix = jnp.asarray(rng.standard_normal((KB * LANE, K)), jnp.float32)
t = time_kernel(dense_step, (xfix, blocks_t), k_small=4, k_large=24,
                runs=6).seconds_per_iteration
out["D_dense_ceiling_f32"] = {
    "seconds": t, "tflops": FLOPS / t / 1e12,
    "stream_bytes": int(blocks_t.size * 4 + NS * BH * K * 4),
    "achieved_gbps": (blocks_t.size * 4 + NS * BH * K * 4) / t / 1e9,
}
print("D_dense_ceiling_f32", out["D_dense_ceiling_f32"], flush=True)

# bf16 dense ceiling (the bf16 BSR leg's access pattern)
blocks_tb = jnp.asarray(blocks_t, jnp.bfloat16)


@jax.jit
def dense_step_bf16(xfix, bt):
    y = pl.pallas_call(
        functools.partial(_dense_kernel, dtype=jnp.float32),
        grid=(NS,),
        in_specs=[
            pl.BlockSpec((1, BH, KB * LANE), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KB * LANE, K), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BH, K), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NS, BH, K), jnp.float32),
    )(bt, xfix)
    return (y.reshape(NS * BH, K)[: KB * LANE]).astype(jnp.bfloat16)


xfb = jnp.asarray(rng.standard_normal((KB * LANE, K)), jnp.bfloat16)
t = time_kernel(dense_step_bf16, (xfb, blocks_tb), k_small=4,
                k_large=24, runs=6).seconds_per_iteration
out["D_dense_ceiling_bf16"] = {
    "seconds": t, "tflops": FLOPS / t / 1e12,
    "stream_bytes": int(blocks_tb.size * 2 + NS * BH * K * 4),
    "achieved_gbps": (blocks_tb.size * 2 + NS * BH * K * 4) / t / 1e9,
}
print("D_dense_ceiling_bf16", out["D_dense_ceiling_bf16"], flush=True)

with open("experiments/probe57b_bsr_ceiling.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
