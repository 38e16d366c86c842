"""Probe 57c: hide the X-gather staging copy behind the MXU.

Probe 57 narrowed the BSR whole-X gap: baseline/tree-sum/concat-K all
sit at ~1.19-1.41 ms while the dense control (same bytes, static X
operand) runs 0.759 ms (probe 57b).  The delta (~0.43 ms) matches the
512 KB/step staging copy Mosaic inserts for a dynamically-indexed MXU
operand (1024 steps x 512 KB at ~1.2 TB/s VMEM).

This probe makes the staging explicit and ASYNC: a two-slot
(kb, LANE, K) VMEM scratch, with step t+1's eight X tiles copied
VMEM->VMEM (dynamic source index, static destination) while step t's
dots run.  If the copy hides, f32 should land near the 0.76 ms
ceiling (0.58 -> ~0.9 of roofline).
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
rng = np.random.default_rng(0)
X = rng.standard_normal((N, K)).astype(np.float32)
want = np.abs(host.spmm(X.astype(np.float64))).sum()
out = {}


def _staged_kernel(bcol_ref, brow_ref, x_ref, blk_ref, y_ref, xstage,
                   sems, *, kb, dtype, nsteps):
    t = pl.program_id(0)
    first = jnp.logical_or(
        t == 0, brow_ref[t] != brow_ref[jnp.maximum(t - 1, 0)])

    def start(slot, tt):
        for i in range(kb):
            pltpu.make_async_copy(
                x_ref.at[bcol_ref[tt * kb + i]],
                xstage.at[slot, i],
                sems.at[slot, i],
            ).start()

    def wait(slot):
        for i in range(kb):
            pltpu.make_async_copy(
                x_ref.at[bcol_ref[0]], xstage.at[slot, i],
                sems.at[slot, i],
            ).wait()

    @pl.when(t == 0)
    def _():
        start(0, 0)

    @pl.when(t + 1 < nsteps)
    def _():
        start((t + 1) % 2, t + 1)

    slot = t % 2
    wait(slot)
    ds = [jnp.dot(blk_ref[i], xstage[slot, i],
                  preferred_element_type=dtype) for i in range(kb)]
    while len(ds) > 1:
        ds = [ds[i] + ds[i + 1] for i in range(0, len(ds), 2)]
    acc = ds[0]

    @pl.when(first)
    def _():
        y_ref[0] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        y_ref[0] += acc


def staged_spmm(A, Xd):
    ncb = A.num_block_cols
    k = Xd.shape[1]
    x3d = jnp.pad(Xd.astype(A.blocks.dtype),
                  ((0, ncb * LANE - Xd.shape[0]), (0, 0))
                  ).reshape(ncb, LANE, k)
    acc_dtype = (jnp.float32 if A.blocks.dtype == jnp.bfloat16
                 else A.blocks.dtype)
    nsteps = A.num_blocks // KB
    itemsize = jnp.dtype(x3d.dtype).itemsize
    x_bytes = ncb * LANE * k * itemsize
    stage_bytes = 2 * KB * LANE * k * itemsize
    tile_bytes = 2 * (KB * BH * LANE * itemsize + BH * k * 4)
    vmem_limit = x_bytes + stage_bytes + tile_bytes + 12 * 1024 * 1024
    y3d = pl.pallas_call(
        functools.partial(_staged_kernel, kb=KB, dtype=acc_dtype,
                          nsteps=nsteps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((ncb, LANE, k),
                             lambda t, bc, br: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KB, BH, LANE),
                             lambda t, bc, br: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BH, k),
                                   lambda t, bc, br: (br[t], 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, KB, LANE, k), x3d.dtype),
                pltpu.SemaphoreType.DMA((2, KB)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((A.num_block_rows, BH, k),
                                       acc_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit)),
    )(A.block_col, A.block_row, x3d, A.blocks)
    return y3d.reshape(-1, k)[: A.num_rows]


def report(tag, A):
    Xd = jnp.asarray(X)
    step = jax.jit(lambda X_, A_: staged_spmm(A_, X_))
    got = float(jnp.abs(step(Xd, A)).sum())
    rel = abs(got - want) / want
    t = time_kernel(step, (Xd, A), k_small=4, k_large=24,
                    runs=6).seconds_per_iteration
    flops = 2 * A.num_blocks * BH * LANE * K
    out[tag] = {"seconds": t, "tflops": flops / t / 1e12,
                "checksum_rel_err": rel}
    print(tag, out[tag], flush=True)


report("staged_f32", DeviceBsr.from_host(host, dtype=jnp.float32))
report("staged_bf16", DeviceBsr.from_host(host, dtype=jnp.bfloat16))

with open("experiments/probe57c_bsr_staged.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
