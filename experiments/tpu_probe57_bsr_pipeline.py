"""Probe 57: where does BSR SpMM's remaining ~2x to roofline go?

Probe 54 (RESULTS.md "Reconciliation") measured the whole-X path at
the driver shape (131072 rows, 8 blocks/block-row = 537 MB block
stream, k=128) at 0.58 (f32) / 0.50 (bf16) of max(stream, MXU)
roofline, and attributed the shared gap to "pipeline depth
(sequential kb-dot chain into one accumulator)".  This probe tests
that attribution with four kernels at the same shape:

A. baseline        — the shipped kernel: kb=8 chained
                     (128,128)@(128,128) dots, acc = acc + dot.
B. tree-sum        — same 8 dots, pairwise-summed (dependency depth
                     log2(kb) instead of kb).  Isolates the
                     accumulator chain from the matmul shape.
C. concat-K        — blocks pre-laid per step as (bh, kb*128); the
                     kb X tiles are gathered and concatenated in
                     VMEM to (kb*128, k); ONE dot with K=1024.
                     An MXU 128x128x128 matmul spends ~half its
                     cycles filling/draining the systolic array;
                     K=1024 amortizes that 8x.
D. dense control   — same as C but X fixed (no gather/concat): a
                     plain (bh,1024)@(1024,k) streamed matmul.  The
                     attainable ceiling for this data volume.

Verdict goes to experiments/probe57_bsr_pipeline.json and RESULTS.md.
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
from spmv_tpu.ops.pallas_kernels import LANE, bsr_spmm
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


def report(tag, step, args, flops, check=True):
    if check:
        got = float(jnp.abs(step(*args)).sum())
        rel = abs(got - want) / want
    else:
        rel = None
    t = time_kernel(step, args, k_small=4, k_large=24,
                    runs=6).seconds_per_iteration
    out[tag] = {"seconds": t, "tflops": flops / t / 1e12,
                "checksum_rel_err": rel}
    print(tag, out[tag], flush=True)


def make_inputs(dtype):
    A = DeviceBsr.from_host(host, dtype=dtype)
    Xd = jnp.asarray(X)
    nsteps = A.num_blocks // KB
    flops = 2 * A.num_blocks * BH * LANE * K
    return A, Xd, nsteps, flops


# ---------------------------------------------------------------- A
A, Xd, nsteps, flops = make_inputs(jnp.float32)
report("A_baseline_f32", lambda X_, A_: bsr_spmm(A_, X_), (Xd, A),
       flops)


# ---------------------------------------------------------------- B
def _tree_kernel(bcol_ref, brow_ref, x_ref, blk_ref, y_ref, *, kb,
                 dtype):
    t = pl.program_id(0)
    first = jnp.logical_or(
        t == 0, brow_ref[t] != brow_ref[jnp.maximum(t - 1, 0)])
    ds = [jnp.dot(blk_ref[i], x_ref[bcol_ref[t * kb + i]],
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


def run_wholex(kernel_fn, A, Xd, blocks, blk_block_shape, vmem_extra):
    ncb = A.num_block_cols
    k = Xd.shape[1]
    x3d = jnp.pad(Xd.astype(blocks.dtype),
                  ((0, ncb * LANE - Xd.shape[0]), (0, 0))
                  ).reshape(ncb, LANE, k)
    acc_dtype = (jnp.float32 if blocks.dtype == jnp.bfloat16
                 else blocks.dtype)
    x_bytes = ncb * LANE * k * x3d.dtype.itemsize
    vmem_limit = x_bytes + vmem_extra + 12 * 1024 * 1024
    y3d = pl.pallas_call(
        functools.partial(kernel_fn, kb=KB, dtype=acc_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(A.num_blocks // KB,),
            in_specs=[
                pl.BlockSpec((ncb, LANE, k),
                             lambda t, bc, br: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(blk_block_shape,
                             lambda t, bc, br: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BH, k),
                                   lambda t, bc, br: (br[t], 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((A.num_block_rows, BH, k),
                                       acc_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit)),
    )(A.block_col, A.block_row, x3d, blocks)
    return y3d.reshape(-1, k)[: A.num_rows]


tree_step = jax.jit(lambda X_, A_: run_wholex(
    _tree_kernel, A_, X_, A_.blocks, (KB, BH, LANE),
    2 * (KB * BH * LANE * 4 + BH * K * 4)))
report("B_treesum_f32", tree_step, (Xd, A), flops)


# ---------------------------------------------------------------- C
def _concat_kernel(bcol_ref, brow_ref, x_ref, blk_ref, y_ref, *, kb,
                   dtype):
    t = pl.program_id(0)
    first = jnp.logical_or(
        t == 0, brow_ref[t] != brow_ref[jnp.maximum(t - 1, 0)])
    xcat = jnp.concatenate(
        [x_ref[bcol_ref[t * kb + i]] for i in range(kb)], axis=0)
    acc = jnp.dot(blk_ref[0], xcat, preferred_element_type=dtype)

    @pl.when(first)
    def _():
        y_ref[0] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        y_ref[0] += acc


def transpose_blocks(blocks_np):
    ns = blocks_np.shape[0] // KB
    return np.ascontiguousarray(
        blocks_np.reshape(ns, KB, BH, LANE)
        .transpose(0, 2, 1, 3).reshape(ns, BH, KB * LANE))


blocks_t = jnp.asarray(transpose_blocks(np.asarray(A.blocks)))
concat_step = jax.jit(lambda X_, A_, bt: run_wholex(
    _concat_kernel, A_, X_, bt, (1, BH, KB * LANE),
    2 * (BH * KB * LANE * 4 + BH * K * 4) + KB * LANE * K * 4))
report("C_concatK_f32", concat_step, (Xd, A, blocks_t), flops)


# ---------------------------------------------------------------- D
def _dense_kernel(blk_ref, x_ref, y_ref, *, dtype):
    y_ref[0] = jnp.dot(blk_ref[0], x_ref[:],
                       preferred_element_type=dtype)


def dense_step(bt, xfix):
    ns = bt.shape[0]
    return pl.pallas_call(
        functools.partial(_dense_kernel, dtype=jnp.float32),
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((1, BH, KB * LANE), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KB * LANE, K), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BH, K), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ns, BH, K), jnp.float32),
    )(bt, xfix)


xfix = jnp.asarray(rng.standard_normal((KB * LANE, K)), jnp.float32)
report("D_dense_control_f32", jax.jit(dense_step), (blocks_t, xfix),
       flops, check=False)

# ------------------------------------------------- bf16 for C and D
Ab, _, _, _ = make_inputs(jnp.bfloat16)
blocks_tb = jnp.asarray(transpose_blocks(
    np.asarray(A.blocks)), jnp.bfloat16)
report("C_concatK_bf16", concat_step, (Xd, Ab, blocks_tb), flops)

with open("experiments/probe57_bsr_pipeline.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
