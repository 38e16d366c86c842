"""Probe 57c-small: sanity the staged kernel at a tiny shape first.

The full 57c run hung with zero output — isolate whether the staged
async-copy kernel itself deadlocks (a small shape would hang too) or
the full-size run was a tunnel/compile issue.  Same kernel as
tpu_probe57c_bsr_staged, N=4096 so everything is near-instant.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.io.generate import block_random
from spmv_tpu.models.bsr import BsrMatrix
from spmv_tpu.models.device import DeviceBsr
from spmv_tpu.ops.pallas_kernels import LANE

N = 4096
K = 128
KB = 8
BH = 128

print("device:", jax.devices()[0], flush=True)
mm = block_random(N, N, 8, seed=2)
host = BsrMatrix.from_matrix_market(mm)
rng = np.random.default_rng(0)
X = rng.standard_normal((N, K)).astype(np.float32)
want = np.abs(host.spmm(X.astype(np.float64))).sum()
print("host ready", flush=True)


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


A = DeviceBsr.from_host(host, dtype=jnp.float32)
Xd = jnp.asarray(X)
step = jax.jit(lambda X_, A_: staged_spmm(A_, X_))
t0 = time.perf_counter()
lowered = step.lower(Xd, A).compile()
print("compiled in", time.perf_counter() - t0, "s", flush=True)
t0 = time.perf_counter()
got = float(jnp.abs(lowered(Xd, A)).sum())
print("executed in", time.perf_counter() - t0, "s", flush=True)
rel = abs(got - want) / want
print("checksum rel err", rel, flush=True)
