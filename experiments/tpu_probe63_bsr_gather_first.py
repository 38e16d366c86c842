"""Probe 63: BSR whole-X kernel — gather-first issue order (VERDICT
r4 item 7, the last in-bounds lever before pinning the ceiling).

The f32 BSR SpMM sits at 0.58 of roofline; probes 57/57b/57c/57d
isolated the gap to Mosaic's SYNCHRONOUS staging of the
dynamically-indexed X operand (x_ref[bcol[t*kb+i]]) — each dot waits
for its operand copy.  Explicit async VMEM->VMEM staging measured
NEGATIVE (57c, dead-listed).  Untried: reordering the JAX-level
instruction stream so all kb gathers are materialized (jnp.stack)
BEFORE the dot chain — if Mosaic schedules the copies back-to-back it
may overlap later copies with earlier dots; if it materializes a
stacked scratch first it serializes the same copies and adds a
buffer.  kb splits (4/8/16) were already measured in probe 55/57d
(kb=8 optimal: 4 pays step overhead, 16 pays zero-block padding at
8 blocks/row).

Either way the result pins the ceiling with a toolchain fingerprint:
jax/jaxlib 0.9.0, libtpu 0.0.34 — re-measure when these move.
"""

import ctypes
import functools
import json

try:  # bench._tune_malloc: first-touch faults are ~5 ms/MB here
    _libc = ctypes.CDLL(None, use_errno=True)
    _libc.mallopt(-3, 1 << 30)
    _libc.mallopt(-1, 1 << 30)
except Exception:
    pass

import jax
import jax.numpy as jnp
import numpy as np
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.io.generate import block_random
from spmv_tpu.models.bsr import BsrMatrix
from spmv_tpu.models.device import DeviceBsr
from spmv_tpu.ops.pallas_kernels import LANE, bsr_spmm, _tree_sum
from spmv_tpu.profile.harness import time_kernel

N = 1 << 17
K = 128

print("device:", jax.devices()[0], "jax", jax.__version__, flush=True)
import time as _t
_t0 = _t.perf_counter()
mm = block_random(N, N, 8, seed=2)  # the driver BSR shape
print("gen done", _t.perf_counter()-_t0, flush=True)
host = BsrMatrix.from_matrix_market(mm, block_rows=128)
print("bsr done", _t.perf_counter()-_t0, flush=True)
A = DeviceBsr.from_host(host, dtype=jnp.float32)
print("device put done", _t.perf_counter()-_t0, flush=True)
rng = np.random.default_rng(0)
X = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32))
flops = 2.0 * mm.num_entries * K

out = {"jax": jax.__version__, "libtpu": "0.0.34"}

t_ship = time_kernel(lambda x: bsr_spmm(A, x), (X,), k_small=4,
                     k_large=24, runs=6).seconds_per_iteration
out["shipped_seconds"] = t_ship
out["shipped_tflops"] = flops / t_ship / 1e12
print("shipped", json.dumps(out), flush=True)


def _wholex_gather_first(bcol_ref, brow_ref, x_ref, blk_ref, y_ref,
                         *, kb, dtype):
    t = pl.program_id(0)
    first = jnp.logical_or(
        t == 0, brow_ref[t] != brow_ref[jnp.maximum(t - 1, 0)]
    )
    # materialize ALL kb X tiles before any dot
    xs = [x_ref[bcol_ref[t * kb + i]] for i in range(kb)]
    xs = [jnp.asarray(x) for x in xs]
    acc = _tree_sum([
        jnp.dot(blk_ref[i], xs[i], preferred_element_type=dtype)
        for i in range(kb)
    ])

    @pl.when(first)
    def _():
        y_ref[0] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        y_ref[0] += acc


def call_variant(kernel_fn):
    ncb = A.num_block_cols
    kb, bh = A.blocks_per_step, A.block_rows
    xf = X.astype(A.blocks.dtype)
    x3d = jnp.pad(xf, ((0, ncb * LANE - X.shape[0]), (0, 0))
                  ).reshape(ncb, LANE, K)
    x_bytes = ncb * LANE * K * 4
    vmem = x_bytes + 2 * (kb * bh * LANE * 4 + bh * K * 4) \
        + 12 * 1024 * 1024
    kern = functools.partial(kernel_fn, kb=kb, dtype=jnp.float32)

    @jax.jit
    def run(x3d):
        y3d = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(A.num_blocks // kb,),
                in_specs=[
                    pl.BlockSpec((ncb, LANE, K),
                                 lambda t, bc, br: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((kb, bh, LANE),
                                 lambda t, bc, br: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, bh, K), lambda t, bc, br: (br[t], 0, 0),
                    memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (A.num_block_rows, bh, K), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(vmem)),
        )(A.block_col, A.block_row, x3d, A.blocks)
        return y3d

    return run, x3d


run_gf, x3d = call_variant(_wholex_gather_first)
y_ref = bsr_spmm(A, X)
y_gf = run_gf(x3d).reshape(-1, K)[: A.num_rows]
rel = float(jnp.abs(y_gf - y_ref).max()
            / jnp.maximum(jnp.abs(y_ref).max(), 1e-30))
t_gf = time_kernel(run_gf, (x3d,), k_small=4, k_large=24,
                   runs=6).seconds_per_iteration
out["gather_first"] = {
    "rel_err": rel,
    "seconds": t_gf,
    "tflops": flops / t_gf / 1e12,
    "vs_shipped": t_ship / t_gf,
}
print("gather_first", json.dumps(out["gather_first"]), flush=True)
print(json.dumps(out))
