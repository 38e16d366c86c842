"""Probe 36: WELL-CW gather as ONE wide take instead of d takes.

The CW kernel does d x (slice + take_along_axis + where-select) per
chunk because each phase p has its own stride-d table.  But with the
tables interleaved along lanes — x_wide[r4, p*128+l] = x2d[r4*d+p, l]
— the gather index is simply loc mod (d*128): slot s's row of the
(8, d*128) window IS row a4+s, and the phase select is absorbed into
the lane index.  One slice + one wide take + one FMA per chunk.

Question: does Mosaic lower a 512-lane take_along_axis efficiently
(or at least no worse than our manual 4x(take+where))?
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.io.generate import banded_random
from spmv_tpu.models.device import DeviceWellCw
from spmv_tpu.models.wellcw import WellCwMatrix
from spmv_tpu.ops.pallas_kernels import (
    LANE,
    SUBLANE,
    round_up,
    wellcw_spmv,
)
from spmv_tpu.profile.harness import time_kernel

print("building...", flush=True)
cw_n = 1 << 20
mm = banded_random(cw_n, half_bandwidth=2048, nnz_per_row=8, seed=1)
cw = WellCwMatrix.from_matrix_market(mm)
A = DeviceWellCw.from_host(cw, dtype=jnp.float32)
x = np.random.default_rng(0).standard_normal(cw_n).astype(np.float32)
xd = jnp.asarray(x)
want = cw.spmv(x.astype(np.float64))


def wide_kernel(blk_ref, ws_ref, grp_ref, x_ref, v_ref, l_ref, y_ref,
                *, d, k, out_rows, dtype):
    i = pl.program_id(0)
    first = jnp.logical_or(
        i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)]
    )
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (out_rows, LANE), 0)
    acc_blk = jnp.zeros((out_rows, LANE), dtype=dtype)
    wd = d * LANE
    for kk in range(k):
        a4 = ws_ref[0, 0, kk]
        locv = l_ref[kk]
        widx = locv & (wd - 1)                 # phase*128 + lane
        val = v_ref[kk]
        T = x_ref[pl.ds(a4, SUBLANE), :]       # (8, d*128)
        gthr = jnp.take_along_axis(T, widx, axis=1)   # (8, 128)
        strip = jnp.sum(val * gthr, axis=0, keepdims=True)
        grow = grp_ref[0, 0, kk] % out_rows
        acc_blk = acc_blk + jnp.where(
            row_iota == grow,
            jnp.broadcast_to(strip, (out_rows, LANE)),
            jnp.zeros((out_rows, LANE), dtype=dtype),
        )

    @pl.when(first)
    def _():
        y_ref[:] = acc_blk

    @pl.when(jnp.logical_not(first))
    def _():
        y_ref[:] += acc_blk


def wide_tables(lvl, xf):
    d, xr4 = lvl.d, lvl.xr4
    x2d = jnp.pad(xf, (0, xr4 * d * LANE - xf.shape[0])).reshape(
        xr4, d * LANE)
    return x2d          # row r4 = [x2d rows r4*d .. r4*d+d-1] already!


def wide_call(lvl, xt, padded_groups, out_rows):
    k = lvl.chunks_per_step
    steps = lvl.num_chunks // k
    kernel = functools.partial(
        wide_kernel, d=lvl.d, k=k, out_rows=out_rows,
        dtype=lvl.value.dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((1, 1, k), lambda i, blk: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, k), lambda i, blk: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((k, SUBLANE, LANE),
                             lambda i, blk: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, SUBLANE, LANE),
                             lambda i, blk: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (out_rows, LANE), lambda i, blk: (blk[i], 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (padded_groups, LANE), lvl.value.dtype),
    )(lvl.block_of_step, lvl.anchor4, lvl.group_of_chunk,
      xt, lvl.value, lvl.local_index)


def wide_spmv(xv, A):
    out_rows = SUBLANE * A.blocks_per_out
    padded_groups = round_up(A.num_groups, out_rows)
    xf = xv.astype(A.levels[0].value.dtype)
    y = None
    for lvl in A.levels:
        y2d = wide_call(lvl, wide_tables(lvl, xf), padded_groups,
                        out_rows)
        y = y2d if y is None else y + y2d
    return y.reshape(-1)[:cw_n]


# NOTE: pool level left on the production path for this probe — run
# levels-only for both variants so the comparison is apples-to-apples.
y = np.asarray(jax.jit(wide_spmv)(xd, A))
# compare against the level part of the host decode (exclude pool)
lvl_want = np.zeros(cw_n)
for lv in cw.levels:
    t, s, lane = np.nonzero(lv.value)
    loc = lv.local_index[t, s, lane].astype(np.int64)
    col = ((lv.anchor4[t].astype(np.int64) * lv.d
            + (loc >> 7)) << 7) | (loc & 127)
    row = lv.group_of_chunk[t].astype(np.int64) * 128 + lane
    np.add.at(lvl_want, row, lv.value[t, s, lane] * x[col].astype(np.float64))
rel = np.abs(y - lvl_want).max() / max(np.abs(lvl_want).max(), 1e-30)
print(f"wide-take correctness (levels only): rel={rel:.2e}", flush=True)

t = time_kernel(lambda v, A: wide_spmv(v, A), (xd, A),
                k_small=4, k_large=64, runs=4).seconds_per_iteration
print(f"wide levels-only: {t*1e6:.0f} us", flush=True)


def prod_levels_only(xv, A):
    from spmv_tpu.ops.pallas_kernels import _cw_level_call, _cw_tables
    out_rows = SUBLANE * A.blocks_per_out
    padded_groups = round_up(A.num_groups, out_rows)
    xf = xv.astype(A.levels[0].value.dtype)
    y = None
    for lvl in A.levels:
        y2d = _cw_level_call(lvl, _cw_tables(lvl, xf), padded_groups,
                             out_rows, False)
        y = y2d if y is None else y + y2d
    return y.reshape(-1)[:cw_n]


t2 = time_kernel(lambda v, A: prod_levels_only(v, A), (xd, A),
                 k_small=4, k_large=64, runs=4).seconds_per_iteration
print(f"prod levels-only: {t2*1e6:.0f} us  (wide is {t2/t:.2f}x)",
      flush=True)
