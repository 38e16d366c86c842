"""Probe 39: WELL-CW v4 — what actually binds the level and pool.

Probe 37/38 recap (bench cliff case, 1M x 1M bw=4096, 8/row):
full 584 us; level-only 299 us / 16384 chunks (18.3 ns/chunk, DMA
floor 10.7); pool-only 275 us / 4992 chunks (55 ns).  Select-tree and
dense-slot strip stores did NOT move the level => maybe not VALU-bound.
Folding rowmap into loc did NOT move the pool => its extra DMA stream
wasn't the cost; the 8 masked (64,128) adds are.

Measured here:
  A. level with gather replaced by val-only sum (same DMA, ~no VALU):
     isolates DMA floor vs VALU share.
  B. level with value+loc interleaved into ONE int32 stream
     (k, 2, 8, 128): one buffer instead of two concurrent streams.
  C. level with int16 local_index (12 KB -> 6 KB... actually 8->6 KB
     per chunk): does the widen relayout eat the bandwidth win?
  D. pool repacked with POOL_GROUPS=8 and out_rows=8: scatter drops
     from 8 masked (64,128) adds to 8 masked (8,128) adds; fill cost
     of the narrower pooling measured.
  E. combined: level (out_rows=64 masked add) + 8-group pool.
"""
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.io.generate import banded_random
from spmv_tpu.models import wellcw as W
from spmv_tpu.models.device import (
    DeviceWellCw, DeviceCwPool, _pad_cw_steps, round_up)
from spmv_tpu.ops import pallas_kernels as PK
from spmv_tpu.ops.pallas_kernels import (
    LANE, SUBLANE, _cw_tables, _cw_pool_call, _cw_level_call)
from spmv_tpu.profile.harness import time_kernel

N = 1 << 20


def report(tag, t, nnz):
    print(f"{tag:40s} {t*1e6:9.1f} us  {nnz/t/1e9:7.2f} Gnnz/s",
          flush=True)


def main():
    mm = banded_random(N, half_bandwidth=2048, nnz_per_row=8, seed=1)
    m = W.WellCwMatrix.from_matrix_market(mm)
    A = DeviceWellCw.from_host(m, dtype=jnp.float32)
    nnz = m.num_entries
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    out_rows = SUBLANE * A.blocks_per_out
    padded_groups = round_up(A.num_groups, out_rows)
    lvl_nnz = sum(int((np.asarray(lv.value) != 0).sum())
                  for lv in m.levels)

    def step_lvl(xv, A):
        y = None
        for lvl in A.levels:
            y2d = _cw_level_call(lvl, _cw_tables(lvl, xv),
                                 padded_groups, out_rows, False)
            y = y2d if y is None else y + y2d
        return y.reshape(-1)[:N]

    t_lvl = time_kernel(step_lvl, (x, A)).seconds_per_iteration
    report("level-only baseline (out_rows=64)", t_lvl, lvl_nnz)

    # ---- A. val-only sum: same DMA, no gather ----------------------
    def _lvl_kernel_nop(blk_ref, ws_ref, grp_ref, x_ref, v_ref, l_ref,
                        y_ref, *, d, k, out_rows, dtype):
        i = pl.program_id(0)
        first = jnp.logical_or(
            i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)])
        row_iota = jax.lax.broadcasted_iota(
            jnp.int32, (out_rows, LANE), 0)
        acc_blk = jnp.zeros((out_rows, LANE), dtype=dtype)
        for kk in range(k):
            val = v_ref[kk]
            locv = l_ref[kk]
            # touch loc so its stream isn't dead-code eliminated
            acc = val + (locv & 1).astype(dtype)
            strip = jnp.sum(acc, axis=0, keepdims=True)
            grow = grp_ref[0, 0, kk] % out_rows
            acc_blk = acc_blk + jnp.where(
                row_iota == grow,
                jnp.broadcast_to(strip, (out_rows, LANE)),
                jnp.zeros((out_rows, LANE), dtype=dtype))

        @pl.when(first)
        def _():
            y_ref[:] = acc_blk

        @pl.when(jnp.logical_not(first))
        def _():
            y_ref[:] += acc_blk

    def lvl_call_nop(lvl, xt):
        k = lvl.chunks_per_step
        steps = lvl.num_chunks // k
        kernel = functools.partial(
            _lvl_kernel_nop, d=lvl.d, k=k, out_rows=out_rows,
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

    def step_nop(xv, A):
        y = None
        for lvl in A.levels:
            y2d = lvl_call_nop(lvl, _cw_tables(lvl, xv))
            y = y2d if y is None else y + y2d
        return y.reshape(-1)[:N]

    t_nop = time_kernel(step_nop, (x, A)).seconds_per_iteration
    report("A. level val-only (DMA floor)", t_nop, lvl_nnz)

    # ---- B. one interleaved stream ---------------------------------
    def fuse(lvl):
        v32 = np.asarray(lvl.value).view(np.int32)
        l32 = np.asarray(lvl.local_index)
        fused = np.stack([v32, l32], axis=1)    # (chunks, 2, 8, 128)
        return jnp.asarray(fused)

    def _lvl_kernel_fused(blk_ref, ws_ref, grp_ref, x_ref, vl_ref,
                          y_ref, *, d, k, out_rows, dtype):
        i = pl.program_id(0)
        first = jnp.logical_or(
            i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)])
        row_iota = jax.lax.broadcasted_iota(
            jnp.int32, (out_rows, LANE), 0)
        acc_blk = jnp.zeros((out_rows, LANE), dtype=dtype)
        for kk in range(k):
            a4 = ws_ref[0, 0, kk]
            val = vl_ref[kk, 0].view(dtype)
            locv = vl_ref[kk, 1]
            llane = locv & (LANE - 1)
            sel = (locv >> 7) & (d - 1)
            acc = jnp.zeros((SUBLANE, LANE), dtype=dtype)
            for p in range(d):
                T = x_ref[p, pl.ds(a4, SUBLANE), :]
                gthr = jnp.take_along_axis(T, llane, axis=1)
                acc = acc + jnp.where(sel == p, val * gthr,
                                      jnp.zeros_like(val))
            strip = jnp.sum(acc, axis=0, keepdims=True)
            grow = grp_ref[0, 0, kk] % out_rows
            acc_blk = acc_blk + jnp.where(
                row_iota == grow,
                jnp.broadcast_to(strip, (out_rows, LANE)),
                jnp.zeros((out_rows, LANE), dtype=dtype))

        @pl.when(first)
        def _():
            y_ref[:] = acc_blk

        @pl.when(jnp.logical_not(first))
        def _():
            y_ref[:] += acc_blk

    def lvl_call_fused(lvl, fused, xt):
        k = lvl.chunks_per_step
        steps = lvl.num_chunks // k
        kernel = functools.partial(
            _lvl_kernel_fused, d=lvl.d, k=k, out_rows=out_rows,
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
                    pl.BlockSpec((k, 2, SUBLANE, LANE),
                                 lambda i, blk: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (out_rows, LANE), lambda i, blk: (blk[i], 0),
                    memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (padded_groups, LANE), lvl.value.dtype),
        )(lvl.block_of_step, lvl.anchor4, lvl.group_of_chunk,
          xt, fused)

    fused0 = fuse(A.levels[0])

    def step_fused(xv, A, fused0):
        lvl = A.levels[0]
        y2d = lvl_call_fused(lvl, fused0, _cw_tables(lvl, xv))
        return y2d.reshape(-1)[:N]

    t_fus = time_kernel(step_fused, (x, A, fused0)
                        ).seconds_per_iteration
    report("B. level fused value+loc stream", t_fus, lvl_nnz)
    got = np.asarray(jax.jit(step_fused)(x, A, fused0), np.float64)
    want = np.asarray(jax.jit(step_lvl)(x, A), np.float64)
    print(f"   fused rel err vs baseline: "
          f"{np.linalg.norm(got-want)/np.linalg.norm(want):.2e}")

    # ---- C. int16 local_index --------------------------------------
    def _lvl_kernel_i16(blk_ref, ws_ref, grp_ref, x_ref, v_ref, l_ref,
                        y_ref, *, d, k, out_rows, dtype):
        i = pl.program_id(0)
        first = jnp.logical_or(
            i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)])
        row_iota = jax.lax.broadcasted_iota(
            jnp.int32, (out_rows, LANE), 0)
        acc_blk = jnp.zeros((out_rows, LANE), dtype=dtype)
        for kk in range(k):
            a4 = ws_ref[0, 0, kk]
            locv = l_ref[kk].astype(jnp.int32)
            llane = locv & (LANE - 1)
            sel = (locv >> 7) & (d - 1)
            val = v_ref[kk]
            acc = jnp.zeros((SUBLANE, LANE), dtype=dtype)
            for p in range(d):
                T = x_ref[p, pl.ds(a4, SUBLANE), :]
                gthr = jnp.take_along_axis(T, llane, axis=1)
                acc = acc + jnp.where(sel == p, val * gthr,
                                      jnp.zeros_like(val))
            strip = jnp.sum(acc, axis=0, keepdims=True)
            grow = grp_ref[0, 0, kk] % out_rows
            acc_blk = acc_blk + jnp.where(
                row_iota == grow,
                jnp.broadcast_to(strip, (out_rows, LANE)),
                jnp.zeros((out_rows, LANE), dtype=dtype))

        @pl.when(first)
        def _():
            y_ref[:] = acc_blk

        @pl.when(jnp.logical_not(first))
        def _():
            y_ref[:] += acc_blk

    def lvl_call_i16(lvl, loc16, xt):
        k = lvl.chunks_per_step
        steps = lvl.num_chunks // k
        kernel = functools.partial(
            _lvl_kernel_i16, d=lvl.d, k=k, out_rows=out_rows,
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
          xt, lvl.value, loc16)

    lvl0 = A.levels[0]
    assert int(jnp.max(lvl0.local_index)) < (1 << 15)
    loc16 = lvl0.local_index.astype(jnp.int16)

    def step_i16(xv, A, loc16):
        lvl = A.levels[0]
        y2d = lvl_call_i16(lvl, loc16, _cw_tables(lvl, xv))
        return y2d.reshape(-1)[:N]

    t_i16 = time_kernel(step_i16, (x, A, loc16)).seconds_per_iteration
    report("C. level int16 loc", t_i16, lvl_nnz)
    got = np.asarray(jax.jit(step_i16)(x, A, loc16), np.float64)
    print(f"   i16 rel err vs baseline: "
          f"{np.linalg.norm(got-want)/np.linalg.norm(want):.2e}")

    # ---- D. pool at POOL_GROUPS=8, out_rows=8 ----------------------
    rows, cols, vals, _ = W.sorted_entries_0based(mm)
    d0, cap0, mp0 = W.DEFAULT_LEVELS[0]
    _lvl0, spilled = W._pack_level(N, N, rows, cols, vals, d0, cap0,
                                   mp0)
    for pg in (8, 16):
        W.POOL_GROUPS = pg
        pool, sp = W._pack_pool(N, N, rows[spilled], cols[spilled],
                                vals[spilled], d=4, cap=256)
        W.POOL_GROUPS = 64
        orp = pg                       # out_rows for this pool
        ngp = -(-N // 128)
        pgroups = round_up(ngp, orp)
        kp = 32
        base_grp = pool.pool_of_chunk.astype(np.int64) * orp
        value, loc, ws, _g2, blks, rm = _pad_cw_steps(
            pool.value, pool.local_index, pool.anchor4, base_grp,
            ngp, k=kp, out_rows=orp, rowmap=pool.rowmap)
        a_max = int(pool.anchor4.max(initial=0))
        xr4 = round_up(max(-(-N // (LANE * pool.d)), a_max + SUBLANE),
                       SUBLANE)
        P = DeviceCwPool(
            d=pool.d, num_chunks=int(value.shape[0]),
            chunks_per_step=kp, xr4=int(xr4),
            value=jnp.asarray(value, jnp.float32),
            local_index=jnp.asarray(loc), anchor4=jnp.asarray(ws),
            rowmap=jnp.asarray(rm), block_of_step=jnp.asarray(blks))
        pool_nnz = int((pool.value != 0).sum())
        fill = pool_nnz / pool.value.size
        print(f"   pool groups={pg}: {pool.num_chunks} chunks "
              f"(padded {P.num_chunks}), fill {fill:.3f}, "
              f"spill {sp.size}")

        def step_pool(xv, P):
            y2d = _cw_pool_call(P, _cw_tables(P, xv), pgroups, orp,
                                False)
            return y2d.reshape(-1)[:N]

        t_p = time_kernel(step_pool, (x, P)).seconds_per_iteration
        report(f"D. pool-only groups={pg} out_rows={pg}", t_p,
               pool_nnz)
        # correctness vs numpy
        yref = np.zeros(N)
        tt, ss, ll = np.nonzero(pool.value)
        locv = pool.local_index[tt, ss, ll].astype(np.int64)
        col = (pool.anchor4[tt].astype(np.int64) * pool.d
               + locv >> 7 << 7)
        col = ((pool.anchor4[tt].astype(np.int64) * pool.d) * 128
               + (locv >> 7) * 128 + (locv & 127))
        rowg = pool.rowmap[tt, ss, ll].astype(np.int64) * 128 + ll
        np.add.at(yref, rowg,
                  pool.value[tt, ss, ll] * np.asarray(x)[col])
        got = np.asarray(jax.jit(step_pool)(x, P), np.float64)
        err = np.linalg.norm(got - yref) / max(
            np.linalg.norm(yref), 1e-30)
        print(f"   rel err vs numpy: {err:.2e}")
        if pg == 8:
            P8, sp8, pool8_nnz = P, sp, pool_nnz

    # ---- E. combined: baseline level + 8-group pool ----------------
    def step_comb(xv, A, P8):
        y = None
        for lvl in A.levels:
            y2d = _cw_level_call(lvl, _cw_tables(lvl, xv),
                                 padded_groups, out_rows, False)
            y = y2d if y is None else y + y2d
        yp = _cw_pool_call(P8, _cw_tables(P8, xv),
                           round_up(-(-N // 128), 8), 8, False)
        return (y.reshape(-1)[:N] + yp.reshape(-1)[:N])

    t_c = time_kernel(step_comb, (x, A, P8)).seconds_per_iteration
    placed = lvl_nnz + pool8_nnz
    report("E. combined lvl + pool8", t_c, placed)
    print(f"   (spill-to-remainder {sp8.size} of {nnz})")


if __name__ == "__main__":
    main()
