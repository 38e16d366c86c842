"""Probe 37: WELL-CW pool economics on the bench cliff case.

Round-2 state (BENCH_r02): 592 us / 14.15 Gnnz/s / 0.405 of roofline
on banded_random 1M x 1M bw=4096 ~8nnz/row.  CPU analysis shows the
d=4 pool ladder produces ~30 chunks/pool where ranks 0-8 hold 97% of
pool entries (fills 0.94..0.24) and ranks 12+ are junk (<0.06).

Hypotheses measured here:
  A. level-only vs pool-only time split (is the pool ~half the time?)
  B. select-tree phase combine (log2(d) wheres, one val multiply)
     for the group kernel -- does the DMA-bound level care?
  C. pool at d=16: ONE window covers a 64-group pool's whole column
     span (12288 cols < 16384), so the anchor ladder collapses to a
     pure collision ladder -> ~11 chunks/pool at fill ~0.55 instead
     of ~30 at 0.208.  Costs 16 takes/chunk instead of 4.
  D. rowmap folded into local_index bits (pool stream 12KB -> 8KB per
     chunk, one less VMEM operand).
"""
import dataclasses
import functools
import time

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


def build():
    mm = banded_random(N, half_bandwidth=2048, nnz_per_row=8, seed=1)
    m = W.WellCwMatrix.from_matrix_market(mm)
    A = DeviceWellCw.from_host(m, dtype=jnp.float32)
    return mm, m, A


def report(tag, t, nnz):
    print(f"{tag:34s} {t*1e6:9.1f} us  {nnz/t/1e9:7.2f} Gnnz/s",
          flush=True)


def main():
    mm, m, A = build()
    nnz = m.num_entries
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    out_rows = SUBLANE * A.blocks_per_out
    padded_groups = round_up(A.num_groups, out_rows)

    want = np.abs(m.spmv(np.asarray(x, np.float64))).sum()

    # ---- 1. baseline full ------------------------------------------
    def step_full(xv, A):
        return PK.wellcw_spmv(A, xv)[:N]

    t = time_kernel(step_full, (x, A)).seconds_per_iteration
    got = float(np.abs(np.asarray(jax.jit(step_full)(x, A),
                                  np.float64)).sum())
    print(f"checksum rel err: {abs(got-want)/want:.2e}")
    report("full (baseline)", t, nnz)

    # ---- 2. level-only / pool-only ---------------------------------
    A_lvl = dataclasses.replace(A, pool=None, remainder=None)
    t_lvl = time_kernel(step_full, (x, A_lvl)).seconds_per_iteration
    lvl_nnz = sum(int((np.asarray(lv.value) != 0).sum())
                  for lv in m.levels)
    report("level-only", t_lvl, lvl_nnz)

    def step_pool(xv, A):
        y2d = _cw_pool_call(A.pool, _cw_tables(A.pool, xv),
                            padded_groups, out_rows, False)
        return y2d.reshape(-1)[:N]

    t_pool = time_kernel(step_pool, (x, A)).seconds_per_iteration
    pool_nnz = int((np.asarray(m.pool.value) != 0).sum())
    report("pool-only (d=4 ladder)", t_pool, pool_nnz)
    print(f"  level chunks {sum(lv.num_chunks for lv in A.levels)}, "
          f"pool chunks {A.pool.num_chunks}")

    # ---- 3. select-tree group kernel --------------------------------
    def _cw_kernel_tree(blk_ref, ws_ref, grp_ref, x_ref, v_ref, l_ref,
                        y_ref, *, d, k, out_rows, dtype):
        i = pl.program_id(0)
        first = jnp.logical_or(
            i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)])
        row_iota = jax.lax.broadcasted_iota(
            jnp.int32, (out_rows, LANE), 0)
        acc_blk = jnp.zeros((out_rows, LANE), dtype=dtype)
        for kk in range(k):
            a4 = ws_ref[0, 0, kk]
            locv = l_ref[kk]
            llane = locv & (LANE - 1)
            sel = (locv >> 7) & (d - 1)
            val = v_ref[kk]
            taken = [
                jnp.take_along_axis(
                    x_ref[p, pl.ds(a4, SUBLANE), :], llane, axis=1)
                for p in range(d)
            ]
            # balanced select tree: d-1 wheres, one multiply
            lvl_ = taken
            bit = 0
            while len(lvl_) > 1:
                nxt = []
                for j in range(0, len(lvl_), 2):
                    nxt.append(jnp.where((sel >> bit) & 1 == 1,
                                         lvl_[j + 1], lvl_[j]))
                lvl_ = nxt
                bit += 1
            acc = val * lvl_[0]
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

    def level_call_tree(lvl, xt):
        k = lvl.chunks_per_step
        steps = lvl.num_chunks // k
        kernel = functools.partial(
            _cw_kernel_tree, d=lvl.d, k=k, out_rows=out_rows,
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

    def step_lvl_tree(xv, A):
        y = None
        for lvl in A.levels:
            y2d = level_call_tree(lvl, _cw_tables(lvl, xv))
            y = y2d if y is None else y + y2d
        return y.reshape(-1)[:N]

    t2 = time_kernel(step_lvl_tree, (x, A)).seconds_per_iteration
    report("level-only select-tree", t2, lvl_nnz)

    # ---- 4. pool at d=16 (collision ladder), rm folded in loc ------
    rows, cols, vals, _ = W.sorted_entries_0based(mm)
    cur = np.arange(rows.size)
    d0, cap0, mp0 = W.DEFAULT_LEVELS[0]
    _lvl0, spilled = W._pack_level(N, N, rows, cols, vals, d0, cap0,
                                   mp0)
    cur = cur[spilled]
    t0 = time.time()
    pool16, spill16 = W._pack_pool(N, N, rows[cur], cols[cur],
                                   vals[cur], d=16, cap=256)
    print(f"d=16 pool pack: {time.time()-t0:.1f}s, chunks "
          f"{pool16.num_chunks}, fill "
          f"{(pool16.value != 0).sum()/pool16.value.size:.3f}, "
          f"spill {spill16.size}")

    base_grp = pool16.pool_of_chunk.astype(np.int64) * out_rows
    value, loc, ws, _g2, blks, rm = _pad_cw_steps(
        pool16.value, pool16.local_index, pool16.anchor4, base_grp,
        A.num_groups, k=8, out_rows=out_rows, rowmap=pool16.rowmap)
    a_max = int(pool16.anchor4.max(initial=0))
    xr4 = round_up(max(-(-N // (LANE * 16)), a_max + SUBLANE), SUBLANE)
    # fold relative rowmap into loc bits 14..19 (w<128 -> 7 bits)
    blk_of_chunk = np.repeat(blks, 8)
    rm_rel = rm - (blk_of_chunk * out_rows)[:, None, None]
    assert rm_rel.min() >= 0 and rm_rel.max() < 64
    loc_folded = (loc | (rm_rel.astype(np.int32) << 14)).astype(
        np.int32)

    P16 = DeviceCwPool(
        d=16, num_chunks=int(value.shape[0]), chunks_per_step=8,
        xr4=int(xr4), value=jnp.asarray(value, jnp.float32),
        local_index=jnp.asarray(loc), anchor4=jnp.asarray(ws),
        rowmap=jnp.asarray(rm), block_of_step=jnp.asarray(blks))
    P16f = dataclasses.replace(P16,
                               local_index=jnp.asarray(loc_folded))

    def step_pool16(xv, P):
        y2d = _cw_pool_call(P, _cw_tables(P, xv), padded_groups,
                            out_rows, False)
        return y2d.reshape(-1)[:N]

    p16_nnz = int((pool16.value != 0).sum())
    t3 = time_kernel(step_pool16, (x, P16)).seconds_per_iteration
    report("pool-only d=16 ladder", t3, p16_nnz)

    # folded-rowmap kernel (select-tree too)
    def _cw_pool_kernel_fold(blk_ref, ws_ref, x_ref, v_ref, l_ref,
                             y_ref, *, d, k, out_rows, dtype):
        i = pl.program_id(0)
        first = jnp.logical_or(
            i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)])
        row_iota = jax.lax.broadcasted_iota(
            jnp.int32, (out_rows, LANE), 0)
        acc_blk = jnp.zeros((out_rows, LANE), dtype=dtype)
        for kk in range(k):
            a4 = ws_ref[0, 0, kk]
            locv = l_ref[kk]
            llane = locv & (LANE - 1)
            sel = (locv >> 7) & (d - 1)
            rm = locv >> 14
            val = v_ref[kk]
            taken = [
                jnp.take_along_axis(
                    x_ref[p, pl.ds(a4, SUBLANE), :], llane, axis=1)
                for p in range(d)
            ]
            lvl_ = taken
            bit = 0
            while len(lvl_) > 1:
                nxt = []
                for j in range(0, len(lvl_), 2):
                    nxt.append(jnp.where((sel >> bit) & 1 == 1,
                                         lvl_[j + 1], lvl_[j]))
                lvl_ = nxt
                bit += 1
            acc = val * lvl_[0]
            for s in range(SUBLANE):
                acc_blk = acc_blk + jnp.where(
                    row_iota == rm[s][None, :],
                    jnp.broadcast_to(acc[s][None, :],
                                     (out_rows, LANE)),
                    jnp.zeros((out_rows, LANE), dtype=dtype))

        @pl.when(first)
        def _():
            y_ref[:] = acc_blk

        @pl.when(jnp.logical_not(first))
        def _():
            y_ref[:] += acc_blk

    def pool_call_fold(P, xt):
        k = P.chunks_per_step
        steps = P.num_chunks // k
        kernel = functools.partial(
            _cw_pool_kernel_fold, d=P.d, k=k, out_rows=out_rows,
            dtype=P.value.dtype)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(steps,),
                in_specs=[
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
                (padded_groups, LANE), P.value.dtype),
        )(P.block_of_step, P.anchor4, xt, P.value, P.local_index)

    def step_pool16f(xv, P):
        y2d = pool_call_fold(P, _cw_tables(P, xv))
        return y2d.reshape(-1)[:N]

    t4 = time_kernel(step_pool16f, (x, P16f)).seconds_per_iteration
    report("pool-only d=16 fold+tree", t4, p16_nnz)

    # correctness of the folded variant vs numpy pool eval
    yref = np.zeros(N)
    p = pool16
    tt, ss, ll = np.nonzero(p.value)
    locv = p.local_index[tt, ss, ll].astype(np.int64)
    col = ((p.anchor4[tt].astype(np.int64) * 16
            + (locv >> 7)) << 7) | (locv & 127)
    rowg = p.rowmap[tt, ss, ll].astype(np.int64) * 128 + ll
    np.add.at(yref, rowg, p.value[tt, ss, ll] * np.asarray(x)[col])
    got16 = np.asarray(jax.jit(step_pool16f)(x, P16f), np.float64)
    err = np.linalg.norm(got16 - yref) / max(np.linalg.norm(yref),
                                             1e-30)
    print(f"d=16 fold pool rel err vs numpy: {err:.2e}")

    # ---- 5. combined best: tree level + d16 folded pool ------------
    def step_best(xv, A, P):
        y = None
        for lvl in A.levels:
            y2d = level_call_tree(lvl, _cw_tables(lvl, xv))
            y = y2d if y is None else y + y2d
        y = y + pool_call_fold(P, _cw_tables(P, xv))
        return y.reshape(-1)[:N]

    t5 = time_kernel(step_best, (x, A, P16f)).seconds_per_iteration
    stored = sum(int(lv.value.nbytes + lv.local_index.nbytes)
                 for lv in m.levels) + int(value.nbytes + loc.nbytes)
    eff = stored / t5 / 1e9
    report("combined tree+d16fold", t5, nnz - spill16.size)
    print(f"stored {stored/1e6:.0f} MB, effective {eff:.0f} GB/s, "
          f"fraction-of-819 {eff/819:.3f}")


if __name__ == "__main__":
    main()
