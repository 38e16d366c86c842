"""Probe 47: merged level+pool grid, one 144-chunk step per block.

Probe 46: ~280 ns/step grid overhead, vonly floor 189 us, gather
+96 us.  Structure: with the dense CAP=2 level (128 chunks per
64-group block) and the cap=16/kp=16 stage1 pool (exactly 16 padded
chunks per pool = per block), every block is EXACTLY 144 chunks ->
KL=144, one step per block, 128 steps total:

  - kk in [0,128): level chunk, static grow = kk//2, scalar mask
  - kk in [128,144): pool chunk, rm folded in loc bits 14..19,
    8 per-lane masked adds
  - one output visit per block, no type flags, no padding waste

Expected ~230-250 us for level+stage1 (vs 297+135 separate).
Tail: pg=128 cap=16 pool + XLA CSR remainder.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.io.generate import banded_random
from spmv_tpu.models import wellcw as W
from spmv_tpu.models.device import (
    DeviceCwPool, _pad_cw_steps, round_up)
from spmv_tpu.ops.pallas_kernels import (
    LANE, SUBLANE, _cw_tables, _cw_pool_call)
from spmv_tpu.profile.harness import time_kernel

N = 1 << 20
CAP = 2
BLOCK_GROUPS = 64
LVL_PER_BLOCK = BLOCK_GROUPS * CAP      # 128
POOL_PER_BLOCK = 16
KL = LVL_PER_BLOCK + POOL_PER_BLOCK     # 144


def report(tag, t, nnz):
    print(f"{tag:46s} {t*1e6:9.1f} us  {nnz/t/1e9:7.2f} Gnnz/s",
          flush=True)


def pack_level_dense(rows, cols, vals, ng_pad):
    d, cap, mp = W.DEFAULT_LEVELS[0]
    lvl, spilled = W._pack_level(N, N, rows, cols, vals, d, cap, mp)
    ng = -(-N // 128)
    grp = lvl.group_of_chunk.astype(np.int64)
    g_all = rows >> 7
    x2drow = cols >> 7
    glo, ghi = W._grouped_minmax(g_all, x2drow, ng)
    a_low = np.where(ghi < 0, 0, np.maximum(glo // d, 0))
    rank = (lvl.anchor4.astype(np.int64) != a_low[grp]).astype(
        np.int64)
    same = np.flatnonzero(np.concatenate(
        ([False], (grp[1:] == grp[:-1]) & (rank[1:] == rank[:-1]))))
    rank[same] = 1
    slot = grp * CAP + rank
    value = np.zeros((ng_pad * CAP, 8, 128), np.float32)
    loc = np.zeros((ng_pad * CAP, 8, 128), np.int32)
    a4 = np.zeros(ng_pad * CAP, np.int32)
    value[slot] = lvl.value
    loc[slot] = lvl.local_index
    a4[slot] = lvl.anchor4
    return value, loc, a4, spilled, d


def _merged_kernel(ws_ref, x_ref, v_ref, l_ref, y_ref, *, d, dtype):
    row_iota = jax.lax.broadcasted_iota(
        jnp.int32, (BLOCK_GROUPS, LANE), 0)
    acc_blk = jnp.zeros((BLOCK_GROUPS, LANE), dtype=dtype)
    for kk in range(KL):
        a4 = ws_ref[0, 0, kk]
        locv = l_ref[kk]
        llane = locv & (LANE - 1)
        sel = (locv >> 7) & (d - 1)
        val = v_ref[kk]
        g = jnp.zeros((SUBLANE, LANE), dtype=dtype)
        for p in range(d):
            T = x_ref[p, pl.ds(a4, SUBLANE), :]
            gthr = jnp.take_along_axis(T, llane, axis=1)
            g = g + jnp.where(sel == p, gthr, jnp.zeros_like(gthr))
        acc = val * g
        if kk < LVL_PER_BLOCK:
            strip = jnp.sum(acc, axis=0, keepdims=True)
            acc_blk = acc_blk + jnp.where(
                row_iota == (kk // CAP),
                jnp.broadcast_to(strip, (BLOCK_GROUPS, LANE)),
                jnp.zeros((BLOCK_GROUPS, LANE), dtype=dtype))
        else:
            rm = locv >> 14
            for s in range(SUBLANE):
                acc_blk = acc_blk + jnp.where(
                    row_iota == rm[s][None, :],
                    jnp.broadcast_to(acc[s][None, :],
                                     (BLOCK_GROUPS, LANE)),
                    jnp.zeros((BLOCK_GROUPS, LANE), dtype=dtype))
    y_ref[:] = acc_blk


def merged_call(value, loc, ws, xt, d, padded_groups):
    steps = value.shape[0] // KL
    kernel = functools.partial(_merged_kernel, d=d,
                               dtype=value.dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((1, 1, KL), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((KL, SUBLANE, LANE),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KL, SUBLANE, LANE),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (BLOCK_GROUPS, LANE), lambda i: (i, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((padded_groups, LANE),
                                       value.dtype),
    )(ws, xt, value, loc)


def build_pool_device(pool, out_rows, kp, ng):
    base_grp = pool.pool_of_chunk.astype(np.int64) * out_rows
    value, loc, ws, _g2, blks, rm = _pad_cw_steps(
        pool.value, pool.local_index, pool.anchor4, base_grp,
        ng, k=kp, out_rows=out_rows, rowmap=pool.rowmap)
    a_max = int(pool.anchor4.max(initial=0))
    xr4 = round_up(max(-(-N // (LANE * pool.d)), a_max + SUBLANE),
                   SUBLANE)
    return DeviceCwPool(
        d=pool.d, num_chunks=int(value.shape[0]), chunks_per_step=kp,
        xr4=int(xr4), value=jnp.asarray(value, jnp.float32),
        local_index=jnp.asarray(loc), anchor4=jnp.asarray(ws),
        rowmap=jnp.asarray(rm), block_of_step=jnp.asarray(blks))


def pool_numpy(pool, x, y):
    tt, ss, ll = np.nonzero(pool.value)
    locv = pool.local_index[tt, ss, ll].astype(np.int64)
    col = ((pool.anchor4[tt].astype(np.int64) * pool.d) * 128
           + (locv >> 7) * 128 + (locv & 127))
    rowg = pool.rowmap[tt, ss, ll].astype(np.int64) * 128 + ll
    np.add.at(y, rowg, pool.value[tt, ss, ll] * np.asarray(x)[col])


def main():
    mm = banded_random(N, half_bandwidth=2048, nnz_per_row=8, seed=1)
    nnz = mm.num_entries
    rows, cols, vals, _ = W.sorted_entries_0based(mm)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    ng = -(-N // 128)
    ng_pad = round_up(ng, BLOCK_GROUPS)
    num_blocks = ng_pad // BLOCK_GROUPS

    lv_value, lv_loc, lv_a4, spilled, d = pack_level_dense(
        rows, cols, vals, ng_pad)

    # stage1 pool: cap=16 => after _pad_cw_steps(kp=16) exactly 16
    # chunks per pool (pool i == block i)
    p1, sp1 = W._pack_pool(N, N, rows[spilled], cols[spilled],
                           vals[spilled], d=4, cap=POOL_PER_BLOCK)
    cur2 = spilled[sp1]
    n1 = int((p1.value != 0).sum())
    base_grp = p1.pool_of_chunk.astype(np.int64) * BLOCK_GROUPS
    pv, plc, pws, _g2, pblks, prm = _pad_cw_steps(
        p1.value, p1.local_index, p1.anchor4, base_grp, ng,
        k=POOL_PER_BLOCK, out_rows=BLOCK_GROUPS, rowmap=p1.rowmap)
    assert pv.shape[0] == num_blocks * POOL_PER_BLOCK, pv.shape
    # fold rm (relative to block) into loc bits 14..19
    blk_of_chunk = np.repeat(np.arange(num_blocks), POOL_PER_BLOCK)
    rm_rel = prm - (blk_of_chunk * BLOCK_GROUPS)[:, None, None]
    assert rm_rel.min() >= 0 and rm_rel.max() < BLOCK_GROUPS
    plc = (plc | (rm_rel.astype(np.int32) << 14)).astype(np.int32)
    pws2 = pws.reshape(-1, POOL_PER_BLOCK)

    # merge: per block 128 level chunks + 16 pool chunks
    S = num_blocks
    value = np.zeros((S * KL, 8, 128), np.float32)
    loc = np.zeros((S * KL, 8, 128), np.int32)
    a4m = np.zeros((S, 1, KL), np.int32)
    li = np.arange(S * KL).reshape(S, KL)
    lv_ix = np.arange(S * LVL_PER_BLOCK).reshape(S, LVL_PER_BLOCK)
    po_ix = np.arange(S * POOL_PER_BLOCK).reshape(S, POOL_PER_BLOCK)
    value[li[:, :LVL_PER_BLOCK].ravel()] = lv_value[lv_ix.ravel()]
    loc[li[:, :LVL_PER_BLOCK].ravel()] = lv_loc[lv_ix.ravel()]
    value[li[:, LVL_PER_BLOCK:].ravel()] = pv[po_ix.ravel()]
    loc[li[:, LVL_PER_BLOCK:].ravel()] = plc[po_ix.ravel()]
    a4m[:, 0, :LVL_PER_BLOCK] = lv_a4.reshape(S, LVL_PER_BLOCK)
    a4m[:, 0, LVL_PER_BLOCK:] = pws2

    a_max = int(a4m.max(initial=0))
    xr4 = round_up(max(-(-N // (LANE * d)), a_max + SUBLANE), SUBLANE)

    class XT:
        pass
    XT.d, XT.xr4 = d, xr4

    jvalue, jloc, jws = (jnp.asarray(value), jnp.asarray(loc),
                         jnp.asarray(a4m))

    def step_merged(xv, value, loc, ws):
        xt = _cw_tables(XT, xv)
        return merged_call(value, loc, ws, xt, d, ng_pad
                           ).reshape(-1)[:N]

    lvl_nnz = int((lv_value != 0).sum())
    t_m = time_kernel(step_merged, (x, jvalue, jloc, jws)
                      ).seconds_per_iteration
    report(f"merged level+stage1 (KL={KL}, {S} steps)", t_m,
           lvl_nnz + n1)

    # numpy reference for merged
    yref = np.zeros(N)
    tt, ss, ll = np.nonzero(lv_value)
    locv = lv_loc[tt, ss, ll].astype(np.int64)
    col = (lv_a4[tt].astype(np.int64) * d * 128 + (locv >> 7) * 128
           + (locv & 127))
    rowg = (tt // CAP) * 128 + ll
    np.add.at(yref, rowg, lv_value[tt, ss, ll].astype(np.float64)
              * np.asarray(x, np.float64)[col])
    pool_numpy(p1, x, yref)
    got = np.asarray(jax.jit(step_merged)(x, jvalue, jloc, jws),
                     np.float64)
    err = np.linalg.norm(got - yref) / np.linalg.norm(yref)
    print(f"   merged rel err vs numpy: {err:.2e}")

    # ---- tail -------------------------------------------------------
    W.POOL_GROUPS = 128
    p2, sp2 = W._pack_pool(N, N, rows[cur2], cols[cur2], vals[cur2],
                           d=4, cap=16)
    W.POOL_GROUPS = 64
    n2 = int((p2.value != 0).sum())
    P2 = build_pool_device(p2, 128, 16, ng)
    pg128 = round_up(ng, 128)
    print(f"tail pg128 cap16: {p2.num_chunks}->{P2.num_chunks} ch, "
          f"fill {n2/p2.value.size:.3f}, rem {sp2.size}")

    def step_tail(xv, P):
        y2d = _cw_pool_call(P, _cw_tables(P, xv), pg128, 128, False)
        return y2d.reshape(-1)[:N]

    t_t = time_kernel(step_tail, (x, P2)).seconds_per_iteration
    report("tail pool", t_t, n2)

    # ---- full -------------------------------------------------------
    from spmv_tpu.models.csr import CsrMatrix
    from spmv_tpu.models.device import DeviceCsr
    rem_ix = cur2[sp2]
    r_rows, r_cols, r_vals = (rows[rem_ix], cols[rem_ix],
                              vals[rem_ix])
    order = np.argsort(r_rows, kind="stable")
    rptr = np.zeros(N + 1, np.int64)
    np.add.at(rptr, r_rows[order] + 1, 1)
    rptr = np.cumsum(rptr)
    rem = CsrMatrix(num_rows=N, num_columns=N,
                    num_entries=int(rem_ix.size), row_alignment=1,
                    row_ptr=rptr.astype(np.int64),
                    column_index=r_cols[order].astype(np.int32),
                    value=r_vals[order].astype(np.float64))
    Drem = DeviceCsr.from_host(rem, dtype=jnp.float32)
    from spmv_tpu.ops.spmv import spmv as xla_spmv

    def step_full(xv, value, loc, ws, P2, Drem):
        xt = _cw_tables(XT, xv)
        y = merged_call(value, loc, ws, xt, d, ng_pad)
        y = y + _cw_pool_call(P2, _cw_tables(P2, xv), pg128, 128,
                              False)[:ng_pad]
        yf = y.reshape(-1)[:N]
        return yf + xla_spmv(Drem, xv)

    args = (x, jvalue, jloc, jws, P2, Drem)
    t_c = time_kernel(step_full, args).seconds_per_iteration
    report(f"FULL spmv (rem {rem_ix.size})", t_c, nnz)

    want = np.zeros(N)
    mmr = mm.row_indices() - 1
    mmc = mm.column_indices() - 1
    mmv = mm.values_real()
    np.add.at(want, mmr, mmv * np.asarray(x, np.float64)[mmc])
    got = np.asarray(jax.jit(step_full)(*args), np.float64)
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    print(f"   FULL rel err vs host: {err:.2e}")

    stored = int(value.nbytes + loc.nbytes + P2.value.nbytes
                 + P2.local_index.nbytes + P2.rowmap.nbytes)
    eff = stored / t_c / 1e9
    print(f"stored(dev) {stored/1e6:.0f} MB, effective {eff:.0f} "
          f"GB/s, fraction-of-819 {eff/819:.3f}")


if __name__ == "__main__":
    main()
