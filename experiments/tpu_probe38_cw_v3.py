"""Probe 38: WELL-CW v3 candidates — dense-slot level + mixed-d pool.

Probe 37 found: level VALU-bound at ~18.5 ns/chunk (tree) vs a
10.7 ns DMA floor; pool marginal cost scatter-dominated (d16 fold
pool marginal ~148 us).  Two structural changes measured here:

  A. Dense-slot level: every group emits exactly ``cap`` chunks
     (missing ranks = zero chunks), so chunk (g, r) writes its
     (1,128) strip at STATIC output row g*cap+r — no row_iota
     masked-add, no revisit first/accumulate branches.  y2d is then
     a reshape(groups, cap, 128).sum(1) on the XLA side (dense, no
     scatter).  On the bench matrix every group uses both ranks, so
     the dense layout adds zero padding.
  B. Mixed-d pool: d=4 ladder capped at healthy ranks (fills
     0.94..0.43) + a d=16 collision ladder for the tail (one window
     covers a 64-group pool's whole span), both with rowmap folded
     into local_index bits and tree phase-select.
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
    LANE, SUBLANE, _cw_tables, _cw_pool_call)
from spmv_tpu.profile.harness import time_kernel

N = 1 << 20
CAP = 2


def report(tag, t, nnz):
    print(f"{tag:38s} {t*1e6:9.1f} us  {nnz/t/1e9:7.2f} Gnnz/s",
          flush=True)


# ---------------------------------------------------------------------
# Dense-slot level packing: (ng*cap) chunk slots, slot g*cap+r.
# ---------------------------------------------------------------------
def pack_level_dense(rows, cols, vals, d, cap):
    lvl, spilled = W._pack_level(N, N, rows, cols, vals, d, cap, 0.0)
    ng = max(-(-N // 128), 1)
    # scatter the packed chunks into dense (g, r) slots
    # _pack_level's ckeys are g*cap+r and chunks are emitted in ckey
    # order, so re-derive ckeys from group_of_chunk + per-group order
    grp = lvl.group_of_chunk.astype(np.int64)
    rank = np.zeros(grp.size, dtype=np.int64)
    for i in range(1, grp.size):
        rank[i] = rank[i - 1] + 1 if grp[i] == grp[i - 1] else 0
    # NOTE: per-group chunk order equals rank order by construction
    slot = grp * cap + rank
    value = np.zeros((ng * cap, 8, 128), dtype=np.float32)
    loc = np.zeros((ng * cap, 8, 128), dtype=np.int32)
    a4 = np.zeros(ng * cap, dtype=np.int32)
    value[slot] = lvl.value
    loc[slot] = lvl.local_index
    a4[slot] = lvl.anchor4
    return value, loc, a4, spilled, lvl


def _tree(taken, sel):
    lvl_, bit = taken, 0
    while len(lvl_) > 1:
        nxt = []
        for j in range(0, len(lvl_), 2):
            nxt.append(jnp.where((sel >> bit) & 1 == 1,
                                 lvl_[j + 1], lvl_[j]))
        lvl_ = nxt
        bit += 1
    return lvl_[0]


def _lvl_dense_kernel(ws_ref, x_ref, v_ref, l_ref, y_ref, *, d, k,
                      dtype):
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
        acc = val * _tree(taken, sel)
        y_ref[kk, :] = jnp.sum(acc, axis=0)


def level_dense_call(value, loc, a4s, xt, k, d):
    total = value.shape[0]
    steps = total // k
    kernel = functools.partial(_lvl_dense_kernel, d=d, k=k,
                               dtype=value.dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((k, SUBLANE, LANE),
                             lambda i, a: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, SUBLANE, LANE),
                             lambda i, a: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (k, LANE), lambda i, a: (i, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((total, LANE), value.dtype),
    )(a4s, xt, value, loc)


def _cw_pool_kernel_fold(blk_ref, ws_ref, x_ref, v_ref, l_ref,
                         y_ref, *, d, k, out_rows, dtype):
    i = pl.program_id(0)
    first = jnp.logical_or(
        i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)])
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (out_rows, LANE), 0)
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
        acc = val * _tree(taken, sel)
        for s in range(SUBLANE):
            acc_blk = acc_blk + jnp.where(
                row_iota == rm[s][None, :],
                jnp.broadcast_to(acc[s][None, :], (out_rows, LANE)),
                jnp.zeros((out_rows, LANE), dtype=dtype))

    @pl.when(first)
    def _():
        y_ref[:] = acc_blk

    @pl.when(jnp.logical_not(first))
    def _():
        y_ref[:] += acc_blk


def pool_call_fold(P, xt, padded_groups, out_rows):
    k = P.chunks_per_step
    steps = P.num_chunks // k
    kernel = functools.partial(_cw_pool_kernel_fold, d=P.d, k=k,
                               out_rows=out_rows, dtype=P.value.dtype)
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


def build_pool_device(pool, out_rows, kp):
    base_grp = pool.pool_of_chunk.astype(np.int64) * out_rows
    value, loc, ws, _g2, blks, rm = _pad_cw_steps(
        pool.value.astype(np.float32), pool.local_index, pool.anchor4,
        base_grp, -(-N // 128), k=kp, out_rows=out_rows,
        rowmap=pool.rowmap)
    a_max = int(pool.anchor4.max(initial=0))
    xr4 = round_up(max(-(-N // (LANE * pool.d)), a_max + SUBLANE),
                   SUBLANE)
    blk_of_chunk = np.repeat(blks, kp)
    rm_rel = rm - (blk_of_chunk * out_rows)[:, None, None]
    assert rm_rel.min() >= 0 and rm_rel.max() < out_rows
    loc_folded = (loc | (rm_rel.astype(np.int32) << 14)).astype(
        np.int32)
    return DeviceCwPool(
        d=pool.d, num_chunks=int(value.shape[0]), chunks_per_step=kp,
        xr4=int(xr4), value=jnp.asarray(value),
        local_index=jnp.asarray(loc_folded), anchor4=jnp.asarray(ws),
        rowmap=jnp.asarray(rm), block_of_step=jnp.asarray(blks))


def main():
    mm = banded_random(N, half_bandwidth=2048, nnz_per_row=8, seed=1)
    rows, cols, vals, _ = W.sorted_entries_0based(mm)
    nnz = rows.size
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))

    # dense-slot level
    d0 = 4
    value, loc, a4, spilled, lvl0 = pack_level_dense(
        rows, cols, vals, d0, CAP)
    lvl_entries = int((value != 0).sum())
    print(f"dense level: {value.shape[0]} slots, "
          f"fill {(value != 0).sum()/value.size:.3f}")
    k = 64
    steps_pad = round_up(value.shape[0], k)
    if steps_pad != value.shape[0]:
        raise SystemExit("unexpected: ng*cap not divisible by k")
    a_max = int(a4.max(initial=0))
    xr4_val = round_up(max(-(-N // (LANE * d0)), a_max + SUBLANE),
                       SUBLANE)
    # stage anchors step-major for SMEM
    ws = a4.reshape(-1, 1, k).astype(np.int32)
    lvl_args = (jnp.asarray(value), jnp.asarray(loc), jnp.asarray(ws))

    class XT:
        d, xr4 = d0, xr4_val
    ng = -(-N // 128)

    def step_level(xv, value, loc, ws):
        xt = _cw_tables(XT, xv)
        strips = level_dense_call(value, loc, ws, xt, k, d0)
        y2d = strips.reshape(ng, CAP, LANE).sum(axis=1)
        return y2d.reshape(-1)[:N]

    t_lvl = time_kernel(step_level, (x, *lvl_args)
                        ).seconds_per_iteration
    report("level dense-slot strip-store", t_lvl, lvl_entries)

    # numpy check of the dense level
    yref = np.zeros(N)
    tt, ss, ll = np.nonzero(value)
    locv = loc[tt, ss, ll].astype(np.int64)
    col = ((a4[tt].astype(np.int64) * d0 + (locv >> 7)) << 7) | (
        locv & 127)
    rowg = (tt // CAP) * 128 + ll
    np.add.at(yref, rowg, value[tt, ss, ll].astype(np.float64)
              * np.asarray(x, np.float64)[col])
    got = np.asarray(jax.jit(step_level)(x, *lvl_args), np.float64)
    err = np.linalg.norm(got - yref) / np.linalg.norm(yref)
    print(f"dense level rel err vs numpy: {err:.2e}")

    # ---- mixed pool: d4 cap6 + d16 tail ------------------------------
    cur = spilled
    t0 = time.time()
    pool4, sp4 = W._pack_pool(N, N, rows[cur], cols[cur], vals[cur],
                              d=4, cap=6)
    cur2 = cur[sp4]
    pool16, sp16 = W._pack_pool(N, N, rows[cur2], cols[cur2],
                                vals[cur2], d=16, cap=256)
    print(f"pool4 chunks {pool4.num_chunks} fill "
          f"{(pool4.value != 0).sum()/pool4.value.size:.3f}; "
          f"pool16 chunks {pool16.num_chunks} fill "
          f"{(pool16.value != 0).sum()/pool16.value.size:.3f}; "
          f"spill {sp16.size}; pack {time.time()-t0:.1f}s")

    out_rows = 64
    padded_groups = round_up(ng, out_rows)
    P4 = build_pool_device(pool4, out_rows, kp=16)
    P16 = build_pool_device(pool16, out_rows, kp=16)

    def step_all(xv, value, loc, ws, P4, P16):
        xt = _cw_tables(XT, xv)
        strips = level_dense_call(value, loc, ws, xt, k, d0)
        y2d = strips.reshape(ng, CAP, LANE).sum(axis=1)
        y2d = y2d + pool_call_fold(P4, xt, padded_groups, out_rows
                                   )[:ng]
        y2d = y2d + pool_call_fold(
            P16, _cw_tables(P16, xv), padded_groups, out_rows)[:ng]
        return y2d.reshape(-1)[:N]

    t_all = time_kernel(step_all, (x, *lvl_args, P4, P16)
                        ).seconds_per_iteration
    placed = nnz - sp16.size
    report("combined v3 (dense lvl + mixed pool)", t_all, placed)

    stored = (value.nbytes + loc.nbytes
              + int(P4.value.nbytes) + int(P4.local_index.nbytes)
              + int(P16.value.nbytes) + int(P16.local_index.nbytes))
    eff = stored / t_all / 1e9
    print(f"stored(dev) {stored/1e6:.0f} MB, effective {eff:.0f} "
          f"GB/s, fraction-of-819 {eff/819:.3f}")

    # full checksum vs host spmv through the whole pipeline
    yref2 = yref.copy()
    for p in (pool4, pool16):
        tt, ss, ll = np.nonzero(p.value)
        locv = p.local_index[tt, ss, ll].astype(np.int64)
        col = ((p.anchor4[tt].astype(np.int64) * p.d
                + (locv >> 7)) << 7) | (locv & 127)
        rowg = p.rowmap[tt, ss, ll].astype(np.int64) * 128 + ll
        np.add.at(yref2, rowg, p.value[tt, ss, ll]
                  * np.asarray(x, np.float64)[col])
    got2 = np.asarray(jax.jit(step_all)(x, *lvl_args, P4, P16),
                      np.float64)
    err2 = np.linalg.norm(got2 - yref2) / np.linalg.norm(yref2)
    print(f"combined rel err vs numpy: {err2:.2e} "
          f"(spilled-to-remainder {sp16.size})")

    # pool-call step sizes: try kp=32 for the d4 pool
    P4b = build_pool_device(pool4, out_rows, kp=32)

    def step_all_b(xv, value, loc, ws, P4, P16):
        return step_all(xv, value, loc, ws, P4, P16)

    t_b = time_kernel(step_all_b, (x, *lvl_args, P4b, P16)
                      ).seconds_per_iteration
    report("combined v3 (pool4 kp=32)", t_b, placed)


if __name__ == "__main__":
    main()
