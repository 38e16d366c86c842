"""Probe 45: vreg-sliced level accumulators + wide-pool tail.

Probe 44: static masks over a (32,128) tile didn't beat the dynamic
(64,128) mask, because EVERY chunk's masked add touches the whole
accumulator tile (4-8 vregs).  Here the accumulator is a Python list
of 4 separate (8,128) registers; chunk kk (static) touches only
acc[kk//(CAP*8)] — ~3 vreg-ops per chunk instead of ~12-24.
Expected: level compute drops below the 10.7 ns/chunk DMA floor ->
~180-210 us.

Tail: after stage1 (64-group cap=16 -> 135 us, 38K spill), try
128-group and 256-group pools with small caps on the spill.
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
KL = 64
GPS = KL // CAP
NACC = GPS // SUBLANE     # 4 accumulators of (8,128)


def report(tag, t, nnz):
    print(f"{tag:46s} {t*1e6:9.1f} us  {nnz/t/1e9:7.2f} Gnnz/s",
          flush=True)


def pack_level_dense(rows, cols, vals):
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
    assert np.unique(slot).size == slot.size
    ng_pad = round_up(ng, GPS)
    value = np.zeros((ng_pad * CAP, 8, 128), np.float32)
    loc = np.zeros((ng_pad * CAP, 8, 128), np.int32)
    a4 = np.zeros(ng_pad * CAP, np.int32)
    value[slot] = lvl.value
    loc[slot] = lvl.local_index
    a4[slot] = lvl.anchor4
    return value, loc, a4, spilled, d, ng_pad


def _lvl_kernel(ws_ref, x_ref, v_ref, l_ref, y_ref, *, d, dtype):
    row8 = jax.lax.broadcasted_iota(jnp.int32, (SUBLANE, LANE), 0)
    accs = [jnp.zeros((SUBLANE, LANE), dtype=dtype)
            for _ in range(NACC)]
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
        strip = jnp.sum(acc, axis=0, keepdims=True)
        grow = kk // CAP                      # static group-in-step
        which, sub = grow // SUBLANE, grow % SUBLANE
        accs[which] = accs[which] + jnp.where(
            row8 == sub, jnp.broadcast_to(strip, (SUBLANE, LANE)),
            jnp.zeros((SUBLANE, LANE), dtype=dtype))
    y_ref[:] = jnp.concatenate(accs, axis=0)


def lvl_call(value, loc, ws, xt, d, ng_pad):
    steps = value.shape[0] // KL
    kernel = functools.partial(_lvl_kernel, d=d, dtype=value.dtype)
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
                (GPS, LANE), lambda i: (i, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((ng_pad, LANE), value.dtype),
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

    value, loc, a4, spilled, d, ng_pad = pack_level_dense(
        rows, cols, vals)
    lvl_nnz = int((value != 0).sum())
    ws = a4.reshape(-1, 1, KL).astype(np.int32)
    a_max = int(a4.max(initial=0))
    xr4 = round_up(max(-(-N // (LANE * d)), a_max + SUBLANE), SUBLANE)

    class XT:
        pass
    XT.d, XT.xr4 = d, xr4

    jvalue, jloc, jws = (jnp.asarray(value), jnp.asarray(loc),
                         jnp.asarray(ws))

    def step_level(xv, value, loc, ws):
        xt = _cw_tables(XT, xv)
        return lvl_call(value, loc, ws, xt, d, ng_pad
                        ).reshape(-1)[:N]

    t_lvl = time_kernel(step_level, (x, jvalue, jloc, jws)
                        ).seconds_per_iteration
    report("vreg-sliced dense level k=64", t_lvl, lvl_nnz)

    yref = np.zeros(N)
    tt, ss, ll = np.nonzero(value)
    locv = loc[tt, ss, ll].astype(np.int64)
    col = (a4[tt].astype(np.int64) * d * 128 + (locv >> 7) * 128
           + (locv & 127))
    rowg = (tt // CAP) * 128 + ll
    np.add.at(yref, rowg, value[tt, ss, ll].astype(np.float64)
              * np.asarray(x, np.float64)[col])
    got = np.asarray(jax.jit(step_level)(x, jvalue, jloc, jws),
                     np.float64)
    err = np.linalg.norm(got - yref) / np.linalg.norm(yref)
    print(f"   rel err vs numpy: {err:.2e}")

    # ---- stage1 pool -----------------------------------------------
    p1, sp1 = W._pack_pool(N, N, rows[spilled], cols[spilled],
                           vals[spilled], d=4, cap=16)
    cur2 = spilled[sp1]
    n1 = int((p1.value != 0).sum())
    P1 = build_pool_device(p1, 64, 16, ng)
    pg64 = round_up(ng, 64)
    print(f"stage1: {P1.num_chunks} ch fill {n1/p1.value.size:.3f}, "
          f"spill {sp1.size}")

    # ---- tail candidates -------------------------------------------
    tails = []
    for pg, cap, kp in ((128, 8, 8), (256, 6, 8), (128, 16, 16)):
        W.POOL_GROUPS = pg
        p2, sp2 = W._pack_pool(N, N, rows[cur2], cols[cur2],
                               vals[cur2], d=4, cap=cap)
        W.POOL_GROUPS = 64
        if p2 is None:
            continue
        n2 = int((p2.value != 0).sum())
        P2 = build_pool_device(p2, pg, kp, ng)
        pgp = round_up(ng, pg)

        def step_p(xv, P, pgp=pgp, pg=pg):
            y2d = _cw_pool_call(P, _cw_tables(P, xv), pgp, pg, False)
            return y2d.reshape(-1)[:N]

        t2 = time_kernel(step_p, (x, P2)).seconds_per_iteration
        report(f"tail pool pg={pg} cap={cap} kp={kp} "
               f"({P2.num_chunks} ch, fill {n2/p2.value.size:.3f}, "
               f"sp {sp2.size})", t2, n2)
        tails.append((t2, pg, p2, P2, sp2, n2))
    t2, pgb, p2, P2, sp2, n2 = min(tails)
    print(f"best tail: pg={pgb}")

    # ---- combined ---------------------------------------------------
    pgp = round_up(ng, pgb)

    def step_full(xv, value, loc, ws, P1, P2):
        xt = _cw_tables(XT, xv)
        y = lvl_call(value, loc, ws, xt, d, ng_pad)
        y = y + _cw_pool_call(P1, _cw_tables(P1, xv), pg64, 64,
                              False)[:ng_pad]
        y = y + _cw_pool_call(P2, _cw_tables(P2, xv), pgp, pgb,
                              False)[:ng_pad]
        return y.reshape(-1)[:N]

    args = (x, jvalue, jloc, jws, P1, P2)
    t_c = time_kernel(step_full, args).seconds_per_iteration
    placed = lvl_nnz + n1 + n2
    report("combined (lvl + stage1 + tail)", t_c, placed)

    yref2 = yref.copy()
    pool_numpy(p1, x, yref2)
    pool_numpy(p2, x, yref2)
    got = np.asarray(jax.jit(step_full)(*args), np.float64)
    err = np.linalg.norm(got - yref2) / np.linalg.norm(yref2)
    print(f"   combined rel err vs numpy: {err:.2e}")

    stored = int(value.nbytes + loc.nbytes)
    for P in (P1, P2):
        stored += int(P.value.nbytes + P.local_index.nbytes
                      + P.rowmap.nbytes)
    eff = stored / t_c / 1e9
    print(f"stored(dev) {stored/1e6:.0f} MB, effective {eff:.0f} "
          f"GB/s, fraction-of-819 {eff/819:.3f}, final spill "
          f"{sp2.size} of {nnz}")


if __name__ == "__main__":
    main()
