"""Probe 46: level micro-ablation — find the non-DMA 7.6 ns/chunk.

All scatter-side variants (tree select, static masks, vreg-sliced
accumulators, fused/int16 streams) land at 290-300 us.  Remaining
suspects, each isolated here on the dense k=64 level:

  0. pure stream floor: touch v only, y = v[0] (no loc, no compute)
  1. loc + v floor (both streams, no gather/strip/mask)
  2. aligned slices: read T at a4 & ~7 (WRONG results, timing only)
     -- if this is fast, the unaligned dynamic slice is the cost.
  3. MXU strip-sum: ones(1,8) @ acc instead of VPU sublane reduce.
  4. k=128: halve step count (step overhead share).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.io.generate import banded_random
from spmv_tpu.models import wellcw as W
from spmv_tpu.models.device import round_up
from spmv_tpu.ops.pallas_kernels import LANE, SUBLANE, _cw_tables
from spmv_tpu.profile.harness import time_kernel

N = 1 << 20
CAP = 2


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
    ng_pad = round_up(ng, 64)
    value = np.zeros((ng_pad * CAP, 8, 128), np.float32)
    loc = np.zeros((ng_pad * CAP, 8, 128), np.int32)
    a4 = np.zeros(ng_pad * CAP, np.int32)
    value[slot] = lvl.value
    loc[slot] = lvl.local_index
    a4[slot] = lvl.anchor4
    return value, loc, a4, d, ng_pad


def make_kernel(KL, d, mode):
    GPS = KL // CAP

    def kern(ws_ref, x_ref, v_ref, l_ref, y_ref):
        row_iota = jax.lax.broadcasted_iota(
            jnp.int32, (GPS, LANE), 0)
        acc_blk = jnp.zeros((GPS, LANE), dtype=jnp.float32)
        ones18 = jnp.ones((1, SUBLANE), dtype=jnp.float32)
        for kk in range(KL):
            val = v_ref[kk]
            if mode == "vonly":
                strip = jnp.sum(val, axis=0, keepdims=True)
            elif mode == "vlonly":
                locv = l_ref[kk]
                strip = jnp.sum(
                    val + (locv & 1).astype(jnp.float32),
                    axis=0, keepdims=True)
            else:
                a4 = ws_ref[0, 0, kk]
                if mode == "aligned":
                    a4 = a4 & ~7
                locv = l_ref[kk]
                llane = locv & (LANE - 1)
                sel = (locv >> 7) & (d - 1)
                g = jnp.zeros((SUBLANE, LANE), dtype=jnp.float32)
                for p in range(d):
                    T = x_ref[p, pl.ds(a4, SUBLANE), :]
                    gthr = jnp.take_along_axis(T, llane, axis=1)
                    g = g + jnp.where(sel == p, gthr,
                                      jnp.zeros_like(gthr))
                acc = val * g
                if mode == "mxu":
                    strip = jax.lax.dot_general(
                        ones18, acc, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:
                    strip = jnp.sum(acc, axis=0, keepdims=True)
            acc_blk = acc_blk + jnp.where(
                row_iota == (kk // CAP),
                jnp.broadcast_to(strip, (GPS, LANE)),
                jnp.zeros((GPS, LANE), dtype=jnp.float32))
        y_ref[:] = acc_blk
    return kern


def lvl_call(value, loc, ws, xt, d, ng_pad, KL, mode):
    GPS = KL // CAP
    steps = value.shape[0] // KL
    return pl.pallas_call(
        make_kernel(KL, d, mode),
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
        out_shape=jax.ShapeDtypeStruct((ng_pad * CAP // KL * GPS,
                                        LANE), jnp.float32),
    )(ws, xt, value, loc)


def main():
    mm = banded_random(N, half_bandwidth=2048, nnz_per_row=8, seed=1)
    rows, cols, vals, _ = W.sorted_entries_0based(mm)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))

    value, loc, a4, d, ng_pad = pack_level_dense(rows, cols, vals)
    lvl_nnz = int((value != 0).sum())
    a_max = int(a4.max(initial=0))
    xr4 = round_up(max(-(-N // (LANE * d)), a_max + SUBLANE), SUBLANE)

    class XT:
        pass
    XT.d, XT.xr4 = d, xr4

    jvalue, jloc = jnp.asarray(value), jnp.asarray(loc)

    for KL, mode in ((64, "vonly"), (64, "vlonly"), (64, "full"),
                     (64, "aligned"), (64, "mxu"), (128, "full"),
                     (128, "mxu")):
        ws = a4.reshape(-1, 1, KL).astype(np.int32)
        jws = jnp.asarray(ws)

        def step(xv, value, loc, ws, KL=KL, mode=mode):
            xt = _cw_tables(XT, xv)
            return lvl_call(value, loc, ws, xt, d, ng_pad, KL, mode
                            ).reshape(-1)[:N]

        try:
            t = time_kernel(step, (x, jvalue, jloc, jws)
                            ).seconds_per_iteration
        except Exception as e:
            print(f"KL={KL} mode={mode}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}")
            continue
        report(f"KL={KL} mode={mode}", t, lvl_nnz)


if __name__ == "__main__":
    main()
