"""Probe 48: merged-grid overlap diagnosis.

Merged KL=144 measured 339 us; DMA floor ~217 (147 MB at the 677
GB/s probe-46 vonly rate), compute ~210 -> ideal ~220-240.  Where do
~100 us go?  Variants:
  A. vonly on the merged stream (DMA floor of THIS layout)
  B. baseline merged
  C. merged with dimension_semantics=("arbitrary",)
  D. KL=72 (2 steps/block, finer pipeline granularity)
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.io.generate import banded_random
from spmv_tpu.models import wellcw as W
from spmv_tpu.models.device import _pad_cw_steps, round_up
from spmv_tpu.ops.pallas_kernels import LANE, SUBLANE, _cw_tables
from spmv_tpu.profile.harness import time_kernel

import tpu_probe47_cw_merged as P47

N = 1 << 20
CAP = 2
BLOCK_GROUPS = 64
LVL_PER_BLOCK = 128
POOL_PER_BLOCK = 16
KL = 144


def report(tag, t, nnz):
    print(f"{tag:46s} {t*1e6:9.1f} us  {nnz/t/1e9:7.2f} Gnnz/s",
          flush=True)


def make_merged_kernel(KLs, lvl_per, d, mode):
    def kern(ws_ref, x_ref, v_ref, l_ref, y_ref):
        row_iota = jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_GROUPS, LANE), 0)
        i = pl.program_id(0)
        acc_blk = jnp.zeros((BLOCK_GROUPS, LANE), dtype=jnp.float32)
        for kk in range(KLs):
            val = v_ref[kk]
            locv = l_ref[kk]
            if mode == "vonly":
                strip = jnp.sum(val + (locv & 1).astype(jnp.float32),
                                axis=0, keepdims=True)
                acc_blk = acc_blk + jnp.where(
                    row_iota == (kk // CAP) % BLOCK_GROUPS,
                    jnp.broadcast_to(strip, (BLOCK_GROUPS, LANE)),
                    jnp.zeros((BLOCK_GROUPS, LANE), jnp.float32))
                continue
            a4 = ws_ref[0, 0, kk]
            llane = locv & (LANE - 1)
            sel = (locv >> 7) & (d - 1)
            g = jnp.zeros((SUBLANE, LANE), dtype=jnp.float32)
            for p in range(d):
                T = x_ref[p, pl.ds(a4, SUBLANE), :]
                gthr = jnp.take_along_axis(T, llane, axis=1)
                g = g + jnp.where(sel == p, gthr,
                                  jnp.zeros_like(gthr))
            acc = val * g
            # chunk position within the block (static when
            # KLs == KL; periodic when KLs == KL // 2)
            cpos = kk if KLs == KL else None
            if cpos is not None:
                is_level = cpos < lvl_per
            else:
                is_level = None
            if is_level is True or is_level is None:
                strip = jnp.sum(acc, axis=0, keepdims=True)
            if KLs == KL:
                if kk < lvl_per:
                    acc_blk = acc_blk + jnp.where(
                        row_iota == (kk // CAP),
                        jnp.broadcast_to(strip,
                                         (BLOCK_GROUPS, LANE)),
                        jnp.zeros((BLOCK_GROUPS, LANE),
                                  jnp.float32))
                else:
                    rm = locv >> 14
                    for s in range(SUBLANE):
                        acc_blk = acc_blk + jnp.where(
                            row_iota == rm[s][None, :],
                            jnp.broadcast_to(acc[s][None, :],
                                             (BLOCK_GROUPS, LANE)),
                            jnp.zeros((BLOCK_GROUPS, LANE),
                                      jnp.float32))
            else:
                # KLs=72: steps alternate [72 level] and
                # [56 level + 16 pool]
                odd = i % 2 == 1
                if kk < 56:
                    grow = jnp.where(
                        odd, (kk + 72) // CAP - BLOCK_GROUPS,
                        kk // CAP)
                    grow = jnp.where(odd, (kk + 72) // CAP,
                                     kk // CAP) % BLOCK_GROUPS
                    acc_blk = acc_blk + jnp.where(
                        row_iota == grow,
                        jnp.broadcast_to(strip,
                                         (BLOCK_GROUPS, LANE)),
                        jnp.zeros((BLOCK_GROUPS, LANE),
                                  jnp.float32))
                else:
                    @pl.when(jnp.logical_not(odd))
                    def _():
                        pass
                    grow = (kk // CAP) % BLOCK_GROUPS
                    lvl_part = jnp.where(
                        row_iota == grow,
                        jnp.broadcast_to(strip,
                                         (BLOCK_GROUPS, LANE)),
                        jnp.zeros((BLOCK_GROUPS, LANE),
                                  jnp.float32))
                    rm = locv >> 14
                    pool_part = jnp.zeros(
                        (BLOCK_GROUPS, LANE), jnp.float32)
                    for s in range(SUBLANE):
                        pool_part = pool_part + jnp.where(
                            row_iota == rm[s][None, :],
                            jnp.broadcast_to(acc[s][None, :],
                                             (BLOCK_GROUPS, LANE)),
                            jnp.zeros((BLOCK_GROUPS, LANE),
                                      jnp.float32))
                    acc_blk = acc_blk + jnp.where(
                        odd, pool_part, lvl_part)
        if KLs == KL:
            y_ref[:] = acc_blk
        else:
            @pl.when(i % 2 == 0)
            def _():
                y_ref[:] = acc_blk

            @pl.when(i % 2 == 1)
            def _():
                y_ref[:] += acc_blk
    return kern


def merged_call(value, loc, ws, xt, d, ng_pad, KLs, mode,
                arbitrary=False):
    steps = value.shape[0] // KLs
    kwargs = {}
    if arbitrary:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))
    return pl.pallas_call(
        make_merged_kernel(KLs, LVL_PER_BLOCK, d, mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((1, 1, KLs), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((KLs, SUBLANE, LANE),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KLs, SUBLANE, LANE),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (BLOCK_GROUPS, LANE),
                (lambda i: (i, 0)) if KLs == KL else
                (lambda i: (i // 2, 0)),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((ng_pad, LANE), jnp.float32),
        **kwargs,
    )(ws, xt, value, loc)


def main():
    mm = banded_random(N, half_bandwidth=2048, nnz_per_row=8, seed=1)
    rows, cols, vals, _ = W.sorted_entries_0based(mm)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    ng = -(-N // 128)
    ng_pad = round_up(ng, BLOCK_GROUPS)
    num_blocks = ng_pad // BLOCK_GROUPS

    lv_value, lv_loc, lv_a4, spilled, d = P47.pack_level_dense(
        rows, cols, vals, ng_pad)
    p1, sp1 = W._pack_pool(N, N, rows[spilled], cols[spilled],
                           vals[spilled], d=4, cap=POOL_PER_BLOCK)
    n1 = int((p1.value != 0).sum())
    base_grp = p1.pool_of_chunk.astype(np.int64) * BLOCK_GROUPS
    pv, plc, pws, _g2, pblks, prm = _pad_cw_steps(
        p1.value, p1.local_index, p1.anchor4, base_grp, ng,
        k=POOL_PER_BLOCK, out_rows=BLOCK_GROUPS, rowmap=p1.rowmap)
    blk_of_chunk = np.repeat(np.arange(num_blocks), POOL_PER_BLOCK)
    rm_rel = prm - (blk_of_chunk * BLOCK_GROUPS)[:, None, None]
    plc = (plc | (rm_rel.astype(np.int32) << 14)).astype(np.int32)
    pws2 = pws.reshape(-1, POOL_PER_BLOCK)

    S = num_blocks
    value = np.zeros((S * KL, 8, 128), np.float32)
    loc = np.zeros((S * KL, 8, 128), np.int32)
    a4m = np.zeros((S, 1, KL), np.int32)
    li = np.arange(S * KL).reshape(S, KL)
    value[li[:, :LVL_PER_BLOCK].ravel()] = lv_value
    loc[li[:, :LVL_PER_BLOCK].ravel()] = lv_loc
    value[li[:, LVL_PER_BLOCK:].ravel()] = pv
    loc[li[:, LVL_PER_BLOCK:].ravel()] = plc
    a4m[:, 0, :LVL_PER_BLOCK] = lv_a4.reshape(S, LVL_PER_BLOCK)
    a4m[:, 0, LVL_PER_BLOCK:] = pws2

    a_max = int(a4m.max(initial=0))
    xr4 = round_up(max(-(-N // (LANE * d)), a_max + SUBLANE), SUBLANE)

    class XT:
        pass
    XT.d, XT.xr4 = d, xr4

    jvalue, jloc, jws = (jnp.asarray(value), jnp.asarray(loc),
                         jnp.asarray(a4m))
    lvl_nnz = int((lv_value != 0).sum())
    total = lvl_nnz + n1

    for KLs, mode, arb, tag in (
            (KL, "vonly", False, "A. vonly merged stream"),
            (KL, "full", False, "B. merged baseline"),
            (KL, "full", True, "C. merged arbitrary-dim"),
    ):
        ws_r = a4m if KLs == KL else a4m.reshape(-1, 1, KLs)
        jws_r = jnp.asarray(ws_r)

        def step(xv, value, loc, ws, KLs=KLs, mode=mode, arb=arb):
            xt = _cw_tables(XT, xv)
            return merged_call(value, loc, ws, xt, d, ng_pad, KLs,
                               mode, arb).reshape(-1)[:N]

        try:
            t = time_kernel(step, (x, jvalue, jloc, jws_r)
                            ).seconds_per_iteration
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: "
                  f"{str(e)[:150]}")
            continue
        report(tag, t, total)


if __name__ == "__main__":
    main()
