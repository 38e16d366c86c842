"""Probe 40: unified interleaved WELL-CW kernel (level + pool).

Probe 39 found the level DMA-bound (211 us val-only floor of 297)
and the pool VALU-bound (rowmap fold didn't move it; the 8 masked
(64,128) adds do).  Running them as separate pallas calls serializes
DMA-heavy and VALU-heavy phases: 297 + 275 = 572 us.

One kernel whose grid interleaves level steps and pool steps (sorted
by output block, pool rowmap folded into loc bits 14..19, per-step
type flag in SMEM) should pipeline level DMA under pool compute:
ideal = max(sum DMA, sum VALU) ~ 330 us -> ~0.7 of roofline.

Variants:
  A. unified, natural order (level run then pool run per block)
  B. unified, alternating steps within each block
  C. B + select-tree gather (cut level VALU too)
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.io.generate import banded_random
from spmv_tpu.models import wellcw as W
from spmv_tpu.models.device import DeviceWellCw, round_up
from spmv_tpu.ops.pallas_kernels import LANE, SUBLANE, _cw_tables
from spmv_tpu.profile.harness import time_kernel

N = 1 << 20
K = 32          # chunks per step (shared by level and pool)


def report(tag, t, nnz):
    print(f"{tag:44s} {t*1e6:9.1f} us  {nnz/t/1e9:7.2f} Gnnz/s",
          flush=True)


def build_unified(m, A, out_rows, order="natural"):
    """Interleave level + pool chunks into one step-staged stream.

    Returns (value, loc, ws, grp, styp, blks) where styp[step] is
    0 for a level step, 1 for a pool step, and loc carries the pool's
    relative rowmap in bits 14..19.
    """
    lvl = m.levels[0]
    pool = m.pool
    d = lvl.d
    assert pool.d == d
    ng = m.num_groups
    num_blocks = -(-ng // out_rows)

    # --- per-chunk records, tagged with (block, kind) ---------------
    recs = []   # (block, kind, value, loc, a4, grp)
    lv_val = lvl.value
    lv_loc = lvl.local_index
    lv_grp = lvl.group_of_chunk.astype(np.int64)
    for c in range(lvl.num_chunks):
        recs.append((int(lv_grp[c]) // out_rows, 0, lv_val[c],
                     lv_loc[c], int(lvl.anchor4[c]), int(lv_grp[c])))
    po_val = pool.value
    po_loc = pool.local_index
    po_rm = pool.rowmap.astype(np.int64)
    po_blk = pool.pool_of_chunk.astype(np.int64)  # == block id
    for c in range(pool.num_chunks):
        rm_rel = po_rm[c] - po_blk[c] * out_rows
        assert rm_rel.min() >= 0 and rm_rel.max() < out_rows
        loc = (po_loc[c] | (rm_rel.astype(np.int32) << 14))
        recs.append((int(po_blk[c]), 1, po_val[c], loc,
                     int(pool.anchor4[c]), int(po_blk[c] * out_rows)))

    # --- group into per-block, per-kind runs; pad each run to K -----
    steps = []   # (block, kind, list of K recs)
    zero_rec = (np.zeros((8, 128), np.float32),
                np.zeros((8, 128), np.int32), 0)
    for b in range(num_blocks):
        runs = {0: [], 1: []}
        for r in recs:
            if r[0] == b:
                runs[r[1]].append(r)
        bsteps = []
        for kind in (0, 1):
            rr = runs[kind]
            for i0 in range(0, len(rr), K):
                chunkset = rr[i0:i0 + K]
                while len(chunkset) < K:
                    g = chunkset[-1][5] if chunkset else b * out_rows
                    chunkset = chunkset + [(b, kind, *zero_rec, g)]
                bsteps.append((b, kind, chunkset))
        if order == "alternate":
            # round-robin level/pool steps within the block
            ls = [s for s in bsteps if s[1] == 0]
            ps = [s for s in bsteps if s[1] == 1]
            mixed = []
            li = pi = 0
            # spread pool steps evenly through the level steps
            total = len(ls) + len(ps)
            for t in range(total):
                if ps and (pi + 1) * total <= (t + 1) * len(ps) * 1.0:
                    pass
                mixed.append(None)
            # simpler: emit level steps, inserting a pool step after
            # every ceil(len(ls)/len(ps)) level steps
            mixed = []
            if ps:
                stride = max(1, round(len(ls) / len(ps)))
                pi = 0
                for i, s in enumerate(ls):
                    mixed.append(s)
                    if (i + 1) % stride == 0 and pi < len(ps):
                        mixed.append(ps[pi])
                        pi += 1
                mixed.extend(ps[pi:])
            else:
                mixed = ls
            bsteps = mixed
        steps.extend(bsteps)

    S = len(steps)
    value = np.zeros((S * K, 8, 128), np.float32)
    loc = np.zeros((S * K, 8, 128), np.int32)
    ws = np.zeros((S, 1, K), np.int32)
    grp = np.zeros((S, 1, K), np.int32)
    styp = np.zeros(S, np.int32)
    blks = np.zeros(S, np.int32)
    for si, (b, kind, chunkset) in enumerate(steps):
        styp[si] = kind
        blks[si] = b
        for ci, r in enumerate(chunkset):
            value[si * K + ci] = r[2]
            loc[si * K + ci] = r[3]
            ws[si, 0, ci] = r[4]
            grp[si, 0, ci] = r[5]
    return value, loc, ws, grp, styp, blks, S


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


def _uni_kernel(blk_ref, typ_ref, ws_ref, grp_ref, x_ref, v_ref,
                l_ref, y_ref, *, d, k, out_rows, dtype, tree):
    i = pl.program_id(0)
    first = jnp.logical_or(
        i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)])
    is_pool = typ_ref[i] == 1
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (out_rows, LANE), 0)

    def gather(kk):
        a4 = ws_ref[0, 0, kk]
        locv = l_ref[kk]
        llane = locv & (LANE - 1)
        sel = (locv >> 7) & (d - 1)
        val = v_ref[kk]
        taken = [
            jnp.take_along_axis(x_ref[p, pl.ds(a4, SUBLANE), :],
                                llane, axis=1)
            for p in range(d)
        ]
        if tree:
            return val * _tree(taken, sel), locv
        acc = jnp.zeros((SUBLANE, LANE), dtype=dtype)
        for p in range(d):
            acc = acc + jnp.where(sel == p, val * taken[p],
                                  jnp.zeros_like(val))
        return acc, locv

    def level_body():
        acc_blk = jnp.zeros((out_rows, LANE), dtype=dtype)
        for kk in range(k):
            acc, _ = gather(kk)
            strip = jnp.sum(acc, axis=0, keepdims=True)
            grow = grp_ref[0, 0, kk] % out_rows
            acc_blk = acc_blk + jnp.where(
                row_iota == grow,
                jnp.broadcast_to(strip, (out_rows, LANE)),
                jnp.zeros((out_rows, LANE), dtype=dtype))
        return acc_blk

    def pool_body():
        acc_blk = jnp.zeros((out_rows, LANE), dtype=dtype)
        for kk in range(k):
            acc, locv = gather(kk)
            rm = locv >> 14
            for s in range(SUBLANE):
                acc_blk = acc_blk + jnp.where(
                    row_iota == rm[s][None, :],
                    jnp.broadcast_to(acc[s][None, :],
                                     (out_rows, LANE)),
                    jnp.zeros((out_rows, LANE), dtype=dtype))
        return acc_blk

    @pl.when(first)
    def _():
        y_ref[:] = jnp.zeros((out_rows, LANE), dtype=dtype)

    @pl.when(jnp.logical_not(is_pool))
    def _():
        y_ref[:] += level_body()

    @pl.when(is_pool)
    def _():
        y_ref[:] += pool_body()


def uni_call(args, xt, padded_groups, out_rows, d, tree):
    value, loc, ws, grp, styp, blks, S = args
    kernel = functools.partial(
        _uni_kernel, d=d, k=K, out_rows=out_rows, dtype=jnp.float32,
        tree=tree)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(S,),
            in_specs=[
                pl.BlockSpec((1, 1, K), lambda i, blk, typ: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, K), lambda i, blk, typ: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((K, SUBLANE, LANE),
                             lambda i, blk, typ: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, SUBLANE, LANE),
                             lambda i, blk, typ: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (out_rows, LANE), lambda i, blk, typ: (blk[i], 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((padded_groups, LANE),
                                       jnp.float32),
    )(jnp.asarray(blks), jnp.asarray(styp), jnp.asarray(ws),
      jnp.asarray(grp), xt, jnp.asarray(value), jnp.asarray(loc))


def main():
    mm = banded_random(N, half_bandwidth=2048, nnz_per_row=8, seed=1)
    m = W.WellCwMatrix.from_matrix_market(mm)
    A = DeviceWellCw.from_host(m, dtype=jnp.float32)
    nnz = m.num_entries
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    out_rows = SUBLANE * A.blocks_per_out
    padded_groups = round_up(A.num_groups, out_rows)
    d = m.levels[0].d
    xr4 = max(lv.xr4 for lv in A.levels)
    if A.pool is not None:
        xr4 = max(xr4, A.pool.xr4)

    class XT:
        pass
    XT.d, XT.xr4 = d, xr4

    placed = nnz - (m.remainder.num_entries if m.remainder else 0)
    want = m.spmv(np.asarray(x, np.float64))

    for order, tree in (("natural", False), ("alternate", False),
                        ("alternate", True)):
        args = build_unified(m, A, out_rows, order=order)
        S = args[-1]
        xt = jax.jit(lambda xv: _cw_tables(XT, xv))(x)

        def step(xv, value, loc, ws, grp, styp, blks):
            xt = _cw_tables(XT, xv)
            y2d = uni_call((value, loc, ws, grp, styp, blks, S), xt,
                           padded_groups, out_rows, d, tree)
            return y2d.reshape(-1)[:N]

        jargs = (x, jnp.asarray(args[0]), jnp.asarray(args[1]),
                 jnp.asarray(args[2]), jnp.asarray(args[3]),
                 jnp.asarray(args[4]), jnp.asarray(args[5]))
        t = time_kernel(step, jargs).seconds_per_iteration
        report(f"unified {order} tree={tree} ({S} steps)", t, placed)
        got = np.asarray(jax.jit(step)(*jargs), np.float64)
        err = (np.linalg.norm(got - want[:N])
               / np.linalg.norm(want[:N]))
        print(f"   rel err vs host spmv: {err:.2e}")


if __name__ == "__main__":
    main()
