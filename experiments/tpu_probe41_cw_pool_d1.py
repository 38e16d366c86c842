"""Probe 41: d=1 / d=2 pools — finer slot resolution for the CW tail.

Probe 40 killed the scheduling idea (no DMA/VALU overlap win; both
phases are bound by the same resource).  The pool's real cost per
chunk is the per-lane masked scatter (~37 ns marginal), so the lever
is CHUNK COUNT.  At d=4 a pool cell pools 4 x2d-rows (slot = w//4):
~4x the cell collisions of d=1, where slot = w exactly.  The anchor
ladder already provides column coverage, so the pool does not need
wide windows the way per-group level chunks do.

Expected: d=1 fill ~0.3-0.4 (vs 0.208), chunks ~2.3K (vs 4992),
pool time ~120 us (vs 275); plus a cheaper 1-take gather.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.io.generate import banded_random
from spmv_tpu.models import wellcw as W
from spmv_tpu.models.device import (
    DeviceWellCw, DeviceCwPool, _pad_cw_steps, round_up)
from spmv_tpu.ops.pallas_kernels import (
    LANE, SUBLANE, _cw_tables, _cw_pool_call, _cw_level_call)
from spmv_tpu.profile.harness import time_kernel

N = 1 << 20


def report(tag, t, nnz):
    print(f"{tag:44s} {t*1e6:9.1f} us  {nnz/t/1e9:7.2f} Gnnz/s",
          flush=True)


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


def main():
    mm = banded_random(N, half_bandwidth=2048, nnz_per_row=8, seed=1)
    m = W.WellCwMatrix.from_matrix_market(mm)
    A = DeviceWellCw.from_host(m, dtype=jnp.float32)
    nnz = m.num_entries
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    out_rows = SUBLANE * A.blocks_per_out
    ng = -(-N // 128)
    padded_groups = round_up(A.num_groups, out_rows)

    rows, cols, vals, _ = W.sorted_entries_0based(mm)
    d0, cap0, mp0 = W.DEFAULT_LEVELS[0]
    _lvl0, spilled = W._pack_level(N, N, rows, cols, vals, d0, cap0,
                                   mp0)

    # reference pool timing (d=4, production packing)
    def step_pool(xv, P):
        y2d = _cw_pool_call(P, _cw_tables(P, xv), padded_groups,
                            out_rows, False)
        return y2d.reshape(-1)[:N]

    t0 = time_kernel(step_pool, (x, A.pool)).seconds_per_iteration
    pool_nnz = int((np.asarray(m.pool.value) != 0).sum())
    report(f"pool d=4 (production, {A.pool.num_chunks} ch)", t0,
           pool_nnz)

    best = None
    for d in (1, 2):
        for kp in (8, 16, 32):
            pool, sp = W._pack_pool(N, N, rows[spilled],
                                    cols[spilled], vals[spilled],
                                    d=d, cap=256)
            P = build_pool_device(pool, out_rows, kp, ng)
            pnnz = int((pool.value != 0).sum())
            fill = pnnz / pool.value.size
            t = time_kernel(step_pool, (x, P)).seconds_per_iteration
            report(
                f"pool d={d} kp={kp} ({pool.num_chunks}->"
                f"{P.num_chunks} ch, fill {fill:.3f}, sp {sp.size})",
                t, pnnz)
            if best is None or t < best[0]:
                best = (t, d, kp, pool, P, sp)

    # correctness + combined with the production level
    t, d, kp, pool, P, sp = best
    print(f"best: d={d} kp={kp}")
    yref = np.zeros(N)
    tt, ss, ll = np.nonzero(pool.value)
    locv = pool.local_index[tt, ss, ll].astype(np.int64)
    col = ((pool.anchor4[tt].astype(np.int64) * pool.d) * 128
           + (locv >> 7) * 128 + (locv & 127))
    rowg = pool.rowmap[tt, ss, ll].astype(np.int64) * 128 + ll
    np.add.at(yref, rowg,
              pool.value[tt, ss, ll] * np.asarray(x)[col])
    got = np.asarray(jax.jit(step_pool)(x, P), np.float64)
    err = np.linalg.norm(got - yref) / np.linalg.norm(yref)
    print(f"   best pool rel err vs numpy: {err:.2e}")

    def step_full(xv, A, P):
        y = None
        for lvl in A.levels:
            y2d = _cw_level_call(lvl, _cw_tables(lvl, xv),
                                 padded_groups, out_rows, False)
            y = y2d if y is None else y + y2d
        y = y + _cw_pool_call(P, _cw_tables(P, xv), padded_groups,
                              out_rows, False)
        return y.reshape(-1)[:N]

    t_c = time_kernel(step_full, (x, A, P)).seconds_per_iteration
    placed = nnz - sp.size
    report("combined level + best pool", t_c, placed)
    stored = sum(int(lv.value.nbytes + lv.local_index.nbytes)
                 for lv in A.levels) + int(P.value.nbytes
                                           + P.local_index.nbytes
                                           + P.rowmap.nbytes)
    eff = stored / t_c / 1e9
    print(f"stored(dev) {stored/1e6:.0f} MB, effective {eff:.0f} "
          f"GB/s, fraction-of-819 {eff/819:.3f}, spill {sp.size}")


if __name__ == "__main__":
    main()
