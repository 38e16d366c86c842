"""Probe 27: chunk-window WELL ("WELL-CW") — fixed per-chunk windows
with stride-d split x tables.

Round-1 WELL gives every SLOT its own 128*m-column window; the kernel
must assemble each gather table from 8 single-row dynamic slices and
run m select passes -> ~0.33 VPU ops/entry, and greedy packing tops
out at 5.9 Gnnz/s on random-banded (probe 26).

New scheme: each CHUNK has one fixed window of 8*d x2d rows (1024*d
columns), tiling the column space (win = c // (1024 d)).  Slot s of
the chunk covers x2d rows anchor + d*s + p for p in [0, d): with x
pre-split into d stride-d tables xt[p] = x2d[p::d], slot s's gather
table for phase p is xt[p][a4 + s] — so the whole (8,128) table is ONE
contiguous dynamic slice xt[p][a4:a4+8].  Cell position is forced
(slot = window-row // d, lane = row % 128), so packing is a vectorized
numpy group-by: multiplicity rank j within (group, win, slot, lane)
selects the j-th chunk at that window; rank >= cap spills.

Kernel cost: d * (slice + take_along_axis + where-fma) + scatter
~ 4d+7 ops per 1024-cell chunk, ~10x less VPU work than per-slot
windows.  Measures fill/spill + on-chip rate for d in {2,4,8} on
random banded (n=1M, bw=4096, 16/row) and poisson 1024^2.
"""

import functools
import sys
import time

import numpy as np

LANE = 128
SUBLANE = 8
GROUP = 128


def pack_cw(num_rows, num_cols, row_ptr, cols, vals, d=4, cap=4,
            min_pop=0.10):
    """Vectorized chunk-window packing.

    Returns (value, loc, a4, group_of_chunk, spill_idx) where value /
    loc are (chunks, 8, 128), a4[t] = chunk t's anchor / d (row units
    of the stride-d tables), and spill_idx indexes the input entries
    that did not fit: multiplicity rank >= cap, or rank >= 1 in an
    overflow chunk filled below min_pop (pruning near-empty chunks a
    single high-multiplicity cell would otherwise force).
    """
    wincols = 1024 * d
    rows = np.repeat(np.arange(num_rows, dtype=np.int64),
                     np.diff(row_ptr))
    g = rows >> 7
    win = cols // wincols
    w = (cols >> 7) - (win << 3) * d          # window row offset [0, 8d)
    s = w // d
    lane = rows & (GROUP - 1)
    # multiplicity rank within (g, win, s, lane)
    key = ((g * (num_cols // wincols + 2) + win) * SUBLANE + s) \
        * GROUP + lane
    order = np.argsort(key, kind="stable")
    ks = key[order]
    newgrp = np.empty(ks.size, dtype=bool)
    newgrp[0] = True
    np.not_equal(ks[1:], ks[:-1], out=newgrp[1:])
    idx = np.arange(ks.size)
    start = idx[newgrp][np.cumsum(newgrp) - 1]
    rank = np.empty(ks.size, dtype=np.int64)
    rank[order] = idx - start
    spill = rank >= cap
    keep = ~spill

    def enumerate_chunks(keep):
        gk, wink, rk = g[keep], win[keep], rank[keep]
        ckey = (gk * (num_cols // wincols + 2) + wink) * cap + rk
        corder = np.argsort(ckey, kind="stable")
        cs = ckey[corder]
        cnew = np.empty(cs.size, dtype=bool)
        if cs.size:
            cnew[0] = True
            np.not_equal(cs[1:], cs[:-1], out=cnew[1:])
        chunk_of = np.empty(cs.size, dtype=np.int64)
        chunk_of[corder] = np.cumsum(cnew) - 1
        n_chunks = int(cnew.sum()) if cs.size else 0
        return chunk_of, n_chunks

    chunk_of, n_chunks = enumerate_chunks(keep)
    # prune near-empty overflow chunks into the spill
    pop = np.bincount(chunk_of, minlength=n_chunks)
    crank = np.zeros(n_chunks, dtype=np.int64)
    crank[chunk_of] = rank[keep]
    prune = (pop < min_pop * SUBLANE * GROUP) & (crank > 0)
    if prune.any():
        ent_pruned = prune[chunk_of]
        keep_idx = np.nonzero(keep)[0]
        keep[keep_idx[ent_pruned]] = False
        spill = ~keep
        chunk_of, n_chunks = enumerate_chunks(keep)

    gk, wink, rk = g[keep], win[keep], rank[keep]
    sk, lk = s[keep], lane[keep]
    wk, ck, vk = w[keep], cols[keep], vals[keep]

    value = np.zeros((n_chunks, SUBLANE, GROUP), dtype=np.float32)
    loc = np.zeros((n_chunks, SUBLANE, GROUP), dtype=np.int32)
    value[chunk_of, sk, lk] = vk
    loc[chunk_of, sk, lk] = (wk << 7) | (ck & (LANE - 1))
    a4 = np.zeros(n_chunks, dtype=np.int32)
    grp = np.zeros(n_chunks, dtype=np.int32)
    a4[chunk_of] = (wink << 3).astype(np.int32)
    grp[chunk_of] = gk.astype(np.int32)
    return value, loc, a4, grp, np.nonzero(spill)[0]


def pad_steps(value, loc, a4, grp, num_groups, k=8, out_rows=SUBLANE):
    """Pad chunk count so no K-step spans two output blocks, zero
    chunks carry the block's last group (keeps segment ids sorted)."""
    blk = grp // out_rows
    num_blocks = -(-num_groups // out_rows)
    # chunks arrive block-sorted; block boundaries via searchsorted
    starts = np.searchsorted(blk, np.arange(num_blocks + 1))
    counts = np.diff(starts)
    padded = np.where(counts == 0, k, -(-counts // k) * k)
    out_start = np.concatenate([[0], np.cumsum(padded)])
    total = int(out_start[-1])
    value_o = np.zeros((total, SUBLANE, GROUP), value.dtype)
    loc_o = np.zeros((total, SUBLANE, GROUP), np.int32)
    a4_o = np.zeros(total, np.int32)
    # pad chunks carry the block's last real group (or the block's
    # last group for empty blocks) so segment/group ids stay sorted
    gpad = np.minimum(np.arange(num_blocks) * out_rows + out_rows - 1,
                      num_groups - 1).astype(np.int32)
    has = counts > 0
    gpad[has] = grp[starts[1:][has] - 1]
    grp_o = np.repeat(gpad, padded)
    pos = np.arange(value.shape[0]) - starts[:-1][blk] \
        + out_start[:-1][blk]
    value_o[pos] = value
    loc_o[pos] = loc
    a4_o[pos] = a4
    grp_o[pos] = grp
    blks = np.repeat(np.arange(num_blocks, dtype=np.int32),
                     padded // k)
    value, loc, a4, grp = value_o, loc_o, a4_o, grp_o
    steps = value.shape[0] // k
    ws = a4.reshape(steps, 1, k)
    grp2 = grp.reshape(steps, 1, k)
    blk_of_step = np.asarray(blks, np.int32)
    assert blk_of_step.size == steps
    return value, loc, ws, grp2, blk_of_step


def cw_kernel(blk_ref, ws_ref, grp_ref, x_ref, v_ref, l_ref, y_ref,
              *, d, k, out_rows, dtype):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

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
        val = v_ref[kk]
        acc = jnp.zeros((SUBLANE, LANE), dtype=dtype)
        for p in range(d):
            T = x_ref[p, pl.ds(a4, SUBLANE), :]       # (8, LANE)
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


def cw_spmv(value, loc, ws, grp2, blk_of_step, x, num_rows, num_cols,
            d, xr4, k=8, b=1, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    steps = value.shape[0] // k
    num_groups = -(-num_rows // GROUP)
    out_rows = SUBLANE * b
    padded_groups = -(-num_groups // out_rows) * out_rows
    # stride-d tables: xt[p] = x2d[p::d]; xr4 rows padded so every
    # anchor+8 slice is in range (computed host-side by the caller)
    x2d = jnp.pad(x, (0, xr4 * d * LANE - x.shape[0])).reshape(
        xr4 * d, LANE)
    xt = jnp.stack([x2d[p::d] for p in range(d)])       # (d, xr4, LANE)

    kern = functools.partial(cw_kernel, d=d, k=k, out_rows=out_rows,
                             dtype=value.dtype)
    y2d = pl.pallas_call(
        kern,
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
            out_specs=pl.BlockSpec((out_rows, LANE),
                                   lambda i, blk: (blk[i], 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((padded_groups, LANE),
                                       value.dtype),
        interpret=interpret,
    )(jnp.asarray(blk_of_step), jnp.asarray(ws), jnp.asarray(grp2),
      xt, jnp.asarray(value), jnp.asarray(loc))
    return y2d.reshape(-1)[:num_rows]


def banded_random(n, bw, per_row, seed=0):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n, dtype=np.int64), per_row)
    off = rng.integers(-bw, bw + 1, rows.size)
    cols = np.clip(rows + off, 0, n - 1)
    key = np.unique(rows * n + cols)
    r, c = key // n, key % n
    v = rng.standard_normal(r.size)
    rp = np.zeros(n + 1, dtype=np.int64)
    np.add.at(rp, r + 1, 1)
    np.cumsum(rp, out=rp)
    return n, n, rp, c, v


def poisson5(n_grid):
    from spmv_tpu.io.generate import poisson2d
    from spmv_tpu.models._convert import sorted_entries_0based
    mm = poisson2d(n_grid, n_grid)
    rows, cols, vals, rp = sorted_entries_0based(mm)
    return mm.num_rows, mm.num_columns, rp, cols, vals


def host_ref(num_rows, rp, cols, vals, x):
    rows = np.repeat(np.arange(num_rows, dtype=np.int64), np.diff(rp))
    y = np.zeros(num_rows)
    np.add.at(y, rows, vals * x[cols])
    return y


def run_case(name, case, configs, on_chip):
    """configs: list of (d, cap, min_pop, K, B)."""
    num_rows, num_cols, rp, cols, vals = case
    nnz = int(rp[-1])
    x = np.random.default_rng(1).standard_normal(num_cols)
    yref = host_ref(num_rows, rp, cols, vals, x)
    packed = {}
    for d, cap, min_pop, k, b in configs:
        t0 = time.time()
        pkey = (d, cap, min_pop)
        if pkey not in packed:
            packed[pkey] = pack_cw(num_rows, num_cols, rp, cols,
                                   vals, d=d, cap=cap, min_pop=min_pop)
        value, loc, a4, grp, spill_idx = packed[pkey]
        num_groups = -(-num_rows // GROUP)
        value, loc, ws, grp2, blks = pad_steps(
            value, loc, a4, grp, num_groups, k=k, out_rows=SUBLANE * b)
        tp = time.time() - t0
        fill = (nnz - spill_idx.size) / max(value.size, 1)
        sp = spill_idx.size / nnz
        print(f"{name} d={d} cap={cap} mp={min_pop} K={k} B={b}: "
              f"chunks={value.shape[0]} fill={fill:.3f} "
              f"spill={sp:.3f} pack={tp:.1f}s", flush=True)
        if not on_chip:
            continue
        import jax.numpy as jnp
        from spmv_tpu.profile.harness import time_kernel

        xr4 = int(ws.max()) + SUBLANE + 1
        xj = jnp.asarray(x.astype(np.float32))
        y = np.asarray(cw_spmv(value, loc, ws, grp2, blks, xj,
                               num_rows, num_cols, d, xr4, k=k, b=b))
        # spill entries folded in on host for the check
        ysp = np.zeros(num_rows)
        if spill_idx.size:
            rows_all = np.repeat(np.arange(num_rows, dtype=np.int64),
                                 np.diff(rp))
            np.add.at(ysp, rows_all[spill_idx],
                      vals[spill_idx] * x[cols[spill_idx]])
        rel = np.abs(y + ysp - yref).max() / max(1.0, np.abs(yref).max())
        jv, jl = jnp.asarray(value), jnp.asarray(loc)
        jw, jg, jb = jnp.asarray(ws), jnp.asarray(grp2), \
            jnp.asarray(blks)

        def step(xx, jv, jl, jw, jg, jb, d=d, xr4=xr4, k=k, b=b):
            return cw_spmv(jv, jl, jw, jg, jb, xx, num_rows,
                           num_cols, d, xr4, k=k, b=b)

        t = time_kernel(step, (xj, jv, jl, jw, jg, jb), k_small=2,
                        k_large=8, runs=4).seconds_per_iteration
        gb = value.size * 8 / t / 1e9
        print(f"   chip: {t*1e6:8.1f} us  {nnz/t/1e9:6.1f} Gnnz/s  "
              f"{gb:6.0f} GB/s-stored  chk={rel:.2e}", flush=True)


if __name__ == "__main__":
    on_chip = "--chip" in sys.argv
    print("building random banded n=1M bw=4096...", flush=True)
    rb = banded_random(1 << 20, 4096, 16)
    run_case("rb1M", rb, [
        (2, 6, 0.05, 8, 1),     # spill-relief packing, baseline step
        (2, 6, 0.05, 16, 2),
        (2, 6, 0.05, 32, 4),
        (4, 6, 0.05, 32, 4),
        (2, 8, 0.02, 32, 4),    # min spill
    ], on_chip=on_chip)
