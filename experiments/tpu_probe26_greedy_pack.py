"""Probe 26: greedy column-order WELL packing for irregular matrices.

Round-1 packing fills slot s with each row's s-th stored column; on a
random banded matrix the s-th order statistic spreads ~2x the window
-> 31% spill into the slow CSR path (the VERDICT #4 cliff).

Greedy scheme (per 128-row group): sort entries by column, first-fit
each into an open slot whose window (grown lane-aligned, capped at
m*128 columns) covers the column and whose row cell is free; open a
new slot otherwise.  Spill is structurally zero; the cost is fill.

Measures: fill ratio + chunks for m in {2,4,8} on random banded
(n=1M, bw=4096, 16/row), correctness vs dense on a small case, and
on-chip SpMV rate vs the round-1 packer.
"""

import sys
import time

import numpy as np

from spmv_tpu.io.matrix_market import MatrixMarket
from spmv_tpu.models import WellMatrix
from spmv_tpu.models.csr import CsrMatrix
from spmv_tpu.models.well import GROUP_ROWS, SLOT_SUBLANES, LANE
from spmv_tpu.io.matrix_market import VALUE_DTYPE


def greedy_pack(num_rows, num_columns, row_ptr, cols, vals, m):
    """Greedy column-order first-fit packing.  Returns the WellMatrix
    field tuple (value, local_index, window_start, group_of_chunk) with
    no spill."""
    wcols = m * LANE
    num_groups = max(-(-num_rows // GROUP_ROWS), 1)
    rows_all = np.repeat(np.arange(num_rows, dtype=np.int64),
                         np.diff(row_ptr))
    chunk_val, chunk_loc, chunk_ws, chunk_grp = [], [], [], []

    for g in range(num_groups):
        r0, r1 = g * GROUP_ROWS, min((g + 1) * GROUP_ROWS, num_rows)
        lo, hi = row_ptr[r0], row_ptr[r1]
        if hi == lo:
            continue
        gr = rows_all[lo:hi] - r0
        gc = cols[lo:hi]
        gv = vals[lo:hi]
        order = np.argsort(gc, kind="stable")
        gr, gc, gv = gr[order], gc[order], gv[order]

        # open slots: parallel lists.  Entries arrive in column order, so
        # a slot whose window ends at or before the sweep column can never
        # accept another entry — retire it (move to done) to keep the
        # first-fit scan O(active) instead of O(total).
        ws_list = []              # aligned window start (col units)
        occ = []                  # (128,) bool occupancy
        val_sl = []               # (128,) values
        loc_sl = []               # (128,) local index
        done_ws, done_val, done_loc = [], [], []
        active0 = 0               # slots before this index are retired
        for e in range(gr.size):
            r, c, v = int(gr[e]), int(gc[e]), gv[e]
            while active0 < len(ws_list) and ws_list[active0] + wcols <= c:
                done_ws.append(ws_list[active0])
                done_val.append(val_sl[active0])
                done_loc.append(loc_sl[active0])
                active0 += 1
            placed = False
            for s in range(active0, len(ws_list)):
                if ws_list[s] <= c < ws_list[s] + wcols and not occ[s][r]:
                    occ[s][r] = True
                    val_sl[s][r] = v
                    loc_sl[s][r] = c - ws_list[s]
                    placed = True
                    break
            if not placed:
                ws_list.append((c // LANE) * LANE)
                occ.append(np.zeros(GROUP_ROWS, dtype=bool))
                val_sl.append(np.zeros(GROUP_ROWS, dtype=VALUE_DTYPE))
                loc_sl.append(np.zeros(GROUP_ROWS, dtype=np.int64))
                occ[-1][r] = True
                val_sl[-1][r] = v
                loc_sl[-1][r] = c - ws_list[-1]
        ws_list = done_ws + ws_list[active0:]
        val_sl = done_val + val_sl[active0:]
        loc_sl = done_loc + loc_sl[active0:]
        ns = len(ws_list)
        n_chunks = -(-ns // SLOT_SUBLANES)
        for ci in range(n_chunks):
            s0 = ci * SLOT_SUBLANES
            vt = np.zeros((SLOT_SUBLANES, GROUP_ROWS), dtype=VALUE_DTYPE)
            lt = np.zeros((SLOT_SUBLANES, GROUP_ROWS), dtype=np.int32)
            wt = np.zeros(SLOT_SUBLANES, dtype=np.int32)
            for s in range(s0, min(s0 + SLOT_SUBLANES, ns)):
                vt[s - s0] = val_sl[s]
                lt[s - s0] = loc_sl[s]
                wt[s - s0] = ws_list[s] // LANE
            chunk_val.append(vt)
            chunk_loc.append(lt)
            chunk_ws.append(wt)
            chunk_grp.append(g)

    # zero chunks for empty 8-group output blocks (kernel invariant)
    num_blocks = -(-num_groups // 8)
    seen = {g // 8 for g in chunk_grp}
    for blk in range(num_blocks):
        if blk not in seen:
            chunk_val.append(np.zeros((SLOT_SUBLANES, GROUP_ROWS),
                                      dtype=VALUE_DTYPE))
            chunk_loc.append(np.zeros((SLOT_SUBLANES, GROUP_ROWS),
                                      dtype=np.int32))
            chunk_ws.append(np.zeros(SLOT_SUBLANES, dtype=np.int32))
            chunk_grp.append(blk * 8)
    order = np.argsort(np.asarray(chunk_grp), kind="stable")
    value = np.stack([chunk_val[i] for i in order])
    local_index = np.stack([chunk_loc[i] for i in order]).astype(np.int32)
    window_start = np.stack([chunk_ws[i] for i in order]).astype(np.int32)
    group_of_chunk = np.asarray([chunk_grp[i] for i in order],
                                dtype=np.int32)
    return value, local_index, window_start, group_of_chunk


def well_from_greedy(num_rows, num_columns, row_ptr, cols, vals, m):
    value, loc, ws, grp = greedy_pack(
        num_rows, num_columns, row_ptr, cols, vals, m)
    return WellMatrix(
        num_rows=num_rows, num_columns=num_columns,
        num_entries=int(row_ptr[-1]), window_rows=m,
        value=value, local_index=loc, window_start=ws,
        group_of_chunk=grp, spill=None,
    )


def banded_random(n, bw, per_row, seed=0):
    """Probe-12's irregular matrix: per_row random nnz within a band."""
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n, dtype=np.int64), per_row)
    off = rng.integers(-bw, bw + 1, rows.size)
    cols = np.clip(rows + off, 0, n - 1)
    key = np.unique(rows * n + cols)
    r, c = key // n, key % n
    v = rng.standard_normal(r.size)
    return MatrixMarket(
        "matrix", "coordinate", "real", "general", n, n, r.size,
        (r + 1).astype(np.int64), (c + 1).astype(np.int64), v,
    )


def mm_arrays(mm):
    from spmv_tpu.models._convert import sorted_entries_0based
    rows, cols, vals, row_ptr = sorted_entries_0based(mm)
    return row_ptr, cols, vals


if __name__ == "__main__":
    # correctness on a small irregular matrix
    mm_s = banded_random(1000, 300, 12, seed=3)
    rp, cc, vv = mm_arrays(mm_s)
    W = well_from_greedy(mm_s.num_rows, mm_s.num_columns, rp, cc, vv, 2)
    x = np.random.default_rng(0).standard_normal(mm_s.num_columns)
    y = W.spmv(x)
    csr = CsrMatrix.from_matrix_market(mm_s)
    y_ref = np.zeros(mm_s.num_rows)
    for i in range(mm_s.num_rows):
        s, e = csr.row_ptr[i], csr.row_ptr[i + 1]
        y_ref[i] = (csr.value[s:e] * x[csr.column_index[s:e]]).sum()
    err = np.abs(y - y_ref).max()
    print(f"small correctness: max err {err:.2e}", flush=True)
    assert err < 1e-10

    # fill statistics at scale
    n = 1 << 20
    print("building random banded n=1M bw=4096...", flush=True)
    mm = banded_random(n, 4096, 16, seed=0)
    rp, cc, vv = mm_arrays(mm)
    nnz = int(rp[-1])
    for m in (2, 4, 8):
        t0 = time.time()
        value, loc, ws, grp = greedy_pack(n, mm.num_columns, rp, cc, vv, m)
        fill = nnz / value.size
        print(f"greedy m={m}: chunks={value.shape[0]} fill={fill:.3f} "
              f"spill=0  ({time.time()-t0:.0f}s to pack)", flush=True)

    # round-1 packer comparison
    t0 = time.time()
    W1 = WellMatrix.from_matrix_market(mm, window_rows=4)
    print(f"round1 m=4: chunks={W1.num_chunks} fill={W1.fill_ratio:.3f} "
          f"spill={W1.spill_fraction:.3f} ({time.time()-t0:.0f}s)",
          flush=True)

    if "--chip" in sys.argv:
        import jax
        import jax.numpy as jnp
        from spmv_tpu.models.device import DeviceWell
        from spmv_tpu.ops.pallas_kernels import well_spmv
        from spmv_tpu.profile.harness import time_kernel

        xj = np.random.default_rng(1).standard_normal(
            mm.num_columns).astype(np.float32)
        for m in (2, 4, 8):
            Wg = well_from_greedy(n, mm.num_columns, rp, cc, vv, m)
            A = DeviceWell.from_host(Wg, dtype=jnp.float32)
            yd = np.asarray(well_spmv(A, jnp.asarray(xj)))
            # host check
            yh = Wg.spmv(xj.astype(np.float64))
            rel = np.abs(yd - yh).max() / max(1.0, np.abs(yh).max())
            t = time_kernel(
                lambda v, Aa: well_spmv(Aa, v)[: len(xj)],
                (jnp.asarray(xj), A), k_small=2, k_large=8, runs=4,
            ).seconds_per_iteration
            print(f"chip greedy m={m}: {t*1e6:8.1f} us "
                  f"{nnz/t/1e9:6.1f} Gnnz/s  chk={rel:.2e}", flush=True)
