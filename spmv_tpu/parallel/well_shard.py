"""Row-block sharded WELL SpMV — the general-matrix multi-chip path.

Each shard owns a 128-aligned, nnz-balanced block of rows stored as a
local WELL matrix (models.well) whose column indices are remapped into
the stacked x index space (like parallel.shard's CSR path, which this
composes with: same stacked (P, R) vectors, same all-gather of x over
the mesh axis).  Column locality survives the remap because stacked
positions are contiguous within each owner block, so the WELL windows
stay narrow; entries that a window cannot cover ride the per-shard CSR
spill arrays.

The local compute inside shard_map is the XLA WELL formulation —
portable to the virtual CPU test mesh; on real multi-chip hardware the
per-shard Pallas kernel can be substituted once num_columns of the
stacked space fits the kernel's x budget.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spmv_tpu.errors import MatrixError
from spmv_tpu.models.csr import CsrMatrix
from spmv_tpu.models.device import default_value_dtype, round_up, LANE
from spmv_tpu.models.partition import rows_partition_balanced_nnz
from spmv_tpu.models.well import WellMatrix, GROUP_ROWS, SLOT_SUBLANES
from spmv_tpu.parallel.mesh import AXIS_SHARDS

__all__ = [
    "ShardedWell",
    "shard_well",
    "sharded_well_spmv",
    "make_sharded_well_matvec",
    "ShardedWellHalo",
    "shard_well_halo",
    "sharded_well_halo_spmv",
    "make_sharded_well_halo_matvec",
]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["value", "local_index", "window_start", "group_of_chunk",
                 "sp_row_ids", "sp_cols", "sp_vals"],
    meta_fields=["num_rows", "num_columns", "num_entries", "num_shards",
                 "rows_per_shard", "chunks_per_shard", "spill_per_shard",
                 "window_rows", "bounds"],
)
@dataclasses.dataclass(frozen=True)
class ShardedWell:
    num_rows: int
    num_columns: int
    num_entries: int
    num_shards: int
    rows_per_shard: int        # R: multiple of 128, > max block rows
    chunks_per_shard: int      # C: uniform (inert-padded)
    spill_per_shard: int       # E: uniform (overflow-padded)
    window_rows: int
    bounds: tuple              # (P+1,) python ints, 128-aligned
    value: jax.Array           # (P, C, 8, 128)
    local_index: jax.Array     # (P, C, 8, 128) int32
    window_start: jax.Array    # (P, C, 8) int32
    group_of_chunk: jax.Array  # (P, C) int32 non-decreasing
    sp_row_ids: jax.Array      # (P, E) int32 local rows (overflow R-1)
    sp_cols: jax.Array         # (P, E) int32 stacked-space columns
    sp_vals: jax.Array         # (P, E)

    @property
    def stacked_size(self) -> int:
        return self.num_shards * self.rows_per_shard


def shard_well(
    m: CsrMatrix,
    num_shards: int,
    window_rows: int = 4,
    dtype=None,
    mesh: Mesh = None,
) -> ShardedWell:
    """Build a ShardedWell from a host CSR matrix (square)."""
    if m.num_rows != m.num_columns:
        raise MatrixError(
            "sharded WELL requires a square matrix (x and y share the "
            "row partition)"
        )
    if int(m.row_ptr[-1]) != m.num_entries:
        raise MatrixError("shard_well requires an unpadded CSR")
    dtype = dtype or default_value_dtype()
    p = int(num_shards)

    bounds = rows_partition_balanced_nnz(m.row_ptr, p)
    # WELL groups are 128 rows: align shard boundaries.
    bounds = np.minimum(
        round_up(bounds, GROUP_ROWS), m.num_rows
    )
    bounds[0] = 0
    bounds[-1] = m.num_rows
    block_rows = np.diff(bounds)
    r_shard = max(round_up(int(block_rows.max(initial=0)) + 1,
                           GROUP_ROWS), GROUP_ROWS)

    # Remap columns into stacked space (contiguous within a block).
    cols = np.asarray(m.column_index, dtype=np.int64)
    owner = np.searchsorted(bounds, cols, side="right") - 1
    stacked_cols = owner * r_shard + (cols - bounds[owner])
    global_rows = np.repeat(
        np.arange(m.num_rows, dtype=np.int64), np.diff(m.row_ptr)
    )

    wells = []
    for q in range(p):
        lo, hi = int(m.row_ptr[bounds[q]]), int(m.row_ptr[bounds[q + 1]])
        rows_local = global_rows[lo:hi] - bounds[q]
        lengths = np.bincount(rows_local, minlength=r_shard)
        rp = np.zeros(r_shard + 1, dtype=np.int64)
        np.cumsum(lengths, out=rp[1:])
        wells.append(WellMatrix._build(
            r_shard, p * r_shard, rp,
            stacked_cols[lo:hi], np.asarray(m.value[lo:hi]),
            window_rows,
        ))

    c_max = max(w.num_chunks for w in wells)
    e_max = max(
        (w.spill.num_entries if w.spill is not None else 0)
        for w in wells
    )
    e_max = max(round_up(e_max, LANE), LANE)
    num_groups = r_shard // GROUP_ROWS

    value = np.zeros((p, c_max, SLOT_SUBLANES, GROUP_ROWS))
    loc = np.zeros((p, c_max, SLOT_SUBLANES, GROUP_ROWS), dtype=np.int32)
    ws = np.zeros((p, c_max, SLOT_SUBLANES), dtype=np.int32)
    # inert pad chunks carry the LAST group so ordering stays sorted
    grp = np.full((p, c_max), num_groups - 1, dtype=np.int32)
    sp_rows = np.full((p, e_max), r_shard - 1, dtype=np.int32)
    sp_cols = np.zeros((p, e_max), dtype=np.int32)
    sp_vals = np.zeros((p, e_max))

    for q, w in enumerate(wells):
        c = w.num_chunks
        value[q, :c] = w.value
        loc[q, :c] = w.local_index
        ws[q, :c] = w.window_start
        grp[q, :c] = w.group_of_chunk
        if w.spill is not None:
            e = w.spill.num_entries
            sp_rows[q, :e] = np.repeat(
                np.arange(r_shard, dtype=np.int32),
                np.diff(w.spill.row_ptr),
            )
            sp_cols[q, :e] = w.spill.column_index
            sp_vals[q, :e] = w.spill.value

    arrays = dict(
        value=jnp.asarray(value, dtype=dtype),
        local_index=jnp.asarray(loc),
        window_start=jnp.asarray(ws),
        group_of_chunk=jnp.asarray(grp),
        sp_row_ids=jnp.asarray(sp_rows),
        sp_cols=jnp.asarray(sp_cols),
        sp_vals=jnp.asarray(sp_vals, dtype=dtype),
    )
    if mesh is not None:
        for k, v in arrays.items():
            spec = P(AXIS_SHARDS, *([None] * (v.ndim - 1)))
            arrays[k] = jax.device_put(v, NamedSharding(mesh, spec))

    return ShardedWell(
        num_rows=m.num_rows,
        num_columns=m.num_columns,
        num_entries=m.num_entries,
        num_shards=p,
        rows_per_shard=r_shard,
        chunks_per_shard=c_max,
        spill_per_shard=e_max,
        window_rows=window_rows,
        bounds=tuple(int(b) for b in bounds),
        **arrays,
    )


def _local_well_spmv(A: ShardedWell, blk, x_stacked, axis_name):
    value, loc, ws, grp, spr, spc, spv = blk
    x_full = jax.lax.all_gather(x_stacked[0], axis_name).reshape(-1)

    xcol = ws[0][:, :, None] * LANE + loc[0]       # (C, 8, 128)
    gathered = jnp.take(x_full, xcol, mode="clip")
    contrib = (value[0] * gathered).sum(axis=1)     # (C, 128)
    num_groups = A.rows_per_shard // GROUP_ROWS
    y = jax.ops.segment_sum(
        contrib, grp[0],
        num_segments=num_groups,
        indices_are_sorted=True,
    ).reshape(-1)

    sp = spv[0] * jnp.take(x_full, spc[0], mode="clip")
    y = y + jax.ops.segment_sum(
        sp, spr[0],
        num_segments=A.rows_per_shard,
        indices_are_sorted=True,
    )
    # overflow slot collects spill padding; zero it for clean dots
    y = y.at[A.rows_per_shard - 1].set(0.0)
    return y[None, :]


def sharded_well_spmv(
    A: ShardedWell, x_stacked, mesh: Mesh, axis_name: str = AXIS_SHARDS
):
    """y = A @ x over the mesh; vectors in stacked (P, R) layout."""
    spec1 = P(axis_name, None)
    fn = jax.shard_map(
        partial(_local_well_spmv, A, axis_name=axis_name),
        mesh=mesh,
        in_specs=(
            (
                P(axis_name, None, None, None),
                P(axis_name, None, None, None),
                P(axis_name, None, None),
                P(axis_name, None),
                P(axis_name, None),
                P(axis_name, None),
                P(axis_name, None),
            ),
            spec1,
        ),
        out_specs=spec1,
    )
    blk = (A.value, A.local_index, A.window_start, A.group_of_chunk,
           A.sp_row_ids, A.sp_cols, A.sp_vals)
    return fn(blk, x_stacked)


def make_sharded_well_matvec(A: ShardedWell, mesh: Mesh):
    def matvec(x_stacked):
        return sharded_well_spmv(A, x_stacked, mesh)

    return matvec


# ---------------------------------------------------------------------------
# Halo-exchange variant (VERDICT r1 next-round #2): exchange only the x
# elements the windows/spill actually reference across shards, instead
# of all-gathering the stacked x.


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["value", "gather_idx", "group_of_chunk",
                 "sp_row_ids", "sp_cols", "sp_vals", "send_idx"],
    meta_fields=["num_rows", "num_columns", "num_entries", "num_shards",
                 "rows_per_shard", "chunks_per_shard", "spill_per_shard",
                 "window_rows", "bounds", "exchange", "max_distance",
                 "halo_slots", "comm_elements_exact",
                 "comm_elements_padded"],
)
@dataclasses.dataclass(frozen=True)
class ShardedWellHalo:
    """ShardedWell with a precomputed extended-space gather table.

    ``gather_idx`` indexes the per-shard extended vector
    ``[own x block (R) | received halo slots]`` — window starts and
    local indices are folded into one static table at build time, so
    the kernel is a single take + segment-sum per part and the
    collective moves O(halo) elements (halo_shard.ExchangeSchedule).
    """

    num_rows: int
    num_columns: int
    num_entries: int
    num_shards: int
    rows_per_shard: int
    chunks_per_shard: int
    spill_per_shard: int
    window_rows: int
    bounds: tuple
    exchange: str
    max_distance: int
    halo_slots: int
    comm_elements_exact: int
    comm_elements_padded: int
    value: jax.Array           # (P, C, 8, 128)
    gather_idx: jax.Array      # (P, C, 8, 128) int32 into extended x
    group_of_chunk: jax.Array  # (P, C) int32
    sp_row_ids: jax.Array      # (P, E) int32
    sp_cols: jax.Array         # (P, E) int32 into extended x
    sp_vals: jax.Array         # (P, E)
    send_idx: jax.Array        # (P, strips, H) int32 (halo_shard layout)

    @property
    def stacked_size(self) -> int:
        return self.num_shards * self.rows_per_shard


def shard_well_halo(
    m: CsrMatrix,
    num_shards: int,
    window_rows: int = 4,
    dtype=None,
    mesh: Mesh = None,
    exchange: str = "auto",
    neighbor_max_distance: int = 3,
) -> ShardedWellHalo:
    """Halo-exchange sharding of a square CSR matrix as local WELLs.

    Packs each shard's row block exactly like ``shard_well``, then
    derives the referenced-position sets from the window tables + spill
    and builds the exchange schedule from them — the WELL analogue of
    ``halo_shard.shard_csr_halo``.
    """
    from spmv_tpu.parallel.halo_shard import build_exchange_schedule

    base = shard_well(m, num_shards, window_rows=window_rows,
                      dtype=dtype, mesh=None)
    p = base.num_shards
    R = base.rows_per_shard
    stacked = p * R

    ws = np.asarray(base.window_start, dtype=np.int64)   # (P, C, 8)
    loc = np.asarray(base.local_index, dtype=np.int64)   # (P, C, 8, 128)
    xcol = np.clip(
        ws[..., None] * LANE + loc, 0, stacked - 1
    )                                                    # (P, C, 8, 128)
    sp_cols = np.clip(
        np.asarray(base.sp_cols, dtype=np.int64), 0, stacked - 1
    )

    # Padded cells (value 0) must not create phantom halo needs: their
    # clipped window positions land in shard 0's range and would force
    # every other shard into a needless (or wider) exchange.  Redirect
    # them to a local element — the zero value multiplies whatever is
    # gathered away.  (Also covers explicitly stored zeros, which is
    # equally correct.)
    val = np.asarray(base.value)
    spv = np.asarray(base.sp_vals)
    for q in range(p):
        xcol[q][val[q] == 0] = q * R
        sp_cols[q][spv[q] == 0] = q * R

    owner_bounds = np.arange(p + 1, dtype=np.int64) * R
    needs = []
    for q in range(p):
        pos = np.concatenate(
            [xcol[q].reshape(-1), sp_cols[q].reshape(-1)]
        )
        remote = pos[(pos < q * R) | (pos >= (q + 1) * R)]
        needs.append(np.unique(remote))

    sched = build_exchange_schedule(
        needs, owner_bounds, exchange=exchange,
        neighbor_max_distance=neighbor_max_distance,
    )

    gather_idx = np.empty_like(xcol, dtype=np.int64)
    sp_ext = np.empty_like(sp_cols)
    for q in range(p):
        local = (xcol[q] >= q * R) & (xcol[q] < (q + 1) * R)
        gi = np.where(local, xcol[q] - q * R, 0)
        if (~local).any():
            gi[~local] = R + sched.remap(q, xcol[q][~local])
        gather_idx[q] = gi
        sl = (sp_cols[q] >= q * R) & (sp_cols[q] < (q + 1) * R)
        se = np.where(sl, sp_cols[q] - q * R, 0)
        if (~sl).any():
            se[~sl] = R + sched.remap(q, sp_cols[q][~sl])
        sp_ext[q] = se

    arrays = dict(
        value=base.value,
        gather_idx=jnp.asarray(gather_idx.astype(np.int32)),
        group_of_chunk=base.group_of_chunk,
        sp_row_ids=base.sp_row_ids,
        sp_cols=jnp.asarray(sp_ext.astype(np.int32)),
        sp_vals=base.sp_vals,
        send_idx=jnp.asarray(sched.send_idx),
    )
    if mesh is not None:
        for k, v in arrays.items():
            spec = P(AXIS_SHARDS, *([None] * (v.ndim - 1)))
            arrays[k] = jax.device_put(v, NamedSharding(mesh, spec))

    return ShardedWellHalo(
        num_rows=base.num_rows,
        num_columns=base.num_columns,
        num_entries=base.num_entries,
        num_shards=p,
        rows_per_shard=R,
        chunks_per_shard=base.chunks_per_shard,
        spill_per_shard=base.spill_per_shard,
        window_rows=window_rows,
        bounds=base.bounds,
        exchange=sched.exchange,
        max_distance=sched.max_distance,
        halo_slots=sched.halo_slots,
        comm_elements_exact=sched.comm_elements_exact,
        comm_elements_padded=sched.comm_elements_padded,
        **arrays,
    )


def _local_well_halo_spmv(A: ShardedWellHalo, blk, x_stacked, axis_name):
    from spmv_tpu.parallel.halo_shard import exchange_halos

    value, gidx, grp, spr, spc, spv, send_idx = blk
    x = x_stacked[0]                                  # (R,)
    if A.exchange != "none":
        x_halo = exchange_halos(
            x, send_idx[0], axis_name, exchange=A.exchange,
            num_shards=A.num_shards, max_distance=A.max_distance,
        )
        x_ext = jnp.concatenate([x, x_halo])
    else:
        x_ext = x

    gathered = jnp.take(x_ext, gidx[0], mode="clip")  # (C, 8, 128)
    contrib = (value[0] * gathered).sum(axis=1)        # (C, 128)
    num_groups = A.rows_per_shard // GROUP_ROWS
    y = jax.ops.segment_sum(
        contrib, grp[0],
        num_segments=num_groups,
        indices_are_sorted=True,
    ).reshape(-1)

    sp = spv[0] * jnp.take(x_ext, spc[0], mode="clip")
    y = y + jax.ops.segment_sum(
        sp, spr[0],
        num_segments=A.rows_per_shard,
        indices_are_sorted=True,
    )
    y = y.at[A.rows_per_shard - 1].set(0.0)
    return y[None, :]


def sharded_well_halo_spmv(
    A: ShardedWellHalo, x_stacked, mesh: Mesh, axis_name: str = AXIS_SHARDS
):
    """y = A @ x over the mesh; vectors in stacked (P, R) layout."""
    spec1 = P(axis_name, None)
    fn = jax.shard_map(
        partial(_local_well_halo_spmv, A, axis_name=axis_name),
        mesh=mesh,
        in_specs=(
            (
                P(axis_name, None, None, None),
                P(axis_name, None, None, None),
                P(axis_name, None),
                P(axis_name, None),
                P(axis_name, None),
                P(axis_name, None),
                P(axis_name, None, None),
            ),
            spec1,
        ),
        out_specs=spec1,
    )
    blk = (A.value, A.gather_idx, A.group_of_chunk,
           A.sp_row_ids, A.sp_cols, A.sp_vals, A.send_idx)
    return fn(blk, x_stacked)


def make_sharded_well_halo_matvec(A: ShardedWellHalo, mesh: Mesh):
    def matvec(x_stacked):
        return sharded_well_halo_spmv(A, x_stacked, mesh)

    return matvec
