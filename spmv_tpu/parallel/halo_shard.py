"""Row-block sharded CSR SpMV with ragged halo exchange.

Replaces the all-gather of x (parallel.shard) with an exchange of only
the x elements that actually cross shard boundaries — the executable
form of the reference's remote-traffic model, which *prices* exactly
these elements by attributing each x-gather to the NUMA domain owning
its page (csr-matrix.cpp:132-136, cache-trace.cpp:156-160).  Per SpMV
step each shard moves O(halo) bytes over ICI instead of O(n), where the
halo is computed by parallel.halo.build_halo_plan.

Exchange strategies (picked at build time from the halo plan):

- ``neighbor``: when every remote x element lives within ``D`` shards
  of its consumer (banded / RCM-reordered matrices), exchange one
  uniformly padded strip per (direction, distance) via ``lax.ppermute``
  — 2*D messages of H_d elements, the generalization of the DIA halo
  path (parallel.dia_shard) to ragged element sets.
- ``all2all``: otherwise, a single ``lax.all_to_all`` of per-pair
  padded slots — P*H elements per shard, still O(halo) when the halo
  is balanced, never O(n).

Column indices are split at build time into an **interior** list (local
x) and a **boundary** list (received halo slots), so the interior
segment-sum has no data dependency on the collective and XLA overlaps
the ICI transfer with the bulk of the compute — the same overlap
structure as the DIA halo kernel (dia_shard._local_dia_spmv).

Vectors use the same stacked (P, R) layout as parallel.shard, so the
halo path is a drop-in replacement for the all-gather path (bit-for-bit
identical results — tests/test_halo_shard.py) and composes with the
same CG driver.
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
from spmv_tpu.models.device import default_value_dtype, round_up
from spmv_tpu.models.partition import (
    rows_partition_balanced_nnz,
    rows_partition_equal,
)
from spmv_tpu.parallel.halo import build_halo_plan, communication_volume
from spmv_tpu.parallel.mesh import AXIS_SHARDS

__all__ = [
    "ShardedCsrHalo",
    "shard_csr_halo",
    "sharded_halo_spmv",
    "make_sharded_halo_matvec",
    "ExchangeSchedule",
    "build_exchange_schedule",
    "exchange_halos",
]

SLOT_PAD = 8  # pair/strip slot counts padded to sublane multiples


@dataclasses.dataclass(frozen=True)
class ExchangeSchedule:
    """Static halo-exchange schedule over a 1-D shard axis.

    Built from per-shard *need lists* (sorted distinct remote positions
    each shard references) by ``build_exchange_schedule``; shared by the
    CSR and WELL halo paths.  ``send_idx[p, strip, s]`` is the sender-
    local position (within p's own block) of slot s of that strip; a
    receiver's flat halo vector concatenates its incoming strips in
    strip order, so position ``remap`` maps a global position to its
    receiver-side halo slot.
    """

    num_shards: int
    exchange: str              # "neighbor" | "all2all" | "none"
    max_distance: int          # D (neighbor mode; else 0)
    halo_slots: int            # H per strip
    num_strips: int            # 2*D (neighbor) or P (all2all)
    send_idx: np.ndarray       # (P, max(strips,1), max(H,1)) int32
    comm_elements_exact: int
    comm_elements_padded: int
    # per dst shard: sorted needs + their flat halo slots (same order)
    _needs: tuple              # tuple of np.ndarray (sorted positions)
    _slots: tuple              # tuple of np.ndarray (flat halo index)

    def remap(self, dst: int, pos: np.ndarray) -> np.ndarray:
        """Flat halo slots (on shard dst) of global positions ``pos``
        (every entry must be in dst's need list)."""
        pos = np.asarray(pos, dtype=np.int64)
        needs = self._needs[dst]
        i = np.searchsorted(needs, pos)
        if pos.size and not (
            (i < needs.size) & (needs[np.minimum(i, needs.size - 1)]
                                == pos)
        ).all():
            raise ValueError("position not in the shard's need list")
        return self._slots[dst][i]


def build_exchange_schedule(
    needs: list,
    owner_bounds: np.ndarray,
    exchange: str = "auto",
    neighbor_max_distance: int = 3,
) -> ExchangeSchedule:
    """Build the exchange schedule from per-shard need lists.

    ``needs[p]``: sorted distinct global positions shard p references
    outside its own ``[owner_bounds[p], owner_bounds[p+1])`` range.
    """
    owner_bounds = np.asarray(owner_bounds, dtype=np.int64)
    p = owner_bounds.size - 1
    needs = [np.asarray(n, dtype=np.int64) for n in needs]
    sources = [
        np.searchsorted(owner_bounds, n, side="right") - 1 for n in needs
    ]

    pair_sizes = np.zeros((p, p), dtype=np.int64)
    max_dist = 0
    for dst in range(p):
        if sources[dst].size:
            np.add.at(pair_sizes[:, dst], sources[dst], 1)
            max_dist = max(
                max_dist, int(np.abs(sources[dst] - dst).max())
            )
    total = int(sum(n.size for n in needs))

    if exchange == "auto":
        if total == 0 or p == 1:
            exchange = "none"
        elif max_dist <= neighbor_max_distance:
            exchange = "neighbor"
        else:
            exchange = "all2all"

    if exchange == "neighbor" and max_dist > 0:
        D = max_dist
        n_strips = 2 * D
        H = max(
            round_up(int(pair_sizes.max(initial=0)), SLOT_PAD), SLOT_PAD
        )

        # Relative strip index (same from both ends): left halos by
        # ascending distance, then right halos by ascending distance.
        def send_strip(src, dst):
            d = dst - src
            return d - 1 if d > 0 else D + (-d) - 1

        recv_strip = send_strip
    elif exchange == "all2all":
        D = 0
        n_strips = p
        H = max(
            round_up(int(pair_sizes.max(initial=0)), SLOT_PAD), SLOT_PAD
        )

        # Sender's strip q goes TO shard q; the receiver's flat halo
        # vector is indexed by the SOURCE shard.
        def send_strip(src, dst):
            return dst

        def recv_strip(src, dst):
            return src
    else:
        exchange, D, n_strips, H = "none", 0, 0, 0
        send_strip = recv_strip = None

    send_idx = np.zeros((p, max(n_strips, 1), max(H, 1)), dtype=np.int32)
    slots = []
    for dst in range(p):
        slot = np.zeros(needs[dst].size, dtype=np.int64)
        for q in np.unique(sources[dst]):
            sel = sources[dst] == q
            cols_q = needs[dst][sel]       # sorted run (needs sorted,
            #                                owner ranges contiguous)
            send_idx[q, send_strip(int(q), dst), : cols_q.size] = (
                cols_q - owner_bounds[q]
            )
            slot[sel] = (recv_strip(int(q), dst) * H
                         + np.arange(cols_q.size))
        slots.append(slot)

    return ExchangeSchedule(
        num_shards=p,
        exchange=exchange,
        max_distance=D,
        halo_slots=H,
        num_strips=n_strips,
        send_idx=send_idx,
        comm_elements_exact=total,
        comm_elements_padded=int(p * n_strips * H),
        _needs=tuple(needs),
        _slots=tuple(slots),
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["i_row_ids", "i_cols", "i_vals",
                 "b_row_ids", "b_cols", "b_vals", "send_idx"],
    meta_fields=["num_rows", "num_columns", "num_entries", "num_shards",
                 "rows_per_shard", "interior_per_shard",
                 "boundary_per_shard", "halo_slots", "bounds",
                 "exchange", "max_distance", "comm_elements_exact",
                 "comm_elements_padded"],
)
@dataclasses.dataclass(frozen=True)
class ShardedCsrHalo:
    """CSR split into P row blocks with a static halo-exchange plan.

    ``send_idx`` layout depends on ``exchange``:

    - ``all2all``: (P, P, H) — slot s of the strip shard p sends to
      shard q is p's local x index ``send_idx[p, q, s]``;
    - ``neighbor``: (P, 2*D, H) — strip d < D goes to shard p+1+d
      (left halos, ascending distance), strip D+d to shard p-1-d
      (right halos).

    Boundary column ids index the flat received-halo vector, whose
    layout matches the concatenated receive strips.
    """

    num_rows: int
    num_columns: int
    num_entries: int
    num_shards: int
    rows_per_shard: int        # R
    interior_per_shard: int    # Ei
    boundary_per_shard: int    # Eb
    halo_slots: int            # H (per pair / per strip)
    bounds: tuple              # (P+1,) python ints
    exchange: str              # "neighbor" | "all2all" | "none"
    max_distance: int          # D (neighbor mode; else 0)
    comm_elements_exact: int   # sum of true pairwise halo sizes
    comm_elements_padded: int  # elements actually moved per step (all shards)
    i_row_ids: jax.Array       # (P, Ei) int32 local rows (overflow R-1)
    i_cols: jax.Array          # (P, Ei) int32 local x indices
    i_vals: jax.Array          # (P, Ei)
    b_row_ids: jax.Array       # (P, Eb) int32
    b_cols: jax.Array          # (P, Eb) int32 into flat halo recv
    b_vals: jax.Array          # (P, Eb)
    send_idx: jax.Array        # see class docstring

    @property
    def stacked_size(self) -> int:
        return self.num_shards * self.rows_per_shard


def shard_csr_halo(
    m: CsrMatrix,
    num_shards: int,
    dtype=None,
    partition: str = "nnz",
    mesh: Mesh = None,
    exchange: str = "auto",
    neighbor_max_distance: int = 3,
) -> ShardedCsrHalo:
    """Build the halo-exchange sharding of a square host CSR matrix.

    ``exchange``: "auto" picks "neighbor" when the halo plan's maximum
    source distance is <= neighbor_max_distance, else "all2all";
    either can be forced.
    """
    if m.num_rows != m.num_columns:
        raise MatrixError(
            "halo-sharded CSR requires a square matrix (x and y share "
            "the row partition); use parallel.shard for rectangular"
        )
    dtype = dtype or default_value_dtype()
    p = int(num_shards)
    if partition == "nnz":
        bounds = rows_partition_balanced_nnz(m.row_ptr, p)
    elif partition == "rows":
        bounds = rows_partition_equal(m.num_rows, p)
    else:
        raise ValueError(f"unknown partition strategy {partition!r}")
    bounds = np.asarray(bounds, dtype=np.int64)

    plan = build_halo_plan(m, bounds)
    vol = communication_volume(m, bounds)

    block_rows = np.diff(bounds)
    R = round_up(int(block_rows.max(initial=0)) + 1, 8)

    sched = build_exchange_schedule(
        list(plan.halo_indices), bounds,
        exchange=exchange,
        neighbor_max_distance=neighbor_max_distance,
    )
    assert sched.comm_elements_exact == vol["halo_elements"]

    # ---- entry split ------------------------------------------------------
    global_rows = np.repeat(
        np.arange(m.num_rows, dtype=np.int64), np.diff(m.row_ptr)
    )
    cols = np.asarray(m.column_index, dtype=np.int64)
    owner = np.searchsorted(bounds, cols, side="right") - 1

    i_rows_l, i_cols_l, i_vals_l = [], [], []
    b_rows_l, b_cols_l, b_vals_l = [], [], []
    for q in range(p):
        lo = int(m.row_ptr[bounds[q]])
        hi = int(m.row_ptr[bounds[q + 1]])
        rows_q = global_rows[lo:hi] - bounds[q]
        cols_q = cols[lo:hi]
        vals_q = np.asarray(m.value[lo:hi])
        local = owner[lo:hi] == q
        i_rows_l.append(rows_q[local].astype(np.int32))
        i_cols_l.append((cols_q[local] - bounds[q]).astype(np.int32))
        i_vals_l.append(vals_q[local])
        rem_cols = cols_q[~local]
        b_rows_l.append(rows_q[~local].astype(np.int32))
        b_cols_l.append(sched.remap(q, rem_cols).astype(np.int32))
        b_vals_l.append(vals_q[~local])

    Ei = max(round_up(max(a.size for a in i_rows_l), 1024), 1024)
    Eb = max(round_up(max(a.size for a in b_rows_l), SLOT_PAD), SLOT_PAD)

    i_row_ids = np.full((p, Ei), R - 1, dtype=np.int32)
    i_cols_a = np.zeros((p, Ei), dtype=np.int32)
    i_vals_a = np.zeros((p, Ei), dtype=np.float64)
    b_row_ids = np.full((p, Eb), R - 1, dtype=np.int32)
    b_cols_a = np.zeros((p, Eb), dtype=np.int32)
    b_vals_a = np.zeros((p, Eb), dtype=np.float64)
    for q in range(p):
        k = i_rows_l[q].size
        i_row_ids[q, :k] = i_rows_l[q]
        i_cols_a[q, :k] = i_cols_l[q]
        i_vals_a[q, :k] = i_vals_l[q]
        k = b_rows_l[q].size
        b_row_ids[q, :k] = b_rows_l[q]
        b_cols_a[q, :k] = b_cols_l[q]
        b_vals_a[q, :k] = b_vals_l[q]

    arrays = dict(
        i_row_ids=jnp.asarray(i_row_ids),
        i_cols=jnp.asarray(i_cols_a),
        i_vals=jnp.asarray(i_vals_a, dtype=dtype),
        b_row_ids=jnp.asarray(b_row_ids),
        b_cols=jnp.asarray(b_cols_a),
        b_vals=jnp.asarray(b_vals_a, dtype=dtype),
        send_idx=jnp.asarray(sched.send_idx),
    )
    if mesh is not None:
        for k, v in arrays.items():
            spec = P(AXIS_SHARDS, *([None] * (v.ndim - 1)))
            arrays[k] = jax.device_put(v, NamedSharding(mesh, spec))

    return ShardedCsrHalo(
        num_rows=m.num_rows,
        num_columns=m.num_columns,
        num_entries=m.num_entries,
        num_shards=p,
        rows_per_shard=R,
        interior_per_shard=Ei,
        boundary_per_shard=Eb,
        halo_slots=sched.halo_slots,
        bounds=tuple(int(b) for b in bounds),
        exchange=sched.exchange,
        max_distance=sched.max_distance,
        comm_elements_exact=sched.comm_elements_exact,
        comm_elements_padded=sched.comm_elements_padded,
        **arrays,
    )


def exchange_halos(x, send_idx, axis_name, *, exchange, num_shards,
                   max_distance):
    """Run the halo collective; returns the flat receive vector.

    Shared by the CSR, WELL, and BSR halo paths (call inside
    shard_map).  ``send_idx`` is this shard's (strips, H) table of
    local x indices into ``x``'s leading axis; trailing axes of ``x``
    ride along (BSR exchanges (H, 128, k) block tiles), and the
    receive vector is flat only in the leading (slot) axis.
    """
    p, D = num_shards, max_distance
    if exchange == "neighbor":
        strips = []
        # left halos: what shard q-1-d.. sends forward; receiver's
        # strip d holds the strip from distance d+1 BELOW it.
        for d in range(D):
            strips.append(jax.lax.ppermute(
                x[send_idx[d]], axis_name,
                perm=[(q, q + 1 + d) for q in range(p - 1 - d)],
            ))
        for d in range(D):
            strips.append(jax.lax.ppermute(
                x[send_idx[D + d]], axis_name,
                perm=[(q, q - 1 - d) for q in range(1 + d, p)],
            ))
        return jnp.concatenate(strips)
    # all2all: send strip q to shard q, receive strip from every shard.
    send = x[send_idx]                        # (P, H, *trailing)
    recv = jax.lax.all_to_all(
        send, axis_name, split_axis=0, concat_axis=0, tiled=True
    )                                          # (P, H, *trailing)
    return recv.reshape((-1,) + recv.shape[2:])


def _local_halo_spmv(A: ShardedCsrHalo, blk, x_stacked, axis_name):
    """Per-shard body: interior segment-sum overlapped with the halo
    collective, then the boundary contribution (dia_shard's overlap
    structure applied to ragged CSR)."""
    i_rows, i_cols, i_vals, b_rows, b_cols, b_vals, send_idx = blk
    x = x_stacked[0]                           # (R,)
    R = A.rows_per_shard

    if A.exchange != "none":
        x_halo = exchange_halos(
            x, send_idx[0], axis_name, exchange=A.exchange,
            num_shards=A.num_shards, max_distance=A.max_distance,
        )

    prod = i_vals[0] * jnp.take(x, i_cols[0], axis=0)
    y = jax.ops.segment_sum(
        prod, i_rows[0], num_segments=R, indices_are_sorted=True,
    )
    if A.exchange != "none":
        bprod = b_vals[0] * jnp.take(x_halo, b_cols[0], axis=0)
        y = y + jax.ops.segment_sum(
            bprod, b_rows[0], num_segments=R, indices_are_sorted=True,
        )
    y = y.at[R - 1].set(0.0)
    return y[None, :]


def _local_halo_spmm(A: ShardedCsrHalo, blk, x_stacked, axis_name):
    """Multi-vector body: ``x_stacked`` is (1, R, k) locally; the
    halo collective moves (H, k) strips (``exchange_halos`` lets
    trailing axes ride), and the segment-sums run over (E, k)."""
    i_rows, i_cols, i_vals, b_rows, b_cols, b_vals, send_idx = blk
    x = x_stacked[0]                           # (R, k)
    R = A.rows_per_shard

    if A.exchange != "none":
        x_halo = exchange_halos(
            x, send_idx[0], axis_name, exchange=A.exchange,
            num_shards=A.num_shards, max_distance=A.max_distance,
        )

    prod = i_vals[0][:, None] * jnp.take(x, i_cols[0], axis=0)
    y = jax.ops.segment_sum(
        prod, i_rows[0], num_segments=R, indices_are_sorted=True,
    )
    if A.exchange != "none":
        bprod = b_vals[0][:, None] * jnp.take(x_halo, b_cols[0],
                                              axis=0)
        y = y + jax.ops.segment_sum(
            bprod, b_rows[0], num_segments=R, indices_are_sorted=True,
        )
    y = y.at[R - 1].set(0.0)
    return y[None]


def sharded_halo_spmm(
    A: ShardedCsrHalo, X_stacked, mesh: Mesh,
    axis_name: str = AXIS_SHARDS,
):
    """Y = A @ X over the mesh; X/Y in stacked (P, R, k) layout.

    The multi-RHS halo path: one halo exchange moves every column's
    strips together, so collective count stays flat in k — the
    sharded analogue of the single-chip SpMM amortization, and the
    matmat a distributed LOBPCG rides (see make_sharded_halo_matmat).
    """
    spec1 = P(axis_name, None)
    spec2 = P(axis_name, None, None)
    fn = jax.shard_map(
        partial(_local_halo_spmm, A, axis_name=axis_name),
        mesh=mesh,
        in_specs=(
            (
                spec1, spec1, spec1, spec1, spec1, spec1,
                P(axis_name, None, None),
            ),
            spec2,
        ),
        out_specs=spec2,
    )
    blk = (A.i_row_ids, A.i_cols, A.i_vals,
           A.b_row_ids, A.b_cols, A.b_vals, A.send_idx)
    return fn(blk, X_stacked)


def make_sharded_halo_matmat(A: ShardedCsrHalo, mesh: Mesh):
    """Stacked-layout matmat closure ((P, R, k) -> (P, R, k)) for
    block solvers (batched CG, LOBPCG)."""

    def matmat(X_stacked):
        return sharded_halo_spmm(A, X_stacked, mesh)

    return matmat


def stack_block(V: "np.ndarray", sharded, mesh: Mesh = None):
    """Host (num_rows, k) block -> stacked (P, R, k) layout."""
    P_, R = sharded.num_shards, sharded.rows_per_shard
    V = np.asarray(V)
    out = np.zeros((P_, R, V.shape[1]), dtype=V.dtype)
    bounds = np.asarray(sharded.bounds)
    for p in range(P_):
        n = bounds[p + 1] - bounds[p]
        out[p, :n] = V[bounds[p]:bounds[p + 1]]
    arr = jnp.asarray(out)
    if mesh is not None:
        arr = jax.device_put(
            arr, NamedSharding(mesh, P(AXIS_SHARDS, None, None)))
    return arr


def unstack_block(stacked, sharded) -> "np.ndarray":
    """Stacked (P, R, k) -> host (num_rows, k)."""
    stacked = np.asarray(stacked)
    bounds = np.asarray(sharded.bounds)
    out = np.empty((sharded.num_rows, stacked.shape[2]),
                   dtype=stacked.dtype)
    for p in range(sharded.num_shards):
        n = bounds[p + 1] - bounds[p]
        out[bounds[p]:bounds[p + 1]] = stacked[p, :n]
    return out


def sharded_halo_spmv(
    A: ShardedCsrHalo, x_stacked, mesh: Mesh, axis_name: str = AXIS_SHARDS
):
    """y = A @ x over the mesh; vectors in stacked (P, R) layout."""
    spec1 = P(axis_name, None)
    fn = jax.shard_map(
        partial(_local_halo_spmv, A, axis_name=axis_name),
        mesh=mesh,
        in_specs=(
            (
                spec1, spec1, spec1, spec1, spec1, spec1,
                P(axis_name, None, None),
            ),
            spec1,
        ),
        out_specs=spec1,
    )
    blk = (A.i_row_ids, A.i_cols, A.i_vals,
           A.b_row_ids, A.b_cols, A.b_vals, A.send_idx)
    return fn(blk, x_stacked)


def make_sharded_halo_matvec(A: ShardedCsrHalo, mesh: Mesh):
    """Stacked-layout matvec closure for iterative solvers (CG)."""

    def matvec(x_stacked):
        return sharded_halo_spmv(A, x_stacked, mesh)

    return matvec
