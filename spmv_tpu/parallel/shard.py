"""Row-block sharded SpMV via shard_map.

Layout
------
Rows are split into P contiguous blocks (nnz-balanced by default,
replacing the reference's equal-rows split).  Every per-shard quantity
is padded to a uniform size so the sharded arrays are rectangular:

- ``R`` rows per shard: ``roundup(max block rows + 1, 8)`` — the +1
  guarantees a sacrificial overflow slot distinct from any real row;
- ``E`` entries per shard: ``roundup(max block nnz, 1024)``.

Vectors live in the **stacked layout** ``(P, R)``: shard p's rows at
``[p, 0:rows_p]``, zeros elsewhere.  Column indices are remapped at
build time into the stacked index space (global slot ``q*R + (j -
bounds[q])`` for a column j owned by shard q), so that the all-gathered
x can be indexed directly — the padding never has to be stripped on
device.

Compute
-------
``sharded_spmv`` is a shard_map over a 1-D mesh: each shard all-gathers
the stacked x over ICI (the explicit analogue of the reference's
remote-NUMA reads, which it only *simulates* — SURVEY.md section 5
"Distributed communication backend"), then reduces its rows locally by
sorted segment-sum.  Output is row-sharded in the same stacked layout,
so SpMV composes (CG iterates entirely in stacked space, with XLA
inserting psums for the dot products).
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
from spmv_tpu.parallel.mesh import AXIS_SHARDS

__all__ = [
    "ShardedCsr",
    "shard_csr",
    "stack_vector",
    "unstack_vector",
    "sharded_spmv",
    "make_sharded_matvec",
]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["row_ids", "column_index", "value"],
    meta_fields=[
        "num_rows", "num_columns", "num_entries", "num_shards",
        "rows_per_shard", "entries_per_shard", "bounds",
    ],
)
@dataclasses.dataclass(frozen=True)
class ShardedCsr:
    """CSR split into P row blocks, rectangular per-shard arrays.

    ``row_ids`` are *local* (0..rows_per_shard-1; padding entries point
    at the overflow slot rows_per_shard-1 with value 0).
    ``column_index`` is remapped into the stacked x index space.
    ``bounds`` (host tuple, static) are the global row offsets.
    """

    num_rows: int
    num_columns: int
    num_entries: int
    num_shards: int
    rows_per_shard: int      # R
    entries_per_shard: int   # E
    bounds: tuple            # (P+1,) python ints
    row_ids: jax.Array       # (P, E) int32 local row ids
    column_index: jax.Array  # (P, E) int32 stacked-space columns
    value: jax.Array         # (P, E)

    @property
    def stacked_size(self) -> int:
        return self.num_shards * self.rows_per_shard


def shard_csr(
    m: CsrMatrix,
    num_shards: int,
    dtype=None,
    partition: str = "nnz",
    mesh: Mesh = None,
) -> ShardedCsr:
    """Build a ShardedCsr from a host CSR matrix.

    ``partition``: "nnz" (balanced nonzeros, default) or "rows" (the
    reference's equal-rows split, kept for comparison).  Requires a
    square-ish use: the stacked x layout assumes the column space is
    partitioned by the same bounds as the rows (true for the square
    matrices SpMV solvers use).  For rectangular matrices the columns
    are partitioned by an equal split of num_columns.

    When ``mesh`` is given, arrays are device_put with shard-axis
    shardings so each block lands on its device.
    """
    dtype = dtype or default_value_dtype()
    if partition == "nnz":
        bounds = rows_partition_balanced_nnz(m.row_ptr, num_shards)
    elif partition == "rows":
        bounds = rows_partition_equal(m.num_rows, num_shards)
    else:
        raise ValueError(f"unknown partition strategy {partition!r}")

    if m.num_columns != m.num_rows:
        # The stacked x layout reuses the ROW blocks' R slots per
        # shard; an independent column split can overflow them and
        # stack_vector lays x out by row bounds — a correct
        # rectangular sharding needs its own column layout.  Refuse
        # loudly rather than return silently wrong products.
        raise MatrixError(
            "shard_csr supports square matrices only; run rectangular "
            "matrices unsharded (ops.spmv) or extend the column "
            "layout first"
        )
    col_bounds = bounds

    block_rows = np.diff(bounds)
    block_nnz = m.row_ptr[bounds[1:]] - m.row_ptr[bounds[:-1]]
    R = round_up(int(block_rows.max(initial=0)) + 1, 8)
    E = max(round_up(int(block_nnz.max(initial=0)), 1024), 1024)

    row_ids = np.full((num_shards, E), R - 1, dtype=np.int32)
    cols = np.zeros((num_shards, E), dtype=np.int32)
    vals = np.zeros((num_shards, E), dtype=np.float64)

    global_rows = np.repeat(
        np.arange(m.num_rows, dtype=np.int64), np.diff(m.row_ptr)
    )
    # Stacked-space remap of column indices.
    owner = np.searchsorted(col_bounds, m.column_index, side="right") - 1
    stacked_cols = owner * R + (m.column_index - col_bounds[owner])

    for p in range(num_shards):
        lo, hi = int(m.row_ptr[bounds[p]]), int(m.row_ptr[bounds[p + 1]])
        k = hi - lo
        row_ids[p, :k] = global_rows[lo:hi] - bounds[p]
        cols[p, :k] = stacked_cols[lo:hi]
        vals[p, :k] = m.value[lo:hi]

    arrays = dict(
        row_ids=jnp.asarray(row_ids),
        column_index=jnp.asarray(cols),
        value=jnp.asarray(vals, dtype=dtype),
    )
    if mesh is not None:
        sharding = NamedSharding(mesh, P(AXIS_SHARDS, None))
        arrays = {
            k: jax.device_put(v, sharding) for k, v in arrays.items()
        }

    return ShardedCsr(
        num_rows=m.num_rows,
        num_columns=m.num_columns,
        num_entries=m.num_entries,
        num_shards=num_shards,
        rows_per_shard=R,
        entries_per_shard=E,
        bounds=tuple(int(b) for b in bounds),
        **arrays,
    )


def stack_vector(
    v: np.ndarray, sharded: ShardedCsr, mesh: Mesh = None
) -> jax.Array:
    """Host vector (num_rows,) -> stacked (P, R) layout."""
    P_, R = sharded.num_shards, sharded.rows_per_shard
    bounds = np.asarray(sharded.bounds)
    out = np.zeros((P_, R), dtype=np.asarray(v).dtype)
    for p in range(P_):
        n = bounds[p + 1] - bounds[p]
        out[p, :n] = v[bounds[p]:bounds[p + 1]]
    arr = jnp.asarray(out, dtype=sharded.value.dtype)
    if mesh is not None:
        arr = jax.device_put(
            arr, NamedSharding(mesh, P(AXIS_SHARDS, None))
        )
    return arr


def unstack_vector(stacked, sharded: ShardedCsr) -> np.ndarray:
    """Stacked (P, R) layout -> host vector (num_rows,)."""
    stacked = np.asarray(stacked)
    bounds = np.asarray(sharded.bounds)
    out = np.empty(sharded.num_rows, dtype=stacked.dtype)
    for p in range(sharded.num_shards):
        n = bounds[p + 1] - bounds[p]
        out[bounds[p]:bounds[p + 1]] = stacked[p, :n]
    return out


def _local_spmv(A: ShardedCsr, x_stacked, axis_name: str):
    """Per-shard body: all-gather x over ICI, reduce rows locally."""
    # x_stacked block: (1, R).  All-gather -> (P, 1, R) -> flat stacked x.
    x_full = jax.lax.all_gather(x_stacked[0], axis_name)
    x_flat = x_full.reshape(-1)
    prod = A.value[0] * jnp.take(x_flat, A.column_index[0], axis=0)
    y = jax.ops.segment_sum(
        prod,
        A.row_ids[0],
        num_segments=A.rows_per_shard,
        indices_are_sorted=True,
    )
    # Zero the overflow slot so stacked vectors stay clean for dots.
    y = y.at[A.rows_per_shard - 1].set(0.0)
    return y[None, :]


def sharded_spmv(
    A: ShardedCsr, x_stacked: jax.Array, mesh: Mesh,
    axis_name: str = AXIS_SHARDS,
) -> jax.Array:
    """y = A @ x over the mesh; both vectors in stacked (P, R) layout."""
    fn = jax.shard_map(
        partial(_local_spmv, axis_name=axis_name),
        mesh=mesh,
        in_specs=(
            ShardedCsr(
                # meta fields are static; specs only needed for arrays
                **{f.name: getattr(A, f.name) for f in dataclasses.fields(A)
                   if f.name not in ("row_ids", "column_index", "value")},
                row_ids=P(axis_name, None),
                column_index=P(axis_name, None),
                value=P(axis_name, None),
            ),
            P(axis_name, None),
        ),
        out_specs=P(axis_name, None),
    )
    return fn(A, x_stacked)


def make_sharded_matvec(A: ShardedCsr, mesh: Mesh):
    """A jittable closure y = A @ x in stacked layout (for solvers)."""

    def matvec(x_stacked):
        return sharded_spmv(A, x_stacked, mesh)

    return matvec
