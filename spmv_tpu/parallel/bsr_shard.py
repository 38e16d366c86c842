"""Halo-exchange sharded BSR — block-granular halos for the MXU format.

Completes the format x multi-device matrix (CSR / DIA / WELL / WELL-CW
already shard): BSR is the SpMM-heavy format (models.bsr, MXU dense
(block_rows, 128) blocks), so its halo unit is a whole 128-column x
block rather than a scalar — each remote reference moves 128*k values.
The reference prices remote traffic for every format it ships
(csr-matrix.cpp:132-136, ell-matrix.cpp:102-143); this is the same
capability for the block format, with the exchange actually executed
(ppermute strips / all_to_all) instead of modeled.

Design:

- Block rows are partitioned equally in groups that keep each shard's
  row count a multiple of 128 (``lcm(block_rows, 128)`` granularity),
  so x and y share one element partition and each 128-column x block
  is wholly owned by one shard.
- Needs lists are *block-column* indices; ``build_exchange_schedule``
  (halo_shard) is reused unchanged with block-unit positions, and the
  collective moves (strips, H, 128[, k]) tiles — ``exchange_halos``
  carries trailing dims.
- The local step is the XLA BSR SpMM formulation (ops.spmv.spmm):
  batched (bh, 128) @ (128, k) MXU matmuls + a block-row segment sum,
  split into interior (local x3d) and boundary (halo tiles).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spmv_tpu.errors import MatrixError
from spmv_tpu.models.bsr import BLOCK, BsrMatrix
from spmv_tpu.models.device import default_value_dtype, round_up
from spmv_tpu.parallel.halo_shard import (
    SLOT_PAD,
    build_exchange_schedule,
    exchange_halos,
)
from spmv_tpu.parallel.mesh import AXIS_SHARDS

__all__ = [
    "ShardedBsrHalo",
    "shard_bsr_halo",
    "sharded_bsr_spmm",
    "sharded_bsr_spmv",
    "make_sharded_bsr_matvec",
    "stack_columns",
    "unstack_rows",
]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["i_blocks", "i_col", "i_brow",
                 "b_blocks", "b_col", "b_brow", "send_idx"],
    meta_fields=["num_rows", "num_columns", "num_entries", "num_shards",
                 "block_rows", "block_rows_per_shard", "rows_per_shard",
                 "col_blocks_per_shard", "interior_per_shard",
                 "boundary_per_shard", "halo_slots", "exchange",
                 "max_distance", "comm_blocks_exact",
                 "comm_elements_exact", "comm_elements_padded"],
)
@dataclasses.dataclass(frozen=True)
class ShardedBsrHalo:
    """BSR split into P block-row bands with a static block-halo plan.

    Stacked leading-P arrays; ``i_*`` are interior blocks (x block-col
    inside the shard's own range, remapped local), ``b_*`` boundary
    blocks (block-col remapped to halo-tile slots).  Zero padding
    blocks are mathematically inert (their products are zero).
    """

    num_rows: int
    num_columns: int
    num_entries: int
    num_shards: int
    block_rows: int            # bh: block height
    block_rows_per_shard: int  # RB
    rows_per_shard: int        # S = RB * bh (multiple of 128)
    col_blocks_per_shard: int  # CB = S // 128
    interior_per_shard: int
    boundary_per_shard: int
    halo_slots: int            # H, in block units
    exchange: str
    max_distance: int
    comm_blocks_exact: int
    comm_elements_exact: int   # blocks * 128
    comm_elements_padded: int
    i_blocks: jax.Array        # (P, NI, bh, 128)
    i_col: jax.Array           # (P, NI) int32, local block-col
    i_brow: jax.Array          # (P, NI) int32, local block-row
    b_blocks: jax.Array        # (P, NBd, bh, 128)
    b_col: jax.Array           # (P, NBd) int32, halo tile slot
    b_brow: jax.Array          # (P, NBd) int32
    send_idx: jax.Array        # (P, strips, H) int32 block units

    @property
    def bounds(self):
        S = self.rows_per_shard
        return tuple(q * S for q in range(self.num_shards + 1))


def shard_bsr_halo(
    m: BsrMatrix,
    num_shards: int,
    dtype=None,
    mesh: Mesh = None,
    exchange: str = "auto",
    neighbor_max_distance: int = 3,
) -> ShardedBsrHalo:
    """Build the block-halo sharding of a square host BSR matrix."""
    if m.num_rows != m.num_columns:
        raise MatrixError(
            "halo-sharded BSR requires a square matrix (x and y share "
            "the row partition)"
        )
    dtype = dtype or default_value_dtype()
    p = int(num_shards)
    bh = int(m.block_rows)
    nbr = int(m.num_block_rows)

    # Per-shard block-row count: equal split, rounded up so each
    # shard's element count RB*bh is a multiple of 128.
    g = math.lcm(bh, BLOCK) // bh
    RB = round_up(max(-(-nbr // p), 1), g)
    S = RB * bh
    CB = S // BLOCK
    if p * CB * BLOCK < m.num_columns:
        # (cannot happen for square matrices: p*RB*bh >= nbr*bh >= rows)
        raise MatrixError("BSR shard bounds do not cover the columns")

    brow_all = np.repeat(
        np.arange(nbr, dtype=np.int64), np.diff(m.block_rowptr)
    )
    bcol_all = np.asarray(m.block_col, dtype=np.int64)
    owner = bcol_all // CB

    col_bounds = np.arange(p + 1, dtype=np.int64) * CB
    needs, i_loc, b_loc = [], [], []
    for q in range(p):
        lo = int(m.block_rowptr[min(q * RB, nbr)])
        hi = int(m.block_rowptr[min((q + 1) * RB, nbr)])
        rows_q = (brow_all[lo:hi] - q * RB).astype(np.int32)
        cols_q = bcol_all[lo:hi]
        local = owner[lo:hi] == q
        i_loc.append((rows_q[local],
                      (cols_q[local] - q * CB).astype(np.int32),
                      np.arange(lo, hi)[local]))
        b_loc.append((rows_q[~local], cols_q[~local],
                      np.arange(lo, hi)[~local]))
        needs.append(np.unique(cols_q[~local]))

    sched = build_exchange_schedule(
        needs, col_bounds, exchange=exchange,
        neighbor_max_distance=neighbor_max_distance,
    )

    NI = max(round_up(max(a[0].size for a in i_loc), SLOT_PAD), SLOT_PAD)
    NB = max(round_up(max(a[0].size for a in b_loc), SLOT_PAD), SLOT_PAD)

    i_blocks = np.zeros((p, NI, bh, BLOCK), dtype=np.float64)
    i_col = np.zeros((p, NI), dtype=np.int32)
    i_brow = np.full((p, NI), RB - 1, dtype=np.int32)
    b_blocks = np.zeros((p, NB, bh, BLOCK), dtype=np.float64)
    b_col = np.zeros((p, NB), dtype=np.int32)
    b_brow = np.full((p, NB), RB - 1, dtype=np.int32)
    for q in range(p):
        rows_q, cols_q, sel = i_loc[q]
        k = rows_q.size
        i_blocks[q, :k] = m.blocks[sel]
        i_col[q, :k] = cols_q
        i_brow[q, :k] = rows_q
        rows_q, cols_q, sel = b_loc[q]
        k = rows_q.size
        b_blocks[q, :k] = m.blocks[sel]
        if k:
            b_col[q, :k] = sched.remap(q, cols_q).astype(np.int32)
        b_brow[q, :k] = rows_q

    arrays = dict(
        i_blocks=jnp.asarray(i_blocks, dtype=dtype),
        i_col=jnp.asarray(i_col),
        i_brow=jnp.asarray(i_brow),
        b_blocks=jnp.asarray(b_blocks, dtype=dtype),
        b_col=jnp.asarray(b_col),
        b_brow=jnp.asarray(b_brow),
        send_idx=jnp.asarray(sched.send_idx),
    )
    if mesh is not None:
        for k_, v in arrays.items():
            spec = P(AXIS_SHARDS, *([None] * (v.ndim - 1)))
            arrays[k_] = jax.device_put(v, NamedSharding(mesh, spec))

    return ShardedBsrHalo(
        num_rows=m.num_rows,
        num_columns=m.num_columns,
        num_entries=m.num_entries,
        num_shards=p,
        block_rows=bh,
        block_rows_per_shard=RB,
        rows_per_shard=S,
        col_blocks_per_shard=CB,
        interior_per_shard=NI,
        boundary_per_shard=NB,
        halo_slots=sched.halo_slots,
        exchange=sched.exchange,
        max_distance=sched.max_distance,
        comm_blocks_exact=sched.comm_elements_exact,
        comm_elements_exact=sched.comm_elements_exact * BLOCK,
        comm_elements_padded=sched.comm_elements_padded * BLOCK,
        **arrays,
    )


def stack_columns(X: np.ndarray, A: ShardedBsrHalo, mesh: Mesh = None):
    """Host (num_columns, k) -> stacked (P, S, k) layout."""
    X = np.asarray(X)
    if X.ndim == 1:
        X = X[:, None]
    k = X.shape[1]
    out = np.zeros((A.num_shards, A.rows_per_shard, k), dtype=X.dtype)
    flatlen = min(A.num_columns, A.num_shards * A.rows_per_shard)
    out.reshape(-1, k)[:flatlen] = X[:flatlen]
    arr = jnp.asarray(out, dtype=A.i_blocks.dtype)
    if mesh is not None:
        arr = jax.device_put(
            arr, NamedSharding(mesh, P(AXIS_SHARDS, None, None))
        )
    return arr


def unstack_rows(stacked, A: ShardedBsrHalo) -> np.ndarray:
    """Stacked (P, S, k) -> host (num_rows, k)."""
    return np.asarray(stacked).reshape(
        -1, np.asarray(stacked).shape[-1]
    )[: A.num_rows]


def _local_bsr_spmm(A: ShardedBsrHalo, blk, x_stacked, axis_name):
    i_blocks, i_col, i_brow, b_blocks, b_col, b_brow, send_idx = blk
    X = x_stacked[0]                         # (S, k)
    k = X.shape[1]
    x3d = X.reshape(A.col_blocks_per_shard, BLOCK, k)

    if A.exchange != "none":
        halo = exchange_halos(
            x3d, send_idx[0], axis_name, exchange=A.exchange,
            num_shards=A.num_shards, max_distance=A.max_distance,
        )                                    # (n_strips*H, BLOCK, k)

    gi = jnp.take(x3d, i_col[0], axis=0)     # (NI, BLOCK, k)
    prods = jnp.einsum(
        "brc,bck->brk", i_blocks[0], gi,
        preferred_element_type=i_blocks.dtype,
    )
    y = jax.ops.segment_sum(
        prods, i_brow[0],
        num_segments=A.block_rows_per_shard,
        indices_are_sorted=True,
    )
    if A.exchange != "none":
        gb = jnp.take(halo, b_col[0], axis=0)
        bprods = jnp.einsum(
            "brc,bck->brk", b_blocks[0], gb,
            preferred_element_type=b_blocks.dtype,
        )
        y = y + jax.ops.segment_sum(
            bprods, b_brow[0],
            num_segments=A.block_rows_per_shard,
            indices_are_sorted=True,
        )
    return y.reshape(A.rows_per_shard, k)[None]


def sharded_bsr_spmm(
    A: ShardedBsrHalo, X_stacked, mesh: Mesh,
    axis_name: str = AXIS_SHARDS,
):
    """Y = A @ X over the mesh; operands in stacked (P, S, k) layout."""
    spec = P(axis_name, *([None] * 3))
    spec2 = P(axis_name, None)
    fn = jax.shard_map(
        partial(_local_bsr_spmm, A, axis_name=axis_name),
        mesh=mesh,
        in_specs=(
            (spec, spec2, spec2, spec, spec2, spec2,
             P(axis_name, None, None)),
            P(axis_name, None, None),
        ),
        out_specs=P(axis_name, None, None),
    )
    blk = (A.i_blocks, A.i_col, A.i_brow,
           A.b_blocks, A.b_col, A.b_brow, A.send_idx)
    return fn(blk, X_stacked)


def sharded_bsr_spmv(A: ShardedBsrHalo, x_stacked, mesh: Mesh,
                     axis_name: str = AXIS_SHARDS):
    """y = A @ x; x stacked as (P, S) or (P, S, 1)."""
    if x_stacked.ndim == 2:
        return sharded_bsr_spmm(
            A, x_stacked[..., None], mesh, axis_name)[..., 0]
    return sharded_bsr_spmm(A, x_stacked, mesh, axis_name)


def make_sharded_bsr_matvec(A: ShardedBsrHalo, mesh: Mesh):
    """Stacked-layout matvec closure for iterative solvers (CG)."""

    def matvec(x_stacked):
        return sharded_bsr_spmv(A, x_stacked, mesh)

    return matvec
