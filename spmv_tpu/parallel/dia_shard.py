"""Row-block sharded DIA SpMV with nearest-neighbor halo exchange.

The scalable multi-chip design for banded/stencil matrices — and the
component the reference lacks entirely (its "distribution" is a NUMA
miss-matrix *model*, SURVEY.md §5 "Distributed communication backend").
Where the sharded CSR path all-gathers x (spmv_tpu.parallel.shard),
a banded matrix only ever reads x within ``max|offset|`` of its own
rows, so each shard exchanges just two halo strips with its mesh
neighbors via ``lax.ppermute`` — O(halo) bytes over ICI instead of
O(n), independent of shard count:

    shard p:  [left halo from p-1 | own x block | right halo from p+1]
    y_p = sum_k data_p[k] * x_ext[H + off_k : H + off_k + Rb]

Boundary shards receive exact zeros from ppermute (destinations with
no listed source), which is correct because out-of-range diagonal
slots are stored as zeros by construction (models.dia).

Vectors live in the stacked layout ``(P, Rb)``; CG iterates entirely
in stacked space with XLA inserting psums for the dot products — see
``make_sharded_dia_matvec``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from spmv_tpu.errors import MatrixError
from spmv_tpu.models.device import default_value_dtype, round_up, LANE
from spmv_tpu.models.dia import DiaMatrix
from spmv_tpu.parallel.mesh import AXIS_SHARDS

__all__ = [
    "ShardedDia",
    "shard_dia",
    "sharded_dia_spmv",
    "make_sharded_dia_matvec",
    "stack_dia_vector",
    "unstack_dia_vector",
]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data"],
    meta_fields=["num_rows", "num_columns", "num_entries", "offsets",
                 "num_shards", "rows_per_shard", "halo"],
)
@dataclasses.dataclass(frozen=True)
class ShardedDia:
    num_rows: int
    num_columns: int
    num_entries: int
    offsets: tuple           # static
    num_shards: int          # P
    rows_per_shard: int      # Rb (padded, multiple of LANE)
    halo: int                # H = max |offset|, <= Rb
    data: jax.Array          # (P, D, Rb)

    @property
    def stacked_size(self) -> int:
        return self.num_shards * self.rows_per_shard


def shard_dia(
    A: DiaMatrix, num_shards: int, dtype=None
) -> ShardedDia:
    """Split a square DIA matrix into P contiguous row blocks.

    DIA stores one slot per (diagonal, row), so equal-rows blocks ARE
    nnz-balanced — the degenerate happy case of the nnz-balanced
    partitioner used for CSR (models.partition).
    """
    if A.num_rows != A.num_columns:
        raise MatrixError(
            "sharded DIA requires a square matrix (x and y share the "
            "row partition)"
        )
    dtype = dtype or default_value_dtype()
    p = int(num_shards)
    offsets = tuple(int(o) for o in A.offsets)
    halo = max((abs(o) for o in offsets), default=0)
    rb = round_up(-(-A.num_rows // p), LANE)
    if halo > rb:
        raise MatrixError(
            f"halo {halo} exceeds rows per shard {rb}; use fewer "
            "shards or reorder to reduce bandwidth"
        )
    d = A.offsets.size
    data = np.zeros((p, d, rb), dtype=np.float64)
    flat = A.data  # (D, num_rows)
    for q in range(p):
        r0 = q * rb
        r1 = min(r0 + rb, A.num_rows)
        if r1 > r0:
            data[q, :, : r1 - r0] = flat[:, r0:r1]
    return ShardedDia(
        num_rows=A.num_rows,
        num_columns=A.num_columns,
        num_entries=A.num_entries,
        offsets=offsets,
        num_shards=p,
        rows_per_shard=rb,
        halo=halo,
        data=jnp.asarray(data, dtype=dtype),
    )


def stack_dia_vector(x, A: ShardedDia) -> jax.Array:
    """Length-num_rows vector -> stacked (P, Rb) layout."""
    x = jnp.asarray(x)
    pad = A.stacked_size - x.shape[0]
    return jnp.pad(x, (0, pad)).reshape(A.num_shards, A.rows_per_shard)


def unstack_dia_vector(stacked, A: ShardedDia) -> np.ndarray:
    return np.asarray(stacked).reshape(-1)[: A.num_rows]


def _local_dia_spmv(data_blk, x_blk, *, offsets, halo, rows_per_shard,
                    num_shards, axis_name):
    """Per-shard body (runs inside shard_map): halo exchange
    OVERLAPPED with the interior compute.

    The interior pass uses only the shard's own x (halos as zeros), so
    it has no data dependency on the ppermute — XLA schedules the ICI
    transfer concurrently with the bulk FMA stream.  The received
    halos then contribute only the O(halo) boundary corrections:
    rows [0, h) read the left halo through negative offsets, rows
    [rb-h, rb) read the right halo through positive offsets.
    """
    h, rb, p = halo, rows_per_shard, num_shards
    x = x_blk[0]                # (Rb,)
    d = data_blk[0]             # (D, Rb)

    if h > 0 and p > 1:
        # left halo: shard q receives the LAST h entries of shard q-1
        left = jax.lax.ppermute(
            x[rb - h:], axis_name,
            perm=[(q, q + 1) for q in range(p - 1)],
        )
        # right halo: shard q receives the FIRST h entries of shard q+1
        right = jax.lax.ppermute(
            x[:h], axis_name,
            perm=[(q + 1, q) for q in range(p - 1)],
        )
    else:
        left = jnp.zeros((h,), x.dtype)
        right = jnp.zeros((h,), x.dtype)

    # Interior pass: own x, zero halos — independent of the ppermutes.
    zeros_h = jnp.zeros((h,), x.dtype)
    xz = jnp.concatenate([zeros_h, x, zeros_h])
    y = jnp.zeros((rb,), dtype=d.dtype)
    for k, off in enumerate(offsets):
        y = y + d[k] * jax.lax.dynamic_slice(xz, (h + off,), (rb,))

    if h > 0 and p > 1:
        # Boundary corrections: the slice h+off of the halo-extended
        # vector differs from the zero-extended one only in its first
        # (for off < 0) or last (for off > 0) max(h) entries.
        xe = jnp.concatenate([left, jnp.zeros((rb,), x.dtype), right])
        top = jnp.zeros((h,), dtype=d.dtype)
        bot = jnp.zeros((h,), dtype=d.dtype)
        for k, off in enumerate(offsets):
            if off < 0:
                win = jax.lax.dynamic_slice(xe, (h + off,), (h,))
                top = top + d[k][:h] * win
            elif off > 0:
                win = jax.lax.dynamic_slice(xe, (rb + off,), (h,))
                bot = bot + d[k][rb - h:] * win
        y = y.at[:h].add(top)
        y = y.at[rb - h:].add(bot)
    return y[None, :]


def _local_dia_spmm(data_blk, x_blk, *, offsets, halo, rows_per_shard,
                    num_shards, axis_name):
    """Multi-RHS per-shard body: x_blk is (1, k, Rb) — the same
    nearest-neighbor halo exchange and shifted-slice passes as
    :func:`_local_dia_spmv`, with every slice broadcasting over the
    k RHS columns, so the halo traffic and diagonal stream amortize
    over the block exactly like the on-chip SpMM kernels."""
    h, rb, p = halo, rows_per_shard, num_shards
    X = x_blk[0]                # (k, Rb)
    d = data_blk[0]             # (D, Rb)
    nk = X.shape[0]

    if h > 0 and p > 1:
        left = jax.lax.ppermute(
            X[:, rb - h:], axis_name,
            perm=[(q, q + 1) for q in range(p - 1)],
        )
        right = jax.lax.ppermute(
            X[:, :h], axis_name,
            perm=[(q + 1, q) for q in range(p - 1)],
        )
    else:
        left = jnp.zeros((nk, h), X.dtype)
        right = jnp.zeros((nk, h), X.dtype)

    zeros_h = jnp.zeros((nk, h), X.dtype)
    xz = jnp.concatenate([zeros_h, X, zeros_h], axis=1)
    Y = jnp.zeros((nk, rb), dtype=d.dtype)
    for i, off in enumerate(offsets):
        win = jax.lax.dynamic_slice(xz, (0, h + off), (nk, rb))
        Y = Y + d[i][None, :] * win

    if h > 0 and p > 1:
        xe = jnp.concatenate(
            [left, jnp.zeros((nk, rb), X.dtype), right], axis=1)
        top = jnp.zeros((nk, h), dtype=d.dtype)
        bot = jnp.zeros((nk, h), dtype=d.dtype)
        for i, off in enumerate(offsets):
            if off < 0:
                win = jax.lax.dynamic_slice(xe, (0, h + off), (nk, h))
                top = top + d[i][None, :h] * win
            elif off > 0:
                win = jax.lax.dynamic_slice(xe, (0, rb + off), (nk, h))
                bot = bot + d[i][None, rb - h:] * win
        Y = Y.at[:, :h].add(top)
        Y = Y.at[:, rb - h:].add(bot)
    return Y[None]


def stack_dia_matrix(X, A: ShardedDia) -> jax.Array:
    """(num_rows, k) multi-vector -> stacked (P, k, Rb) layout."""
    X = jnp.asarray(X)
    pad = A.stacked_size - X.shape[0]
    return jnp.pad(X, ((0, pad), (0, 0))).T.reshape(
        X.shape[1], A.num_shards, A.rows_per_shard).transpose(1, 0, 2)


def unstack_dia_matrix(stacked, A: ShardedDia) -> np.ndarray:
    s = np.asarray(stacked)           # (P, k, Rb)
    return s.transpose(1, 0, 2).reshape(
        s.shape[1], -1).T[: A.num_rows]


def sharded_dia_spmm(
    A: ShardedDia, x_stacked, mesh: Mesh, axis_name: str = AXIS_SHARDS
):
    """Y = A @ X in the stacked (P, k, Rb) layout."""
    spec = P(axis_name, None, None)
    f = jax.shard_map(
        partial(
            _local_dia_spmm,
            offsets=A.offsets,
            halo=A.halo,
            rows_per_shard=A.rows_per_shard,
            num_shards=A.num_shards,
            axis_name=axis_name,
        ),
        mesh=mesh,
        in_specs=(P(axis_name, None, None), spec),
        out_specs=spec,
    )
    return f(A.data, x_stacked)


def make_sharded_dia_matmat(A: ShardedDia, mesh: Mesh):
    """Stacked-layout multi-RHS matmat closure: plugs into
    ``batched_conjugate_gradient`` (columns on axis 1 of the stacked
    (P, k, Rb) layout reduce/broadcast correctly — its column
    reductions sum over all axes but 1)."""

    def matmat(x_stacked):
        return sharded_dia_spmm(A, x_stacked, mesh)

    return matmat


def sharded_dia_spmv(
    A: ShardedDia, x_stacked, mesh: Mesh, axis_name: str = AXIS_SHARDS
):
    """y_stacked = A @ x in the stacked (P, Rb) layout."""
    spec = P(axis_name, None)
    f = jax.shard_map(
        partial(
            _local_dia_spmv,
            offsets=A.offsets,
            halo=A.halo,
            rows_per_shard=A.rows_per_shard,
            num_shards=A.num_shards,
            axis_name=axis_name,
        ),
        mesh=mesh,
        in_specs=(P(axis_name, None, None), spec),
        out_specs=spec,
    )
    return f(A.data, x_stacked)


def make_sharded_dia_matvec(A: ShardedDia, mesh: Mesh):
    """Stacked-layout matvec closure for iterative solvers (CG)."""

    def matvec(x_stacked):
        return sharded_dia_spmv(A, x_stacked, mesh)

    return matvec
