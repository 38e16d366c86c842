"""Sharded block-Jacobi preconditioning with local IC(0) solves.

The classic domain-decomposition preconditioner: M = blockdiag(A_pp)
over the row partition, each shard factoring and solving only ITS OWN
diagonal block — zero collectives beyond the solver's existing halo
exchange and psum dots.  This is the solver-layer analogue of the
reference's NUMA-domain locality model
(`/root/reference/src/cache-trace.cpp:156-160`): all preconditioning
work is domain-local by construction.

Each shard's diagonal block A_pp (an SPD matrix whenever A is SPD) is
factored IC(0) on the host; the two triangular solves run inside
``shard_map`` as the same level-scheduled ``lax.scan``
``ops.incomplete.DeviceTriSolve`` uses, with every shard padded to
the common (num_levels, width, max_deps) envelope so the stacked
arrays shard cleanly over the mesh axis.  Apply:
``z = L^-T (L^-1 r)`` per shard, elementwise-independent across
shards.

Iteration-count contract (pinned by tests/test_precond_shard.py): on
an anisotropic Laplacian the block-IC(0) PCG converges in fewer
iterations than diagonal-Jacobi PCG — block solves capture the strong
intra-shard coupling that a diagonal scaling cannot.
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
from spmv_tpu.models.device import default_value_dtype
from spmv_tpu.parallel.mesh import AXIS_SHARDS

__all__ = [
    "ShardedBlockJacobiIC0",
    "block_jacobi_ic0",
    "make_sharded_block_ic0_preconditioner",
    "sharded_block_ic0_apply",
]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["l_rows", "l_dep_cols", "l_dep_vals", "l_diag_inv",
                 "u_rows", "u_dep_cols", "u_dep_vals", "u_diag_inv"],
    meta_fields=["num_shards", "rows_per_shard", "num_levels",
                 "width", "max_deps", "shift_used"],
)
@dataclasses.dataclass(frozen=True)
class ShardedBlockJacobiIC0:
    """Stacked per-shard IC(0) triangular-solve tables.

    All arrays carry a leading shard axis P and the common padded
    envelope (NL, W, E); padded level slots point at the sacrificial
    row R (value 0, diag_inv 1), so every shard runs the identical
    scan.
    """

    num_shards: int
    rows_per_shard: int     # R — matches the stacked vector layout
    num_levels: int         # NL (max over shards)
    width: int              # W
    max_deps: int           # E
    shift_used: float       # Manteuffel shift that made every block factor
    l_rows: jax.Array       # (P, NL, W) int32
    l_dep_cols: jax.Array   # (P, NL, W, E) int32
    l_dep_vals: jax.Array   # (P, NL, W, E)
    l_diag_inv: jax.Array   # (P, NL, W)
    u_rows: jax.Array
    u_dep_cols: jax.Array
    u_dep_vals: jax.Array
    u_diag_inv: jax.Array


def _diag_block(m: CsrMatrix, b0: int, b1: int, R: int) -> CsrMatrix:
    """Rows/cols [b0, b1) of ``m`` as a local (R, R) CSR, padded with
    unit-diagonal rows so every shard block has the same shape."""
    rp = np.asarray(m.row_ptr, np.int64)
    cols = np.asarray(m.column_index, np.int64)
    vals = np.asarray(m.value, np.float64)
    lo, hi = int(rp[b0]), int(rp[b1])
    rows = np.repeat(np.arange(b0, b1, dtype=np.int64),
                     np.diff(rp[b0:b1 + 1])) - b0
    c = cols[lo:hi] - b0
    v = vals[lo:hi]
    keep = (c >= 0) & (c < (b1 - b0))
    rows, c, v = rows[keep], c[keep], v[keep]
    # pad rows [b1-b0, R) with unit diagonal (identity pass-through)
    pad = np.arange(b1 - b0, R, dtype=np.int64)
    rows = np.concatenate([rows, pad])
    c = np.concatenate([c, pad])
    v = np.concatenate([v, np.ones(pad.size)])
    # aggregate duplicates (row-aligned CSRs pad with (col 0, 0.0)
    # entries, csr-matrix.cpp:232-236 — they'd otherwise duplicate
    # block 0's first-column pattern entries)
    key = rows * R + c
    uniq, inv = np.unique(key, return_inverse=True)
    v = np.bincount(inv, weights=v)
    rows, c = uniq // R, uniq % R
    rp_l = np.zeros(R + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows, minlength=R), out=rp_l[1:])
    return CsrMatrix(
        num_rows=R, num_columns=R, num_entries=int(rp_l[-1]),
        row_alignment=1, row_ptr=rp_l,
        column_index=c.astype(np.int32), value=v,
    )


def _tri_arrays(t) -> tuple:
    return (np.asarray(t.rows), np.asarray(t.dep_cols),
            np.asarray(t.dep_vals), np.asarray(t.diag_inv),
            t.num_levels, t.width, t.max_deps)


def _pad_stack(parts, NL, W, E, R):
    """Stack per-shard (nl, w, e)-shaped solve tables into the common
    (P, NL, W, E) envelope (pad rows -> sacrificial slot R)."""
    P_ = len(parts)
    rows = np.full((P_, NL, W), R, dtype=np.int32)
    dc = np.full((P_, NL, W, E), R, dtype=np.int32)
    dv = np.zeros((P_, NL, W, E))
    di = np.ones((P_, NL, W))
    for p, (r, c, v, d, nl, w, e) in enumerate(parts):
        rows[p, :nl, :w] = r
        dc[p, :nl, :w, :e] = c
        dv[p, :nl, :w, :e] = v
        di[p, :nl, :w] = d
    return rows, dc, dv, di


def block_jacobi_ic0(
    m: CsrMatrix,
    bounds,
    rows_per_shard: int,
    dtype=None,
    shifts=(0.0, 0.01, 0.1),
    mesh: Mesh = None,
) -> ShardedBlockJacobiIC0:
    """Factor every shard's diagonal block IC(0).

    ``bounds``/``rows_per_shard`` must come from the sharded operator
    (e.g. ``ShardedCsrHalo.bounds`` / ``.rows_per_shard``) so the
    apply lines up with the stacked vector layout.  A non-SPD-enough
    block escalates through the Manteuffel ``shifts`` ladder — the
    SAME shift is applied to every block (a preconditioner must be
    one fixed operator), so the chosen shift is the smallest that
    factors all blocks.
    """
    from spmv_tpu.ops.incomplete import (
        DeviceTriSolve,
        _transpose_csr,
    )

    dtype = dtype or default_value_dtype()
    bounds = np.asarray(bounds, dtype=np.int64)
    P_ = bounds.size - 1
    R = int(rows_per_shard)
    blocks = [
        _diag_block(m, int(bounds[p]), int(bounds[p + 1]), R)
        for p in range(P_)
    ]
    factors = None
    shift_used = 0.0
    last_err = None
    from spmv_tpu.ops.incomplete import ic0_factor

    for shift in shifts:
        try:
            factors = [ic0_factor(blk, shift=shift) for blk in blocks]
            shift_used = shift
            break
        except MatrixError as e:
            last_err = e
    if factors is None:
        raise MatrixError(
            f"block_jacobi_ic0: no shift in {shifts} factored every "
            f"diagonal block ({last_err})")

    l_parts, u_parts = [], []
    for L in factors:
        tl = DeviceTriSolve.from_host(L, lower=True, dtype=dtype)
        tu = DeviceTriSolve.from_host(_transpose_csr(L), lower=False,
                                      dtype=dtype)
        l_parts.append(_tri_arrays(tl))
        u_parts.append(_tri_arrays(tu))
    NL = max(max(t[4] for t in l_parts), max(t[4] for t in u_parts))
    W = max(max(t[5] for t in l_parts), max(t[5] for t in u_parts))
    E = max(max(t[6] for t in l_parts), max(t[6] for t in u_parts))
    lr, lc, lv, ld = _pad_stack(l_parts, NL, W, E, R)
    ur, uc, uv, ud = _pad_stack(u_parts, NL, W, E, R)

    def dev(a, val=False):
        arr = jnp.asarray(a, dtype=dtype if val else None)
        if mesh is not None:
            spec = P(AXIS_SHARDS, *([None] * (arr.ndim - 1)))
            arr = jax.device_put(arr, NamedSharding(mesh, spec))
        return arr

    return ShardedBlockJacobiIC0(
        num_shards=P_, rows_per_shard=R, num_levels=NL, width=W,
        max_deps=E, shift_used=shift_used,
        l_rows=dev(lr), l_dep_cols=dev(lc), l_dep_vals=dev(lv, True),
        l_diag_inv=dev(ld, True),
        u_rows=dev(ur), u_dep_cols=dev(uc), u_dep_vals=dev(uv, True),
        u_diag_inv=dev(ud, True),
    )


def _tri_scan(b, rows, dc, dv, dinv, R):
    """Level-scheduled triangular solve on the local padded tables
    (the shard_map body of DeviceTriSolve.solve)."""
    bf = b.astype(dv.dtype)
    bp = jnp.concatenate([bf, jnp.zeros((1,), bf.dtype)])
    # derive the carry from bp so it inherits the shard_map varying
    # axis (a plain jnp.zeros carry trips the scan vma check)
    z0 = bp * 0

    def body(z, lvl):
        r, c, v, d = lvl
        acc = (v * z[c]).sum(axis=1)
        zi = (bp[r] - acc) * d
        return z.at[r].set(zi, mode="drop"), None

    z, _ = jax.lax.scan(body, z0, (rows, dc, dv, dinv))
    return z[:R]


def _local_block_ic0(Mb, r_stacked, R):
    (lr, lc, lv, ld, ur, uc, uv, ud) = Mb
    r = r_stacked[0]                         # (R,)
    z = _tri_scan(r, lr[0], lc[0], lv[0], ld[0], R)
    y = _tri_scan(z, ur[0], uc[0], uv[0], ud[0], R)
    return y.astype(r_stacked.dtype)[None, :]


def sharded_block_ic0_apply(
    M: ShardedBlockJacobiIC0, r_stacked, mesh: Mesh,
    axis_name: str = AXIS_SHARDS,
):
    """z = M^-1 r on stacked (P, R) vectors; no collectives."""
    spec3 = P(axis_name, None, None)
    spec4 = P(axis_name, None, None, None)
    fn = jax.shard_map(
        partial(_local_block_ic0, R=M.rows_per_shard),
        mesh=mesh,
        in_specs=(
            (spec3, spec4, spec4, spec3, spec3, spec4, spec4, spec3),
            P(axis_name, None),
        ),
        out_specs=P(axis_name, None),
    )
    Mb = (M.l_rows, M.l_dep_cols, M.l_dep_vals, M.l_diag_inv,
          M.u_rows, M.u_dep_cols, M.u_dep_vals, M.u_diag_inv)
    return fn(Mb, r_stacked)


def make_sharded_block_ic0_preconditioner(
    M: ShardedBlockJacobiIC0, mesh: Mesh,
    axis_name: str = AXIS_SHARDS,
):
    """Preconditioner closure for the stacked-layout PCG."""

    def apply(r_stacked):
        return sharded_block_ic0_apply(M, r_stacked, mesh,
                                       axis_name=axis_name)

    return apply
