"""Incomplete factorizations + level-scheduled triangular solves.

IC(0) / ILU(0) preconditioning for the CG/BiCGSTAB solver layer.  The
reference has no solver layer at all; this module exists because SpMV
frameworks are judged by the iterative methods they can feed, and the
classic preconditioners need sparse *triangular solves* — the most
TPU-hostile kernel there is (a sequential dependence chain per row).

Rows group into dependency levels (row i's level is one past the max
level of the rows it reads); three solve designs ship, measured
against each other on the chip (probes 51/51b,
experiments/RESULTS.md):

1. **BlockTriSolve** — the production path.  When levels are
   contiguous row ranges (multicolor ordering numbers rows
   color-major, ``models.reorder.find_new_order_coloring``), each
   level is one static slice update plus one rectangular sparse
   matvec through the framework's fast formats (DIA shifted slices
   when the dep block is band-like).  Measured 3.5 us per M^-1 apply
   on 262k rows — cheaper than the SpMV it preconditions.
2. **DeviceTriSolve** — a ``lax.scan`` over levels padded into dense
   (width, max_deps) tiles; works for any ordering but is bound by
   XLA 1-D scatter/gather at ~17 ns/element (22-36 ms on the same
   matrix), so it is the *fallback*, not the fast path.
3. **tri_solve_sweeps** — Jacobi-iteration approximation
   (z_{k+1} = D^-1 (b - (T - D) z_k)), exact after ``num_levels``
   sweeps; same scatter bound, kept for orderings with degenerate
   levels where a few sweeps substitute for an exact solve.

``ic0_preconditioner`` / ``ilu0_preconditioner`` default to
method="auto": blocks when the ordering allows, the scan otherwise.

Host factorizations are numpy row loops (the factorization happens
once per matrix; the solves happen once per CG iteration — only the
latter is device-critical).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.errors import MatrixError
from spmv_tpu.models.csr import CsrMatrix

__all__ = [
    "ic0_factor",
    "ilu0_factor",
    "build_level_schedule",
    "DeviceTriSolve",
    "BlockTriSolve",
    "tri_solve_sweeps",
    "ic0_preconditioner",
    "ilu0_preconditioner",
]


# ------------------------------------------------------------------ host

def _csr_arrays(m: CsrMatrix):
    """Unpadded (row_ptr, cols, vals) views of a host CSR matrix."""
    if int(m.row_ptr[-1]) != m.num_entries:
        # alignment-padding entries would pollute the factor's pattern
        raise MatrixError(
            "incomplete factorization requires an unpadded CSR "
            "(row_alignment=1)"
        )
    return (np.asarray(m.row_ptr, np.int64),
            np.asarray(m.column_index, np.int64),
            np.asarray(m.value, np.float64))


def ic0_factor(m: CsrMatrix, shift: float = 0.0,
               native: bool = True) -> CsrMatrix:
    """IC(0): lower-triangular L on lower(A)'s pattern, L L^T ~= A.

    Row-by-row left-looking update restricted to the pattern.  A
    non-positive pivot (A not SPD enough for the incomplete pattern)
    raises unless ``shift`` > 0 is supplied, in which case the
    factorization runs on A + shift*diag(A) (Manteuffel shift).

    ``native``: run the numeric update through csrc/ic0.cpp when the
    library is available (~100x the Python loop; identical output —
    the lockstep test pins it); pass False to force the Python path.
    """
    if m.num_rows != m.num_columns:
        raise MatrixError("ic0 requires a square matrix")
    rp, cols, vals = _csr_arrays(m)
    n = m.num_rows

    # sorted lower pattern (incl. diagonal), fully vectorized
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(rp))
    order = np.lexsort((cols, rows))
    rs, cs, vs = rows[order], cols[order], vals[order]
    low = cs <= rs
    rs, lcols, lvals = rs[low], cs[low], \
        np.ascontiguousarray(vs[low], np.float64)
    is_diag = lcols == rs
    if int(is_diag.sum()) != n:
        bad = int(np.setdiff1d(
            np.arange(n), rs[is_diag], assume_unique=False)[0])
        raise MatrixError(f"ic0: row {bad} has no diagonal entry")
    if shift:
        lvals[is_diag] *= 1.0 + shift
    lrp = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(rs, minlength=n), out=lrp[1:])

    from spmv_tpu.ops import _ic_native

    if native and _ic_native.available():
        code = _ic_native.ic0_inplace(lrp, lcols, lvals)
        if code:
            raise MatrixError(
                f"ic0: non-positive pivot at row {code - 1}; "
                "retry with a Manteuffel shift (shift=0.01 .. 0.1)"
            )
    else:
        for i in range(n):
            s, e = lrp[i], lrp[i + 1]
            ci = lcols[s:e]
            # off-diagonal entries first
            for t in range(e - s - 1):
                j = ci[t]
                sj, ej = lrp[j], lrp[j + 1]
                # dot of L[i, :j] and L[j, :j] over the pattern
                # intersection (both column-sorted)
                acc = _sorted_dot(
                    lcols[s:s + t], lvals[s:s + t],
                    lcols[sj:ej - 1], lvals[sj:ej - 1],
                )
                dj = lvals[ej - 1]
                lvals[s + t] = (lvals[s + t] - acc) / dj
            # diagonal
            off = lvals[s:e - 1]
            pivot = lvals[e - 1] - float(off @ off)
            if pivot <= 0.0:
                raise MatrixError(
                    f"ic0: non-positive pivot {pivot:.3e} at row {i}; "
                    "retry with a Manteuffel shift (shift=0.01 .. 0.1)"
                )
            lvals[e - 1] = np.sqrt(pivot)

    return CsrMatrix(
        num_rows=n, num_columns=n, num_entries=int(lrp[-1]),
        row_alignment=1, row_ptr=lrp,
        column_index=lcols.astype(np.int32), value=lvals,
    )


def _sorted_dot(c1, v1, c2, v2) -> float:
    """Dot product of two sparse rows given sorted column indices."""
    if c1.size == 0 or c2.size == 0:
        return 0.0
    i1 = np.searchsorted(c2, c1)
    ok = i1 < c2.size
    match = np.zeros(c1.size, dtype=bool)
    match[ok] = c2[i1[ok]] == c1[ok]
    if not match.any():
        return 0.0
    return float(v1[match] @ v2[i1[match]])


def ilu0_factor(m: CsrMatrix, native: bool = True) -> tuple:
    """ILU(0): (L_unit, U) on A's pattern, L U ~= A.

    IKJ-variant Gaussian elimination restricted to the pattern
    (Saad, Iterative Methods, alg. 10.4).  L has unit diagonal
    (stored without it); U holds the diagonal.  ``native`` as in
    :func:`ic0_factor`.
    """
    if m.num_rows != m.num_columns:
        raise MatrixError("ilu0 requires a square matrix")
    rp, cols, vals = _csr_arrays(m)
    n = m.num_rows

    # column-sorted copy + flat (i, i) slot lookup, fully vectorized
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(rp))
    order = np.lexsort((cols, rows))
    rs = rows[order]
    a_cols = cols[order]
    a_vals = vals[order].copy()
    a_rp = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(rs, minlength=n), out=a_rp[1:])

    is_diag = a_cols == rs
    if int(is_diag.sum()) != n:
        bad = int(np.setdiff1d(np.arange(n), rs[is_diag])[0])
        raise MatrixError(f"ilu0: row {bad} has no diagonal entry")
    diag_slot = np.nonzero(is_diag)[0].astype(np.int64)

    from spmv_tpu.ops import _ic_native

    a_vals = np.ascontiguousarray(a_vals, np.float64)
    if native and _ic_native.available():
        code = _ic_native.ilu0_inplace(a_rp, a_cols, a_vals, diag_slot)
        if code:
            raise MatrixError(f"ilu0: zero pivot at row {code - 1}")
    else:
        for i in range(1, n):
            s, e = a_rp[i], a_rp[i + 1]
            ci = a_cols[s:e]
            for t in range(e - s):
                k = ci[t]
                if k >= i:
                    break
                piv = a_vals[diag_slot[k]]
                if piv == 0.0:
                    raise MatrixError(f"ilu0: zero pivot at row {k}")
                lik = a_vals[s + t] / piv
                a_vals[s + t] = lik
                # subtract lik * U[k, j] for j > k in row i's pattern
                ks, ke = diag_slot[k] + 1, a_rp[k + 1]
                if ks < ke:
                    cj = a_cols[ks:ke]
                    pos = np.searchsorted(ci, cj)
                    ok = pos < ci.size
                    okm = np.zeros(cj.size, dtype=bool)
                    okm[ok] = ci[pos[ok]] == cj[ok]
                    a_vals[s + pos[okm]] -= lik * a_vals[ks:ke][okm]

    # split into L (strict lower, unit diag implied) and U (upper);
    # entries are already row-major + column-sorted, so boolean masks
    # preserve both orders
    low = a_cols < rs
    l_rp = np.zeros(n + 1, dtype=np.int64)
    u_rp = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(rs[low], minlength=n), out=l_rp[1:])
    np.cumsum(np.bincount(rs[~low], minlength=n), out=u_rp[1:])

    L = CsrMatrix(
        num_rows=n, num_columns=n, num_entries=int(l_rp[-1]),
        row_alignment=1, row_ptr=l_rp,
        column_index=a_cols[low].astype(np.int32),
        value=a_vals[low],
    )
    U = CsrMatrix(
        num_rows=n, num_columns=n, num_entries=int(u_rp[-1]),
        row_alignment=1, row_ptr=u_rp,
        column_index=a_cols[~low].astype(np.int32),
        value=a_vals[~low],
    )
    return L, U


# -------------------------------------------------------- level schedule

def build_level_schedule(rp, cols, n, lower: bool) -> list:
    """Group rows of a triangular matrix into dependency levels.

    ``lower``: dependencies are columns < row (forward solve order);
    otherwise columns > row (backward solve, computed in reverse).
    Returns a list of int64 row arrays, one per level.
    """
    from spmv_tpu.ops import _ic_native

    if _ic_native.available():
        level = _ic_native.level_schedule(
            np.asarray(rp), np.asarray(cols), n, lower)
    else:
        level = np.zeros(n, dtype=np.int64)
        rows_iter = range(n) if lower else range(n - 1, -1, -1)
        for i in rows_iter:
            deps = cols[rp[i]:rp[i + 1]]
            deps = deps[deps < i] if lower else deps[deps > i]
            if deps.size:
                level[i] = level[deps].max() + 1
    nl = int(level.max()) + 1 if n else 0
    order = np.argsort(level, kind="stable")
    bounds = np.searchsorted(level[order], np.arange(nl + 1))
    return [order[bounds[k]:bounds[k + 1]] for k in range(nl)]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["rows", "dep_cols", "dep_vals", "diag_inv"],
    meta_fields=["n", "num_levels", "width", "max_deps", "unit_diag"],
)
@dataclasses.dataclass(frozen=True)
class DeviceTriSolve:
    """Level-scheduled triangular solve operator.

    ``rows[l]`` are the rows resolved at level l (padded with the
    sacrificial slot n); each row's off-diagonal dependencies are the
    dense (width, max_deps) tiles ``dep_cols``/``dep_vals`` (padding
    points at slot n, value 0).  ``diag_inv`` is 1/diagonal (1 for
    unit-diagonal factors).  The solve is a lax.scan over levels.
    """

    n: int
    num_levels: int
    width: int
    max_deps: int
    unit_diag: bool
    rows: jax.Array       # (NL, W) int32
    dep_cols: jax.Array   # (NL, W, E) int32
    dep_vals: jax.Array   # (NL, W, E)
    diag_inv: jax.Array   # (NL, W)

    @classmethod
    def from_host(cls, t: CsrMatrix, lower: bool = True,
                  unit_diag: bool = False, dtype=None) -> "DeviceTriSolve":
        """Build from a host triangular CSR factor.

        ``unit_diag``: the factor stores only strict off-diagonal
        entries and its diagonal is implicitly 1 (ILU's L).
        """
        from spmv_tpu.models.device import default_value_dtype

        dtype = dtype or default_value_dtype()
        rp = np.asarray(t.row_ptr, np.int64)
        cols = np.asarray(t.column_index, np.int64)
        vals = np.asarray(t.value, np.float64)
        n = t.num_rows

        levels = build_level_schedule(rp, cols, n, lower)
        nl = len(levels)
        W = max((int(lv.size) for lv in levels), default=1)

        rows_flat = np.repeat(np.arange(n, dtype=np.int64),
                              np.diff(rp))
        diag, keep = _extract_diag(rows_flat, cols, vals, n, unit_diag)
        kr, kc, kv = rows_flat[keep], cols[keep], vals[keep]
        cnt = np.bincount(kr, minlength=n)
        max_e = max(int(cnt.max(initial=0)), 1)
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(cnt, out=starts[1:])
        slot = np.arange(kr.size, dtype=np.int64) - starts[kr]
        dense_c = np.full((n, max_e), n, dtype=np.int64)
        dense_v = np.zeros((n, max_e), dtype=np.float64)
        dense_c[kr, slot] = kc
        dense_v[kr, slot] = kv

        rows_a = np.full((max(nl, 1), W), n, dtype=np.int32)
        cols_a = np.full((max(nl, 1), W, max_e), n, dtype=np.int32)
        vals_a = np.zeros((max(nl, 1), W, max_e), dtype=np.float64)
        dinv_a = np.ones((max(nl, 1), W), dtype=np.float64)
        for l, lv in enumerate(levels):
            rows_a[l, : lv.size] = lv
            dinv_a[l, : lv.size] = 1.0 / diag[lv]
            cols_a[l, : lv.size] = dense_c[lv]
            vals_a[l, : lv.size] = dense_v[lv]

        return cls(
            n=n, num_levels=nl, width=W, max_deps=max_e,
            unit_diag=unit_diag,
            rows=jnp.asarray(rows_a),
            dep_cols=jnp.asarray(cols_a),
            dep_vals=jnp.asarray(vals_a, dtype=dtype),
            diag_inv=jnp.asarray(dinv_a, dtype=dtype),
        )

    @property
    def padding_factor(self) -> float:
        """Stored slots per real row — the level-skew diagnostic."""
        return self.num_levels * self.width / max(self.n, 1)

    def solve(self, b: jax.Array) -> jax.Array:
        """z = T^-1 b via the level scan."""
        bf = b.astype(self.dep_vals.dtype)
        z0 = jnp.zeros((self.n + 1,), bf.dtype)
        bp = jnp.concatenate([bf, jnp.zeros((1,), bf.dtype)])

        def body(z, lvl):
            rows, dc, dv, dinv = lvl
            acc = (dv * z[dc]).sum(axis=1)          # (W,)
            zi = (bp[rows] - acc) * dinv
            return z.at[rows].set(zi, mode="drop"), None

        z, _ = jax.lax.scan(
            body, z0,
            (self.rows, self.dep_cols, self.dep_vals, self.diag_inv),
        )
        return z[: self.n]


def _extract_diag(rows_flat, cols, vals, n, unit_diag):
    """(diag, keep-mask) of a triangular factor's flat arrays; keep
    selects the off-diagonal (dependency) entries.  Vectorized — the
    per-row python loops cost seconds at production sizes."""
    if unit_diag:
        return np.ones(n, dtype=np.float64), np.ones(
            rows_flat.size, dtype=bool)
    is_d = cols == rows_flat
    found = np.bincount(rows_flat[is_d], minlength=n)
    if (found == 0).any():
        bad = int(np.nonzero(found == 0)[0][0])
        raise MatrixError(
            f"triangular factor row {bad} has no diagonal")
    diag = np.zeros(n, dtype=np.float64)
    diag[rows_flat[is_d]] = vals[is_d]
    return diag, ~is_d


def tri_solve_sweeps(t: "DeviceTriSolve", b: jax.Array,
                     sweeps: int) -> jax.Array:
    """Approximate triangular solve by Jacobi iteration on the level
    structure's flat arrays: exact after ``num_levels`` sweeps, a
    standard preconditioner substitute after a handful (fully
    parallel — no level scan)."""
    bf = b.astype(t.dep_vals.dtype)
    bp = jnp.concatenate([bf, jnp.zeros((1,), bf.dtype)])
    rows = t.rows.reshape(-1)
    dc = t.dep_cols.reshape(-1, t.max_deps)
    dv = t.dep_vals.reshape(-1, t.max_deps)
    dinv = t.diag_inv.reshape(-1)

    def body(_, z):
        acc = (dv * z[dc]).sum(axis=1)
        zi = (bp[rows] - acc) * dinv
        return z.at[rows].set(zi, mode="drop")

    z = jnp.zeros((t.n + 1,), bf.dtype)
    z = jax.lax.fori_loop(0, sweeps, body, z)
    return z[: t.n]


# --------------------------------------------------------- preconditioners

def _pair_solver(Tl: CsrMatrix, Tu: CsrMatrix, unit_lower: bool,
                 method: str, sweeps: int, dtype):
    """Shared forward+backward solver builder for both factorizations.

    ``method``:
    - "auto": "blocks" when both triangles' levels are contiguous
      ranges and few (the multicolor case — probe 51b measured the
      scatter-based scan at ~5000x the SpMV cost, the block path at
      matvec cost), else the "levels" scan;
    - "blocks": force the per-level fast-format matvec path;
    - "levels": the lax.scan over padded dependency levels;
    - "sweeps": Jacobi-iteration approximation, ``sweeps``/triangle.
    """
    if method in ("auto", "blocks"):
        try:
            fwd = BlockTriSolve.from_host(
                Tl, lower=True, unit_diag=unit_lower, dtype=dtype)
            bwd = BlockTriSolve.from_host(Tu, lower=False, dtype=dtype)

            def apply(r):
                return bwd.solve(fwd.solve(r))
            info = {
                "levels_forward": fwd.num_levels,
                "levels_backward": bwd.num_levels,
                "block_formats": [
                    getattr(b, "format_name", "none")
                    for b in fwd.blocks + bwd.blocks
                ],
                "method": "blocks",
            }
            return apply, info
        except MatrixError:
            if method == "blocks":
                raise
            method = "levels"

    fwd = DeviceTriSolve.from_host(
        Tl, lower=True, unit_diag=unit_lower, dtype=dtype)
    bwd = DeviceTriSolve.from_host(Tu, lower=False, dtype=dtype)
    if method == "levels":
        def apply(r):
            return bwd.solve(fwd.solve(r))
    elif method == "sweeps":
        def apply(r):
            return tri_solve_sweeps(bwd, tri_solve_sweeps(
                fwd, r, sweeps), sweeps)
    else:
        raise ValueError(f"unknown tri-solve method {method!r}")
    info = {
        "levels_forward": fwd.num_levels,
        "levels_backward": bwd.num_levels,
        "level_width": fwd.width,
        "padding_factor": fwd.padding_factor,
        "method": method,
    }
    return apply, info


def ic0_preconditioner(L: CsrMatrix, method: str = "auto",
                       sweeps: int = 6, dtype=None):
    """M^-1 r = (L L^T)^-1 r from an IC(0) factor.

    See :func:`_pair_solver` for the method choices ("auto" picks the
    block matvec path when the ordering allows).  Returns
    (apply_fn, info_dict).
    """
    apply, info = _pair_solver(
        L, _transpose_csr(L), unit_lower=False,
        method=method, sweeps=sweeps, dtype=dtype)
    return apply, info


def ilu0_preconditioner(L: CsrMatrix, U: CsrMatrix,
                        method: str = "auto", sweeps: int = 6,
                        dtype=None):
    """M^-1 r = (L U)^-1 r from an ILU(0) factor (unit-diagonal L).

    See :func:`_pair_solver` for the method choices."""
    return _pair_solver(L, U, unit_lower=True, method=method,
                        sweeps=sweeps, dtype=dtype)


def _transpose_csr(m: CsrMatrix) -> CsrMatrix:
    """Host CSR transpose (unpadded)."""
    rp = np.asarray(m.row_ptr, np.int64)
    rows = np.repeat(np.arange(m.num_rows, dtype=np.int64),
                     np.diff(rp))
    cols = np.asarray(m.column_index, np.int64)
    vals = np.asarray(m.value, np.float64)
    order = np.lexsort((rows, cols))
    t_rows = cols[order]
    t_rp = np.zeros(m.num_columns + 1, dtype=np.int64)
    np.cumsum(np.bincount(t_rows, minlength=m.num_columns),
              out=t_rp[1:])
    return CsrMatrix(
        num_rows=m.num_columns, num_columns=m.num_rows,
        num_entries=m.num_entries, row_alignment=1,
        row_ptr=t_rp,
        column_index=rows[order].astype(np.int32),
        value=vals[order],
    )


# ------------------------------------------------- block-level tri solve

class BlockTriSolve:
    """Triangular solve as one fast-format matvec per dependency level.

    Probe 51 measured the scatter/gather-based level scan at ~17 ns per
    element on TPU — ~5000x the DIA SpMV it preconditions — because
    XLA lowers 1-D scatter/gather to serial updates.  When the levels
    are *contiguous row ranges* (exactly what multicolor reordering
    produces: rows numbered color-major), no scatter is needed at all:

        z[s_k:e_k] = (b[s_k:e_k] - T[s_k:e_k, :] @ z) * dinv[s_k:e_k]

    The dep block ``T[s_k:e_k, :]`` is a rectangular sparse matrix
    stored in the framework's own fast formats — DIA (zero-gather
    shifted slices) when it has few distinct diagonals, CSR segment
    form otherwise — so the whole solve is NL static slice updates +
    NL-1 matvecs.  On a 2-colored 5-point Laplacian that is one DIA
    matvec per triangle (probe 51b).
    """

    def __init__(self, n, starts, ends, blocks, diag_inv, dtype):
        self.n = n
        self.starts = starts          # static python ints
        self.ends = ends
        self.blocks = blocks          # per level: device matrix or None
        self.diag_inv = diag_inv      # per level: (len,) array
        self.dtype = dtype

    @property
    def num_levels(self) -> int:
        return len(self.starts)

    @classmethod
    def from_host(cls, t: CsrMatrix, lower: bool = True,
                  unit_diag: bool = False, dtype=None,
                  max_levels: int = 64,
                  max_diagonals: int = 96) -> "BlockTriSolve":
        """Build from a host triangular factor whose dependency levels
        are contiguous row ranges (e.g. after ``--reorder color``).

        Raises MatrixError when levels are non-contiguous or too many
        (``max_levels``) — callers fall back to the scan/sweep paths.
        """
        from spmv_tpu.models.device import (
            DeviceCsr,
            DeviceDia,
            default_value_dtype,
        )
        from spmv_tpu.models.dia import DiaMatrix

        dtype = dtype or default_value_dtype()
        rp = np.asarray(t.row_ptr, np.int64)
        cols = np.asarray(t.column_index, np.int64)
        vals = np.asarray(t.value, np.float64)
        n = t.num_rows

        levels = build_level_schedule(rp, cols, n, lower)
        if len(levels) > max_levels:
            raise MatrixError(
                f"block tri-solve: {len(levels)} levels > "
                f"{max_levels}; use the level-scan path (or reorder "
                "with multicoloring)"
            )
        starts, ends = [], []
        for lv in levels:
            lv = np.sort(lv)
            if lv.size and not (np.diff(lv) == 1).all():
                raise MatrixError(
                    "block tri-solve requires contiguous level "
                    "ranges (color-major row numbering)"
                )
            starts.append(int(lv[0]) if lv.size else 0)
            ends.append(int(lv[-1]) + 1 if lv.size else 0)

        rows_flat = np.repeat(np.arange(n, dtype=np.int64),
                              np.diff(rp))
        diag, keep = _extract_diag(rows_flat, cols, vals, n, unit_diag)

        blocks, dinvs = [], []
        for s, e in zip(starts, ends):
            # dep entries of rows [s, e): everything except the
            # diagonal — one flat slice per level (levels are
            # contiguous row ranges, entries row-major)
            sl = slice(int(rp[s]), int(rp[e]) if e <= n else rp[-1])
            m = keep[sl]
            br = rows_flat[sl][m] - s
            bc = cols[sl][m]
            bv = vals[sl][m]
            if br.size == 0:
                blocks.append(None)
            else:
                brp = np.zeros(e - s + 1, dtype=np.int64)
                np.cumsum(np.bincount(br, minlength=e - s),
                          out=brp[1:])
                host = CsrMatrix(e - s, n, br.size, 1, brp,
                                 bc.astype(np.int32), bv)
                try:
                    dia = DiaMatrix.from_csr(
                        host, max_diagonals=max_diagonals)
                    blocks.append(DeviceDia.from_host(dia, dtype=dtype))
                except MatrixError:
                    blocks.append(DeviceCsr.from_host(host, dtype=dtype))
            dinvs.append(jnp.asarray(1.0 / diag[s:e], dtype=dtype))

        return cls(n, starts, ends, blocks, dinvs, dtype)

    def solve(self, b: jax.Array) -> jax.Array:
        from spmv_tpu.ops.spmv import spmv as _spmv

        bf = b.astype(self.dtype)
        z = jnp.zeros((self.n,), self.dtype)
        for s, e, blk, dinv in zip(self.starts, self.ends,
                                   self.blocks, self.diag_inv):
            seg = jax.lax.dynamic_slice(bf, (s,), (e - s,))
            if blk is not None:
                seg = seg - _spmv(blk, z)
            z = jax.lax.dynamic_update_slice(z, seg * dinv, (s,))
        return z
