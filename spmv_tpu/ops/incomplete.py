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


def ic0_factor(m: CsrMatrix, shift: float = 0.0) -> CsrMatrix:
    """IC(0): lower-triangular L on lower(A)'s pattern, L L^T ~= A.

    Row-by-row left-looking update restricted to the pattern.  A
    non-positive pivot (A not SPD enough for the incomplete pattern)
    raises unless ``shift`` > 0 is supplied, in which case the
    factorization runs on A + shift*diag(A) (Manteuffel shift).
    """
    if m.num_rows != m.num_columns:
        raise MatrixError("ic0 requires a square matrix")
    rp, cols, vals = _csr_arrays(m)
    n = m.num_rows

    # per-row sorted lower-pattern (incl. diagonal)
    lrp = np.zeros(n + 1, dtype=np.int64)
    lcols_l, lvals_l = [], []
    for i in range(n):
        s, e = rp[i], rp[i + 1]
        c = cols[s:e]
        v = vals[s:e]
        order = np.argsort(c, kind="stable")
        c, v = c[order], v[order]
        sel = c <= i
        c, v = c[sel], v[sel]
        if c.size == 0 or c[-1] != i:
            raise MatrixError(f"ic0: row {i} has no diagonal entry")
        if shift:
            v = v.copy()
            v[-1] = v[-1] * (1.0 + shift)
        lcols_l.append(c)
        lvals_l.append(v)
        lrp[i + 1] = lrp[i] + c.size
    lcols = np.concatenate(lcols_l)
    lvals = np.concatenate(lvals_l)

    # row start lookup for the dot products
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


def ilu0_factor(m: CsrMatrix) -> tuple:
    """ILU(0): (L_unit, U) on A's pattern, L U ~= A.

    IKJ-variant Gaussian elimination restricted to the pattern
    (Saad, Iterative Methods, alg. 10.4).  L has unit diagonal
    (stored without it); U holds the diagonal.
    """
    if m.num_rows != m.num_columns:
        raise MatrixError("ilu0 requires a square matrix")
    rp, cols, vals = _csr_arrays(m)
    n = m.num_rows

    # column-sorted copies + fast (i, j) -> slot lookup per row
    a_rp = np.zeros(n + 1, dtype=np.int64)
    a_cols_l, a_vals_l = [], []
    for i in range(n):
        c = cols[rp[i]:rp[i + 1]]
        v = vals[rp[i]:rp[i + 1]]
        order = np.argsort(c, kind="stable")
        a_cols_l.append(c[order])
        a_vals_l.append(v[order].copy())
        a_rp[i + 1] = a_rp[i] + c.size
    a_cols = np.concatenate(a_cols_l)
    a_vals = np.concatenate(a_vals_l)

    diag_slot = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        s, e = a_rp[i], a_rp[i + 1]
        d = np.searchsorted(a_cols[s:e], i)
        if d == e - s or a_cols[s + d] != i:
            raise MatrixError(f"ilu0: row {i} has no diagonal entry")
        diag_slot[i] = s + d

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

    # split into L (strict lower, unit diag implied) and U (upper)
    l_rp = np.zeros(n + 1, dtype=np.int64)
    u_rp = np.zeros(n + 1, dtype=np.int64)
    l_cols_l, l_vals_l, u_cols_l, u_vals_l = [], [], [], []
    for i in range(n):
        s, e = a_rp[i], a_rp[i + 1]
        c = a_cols[s:e]
        v = a_vals[s:e]
        low = c < i
        up = c >= i
        l_cols_l.append(c[low])
        l_vals_l.append(v[low])
        u_cols_l.append(c[up])
        u_vals_l.append(v[up])
        l_rp[i + 1] = l_rp[i] + int(low.sum())
        u_rp[i + 1] = u_rp[i] + int(up.sum())

    L = CsrMatrix(
        num_rows=n, num_columns=n, num_entries=int(l_rp[-1]),
        row_alignment=1, row_ptr=l_rp,
        column_index=np.concatenate(l_cols_l).astype(np.int32)
        if l_rp[-1] else np.zeros(0, np.int32),
        value=np.concatenate(l_vals_l) if l_rp[-1]
        else np.zeros(0),
    )
    U = CsrMatrix(
        num_rows=n, num_columns=n, num_entries=int(u_rp[-1]),
        row_alignment=1, row_ptr=u_rp,
        column_index=np.concatenate(u_cols_l).astype(np.int32),
        value=np.concatenate(u_vals_l),
    )
    return L, U


# -------------------------------------------------------- level schedule

def build_level_schedule(rp, cols, n, lower: bool) -> list:
    """Group rows of a triangular matrix into dependency levels.

    ``lower``: dependencies are columns < row (forward solve order);
    otherwise columns > row (backward solve, computed in reverse).
    Returns a list of int64 row arrays, one per level.
    """
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

        diag = np.ones(n, dtype=np.float64)
        deps_c, deps_v = [], []
        max_e = 1
        for i in range(n):
            c = cols[rp[i]:rp[i + 1]]
            v = vals[rp[i]:rp[i + 1]]
            if not unit_diag:
                is_d = c == i
                if not is_d.any():
                    raise MatrixError(
                        f"triangular factor row {i} has no diagonal")
                diag[i] = v[is_d][0]
                c, v = c[~is_d], v[~is_d]
            deps_c.append(c)
            deps_v.append(v)
            max_e = max(max_e, c.size)

        rows_a = np.full((max(nl, 1), W), n, dtype=np.int32)
        cols_a = np.full((max(nl, 1), W, max_e), n, dtype=np.int32)
        vals_a = np.zeros((max(nl, 1), W, max_e), dtype=np.float64)
        dinv_a = np.ones((max(nl, 1), W), dtype=np.float64)
        for l, lv in enumerate(levels):
            rows_a[l, : lv.size] = lv
            dinv_a[l, : lv.size] = 1.0 / diag[lv]
            for w, i in enumerate(lv):
                e = deps_c[i].size
                cols_a[l, w, :e] = deps_c[i]
                vals_a[l, w, :e] = deps_v[i]

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

        diag = np.ones(n, dtype=np.float64)
        if not unit_diag:
            for i in range(n):
                sel = cols[rp[i]:rp[i + 1]] == i
                if not sel.any():
                    raise MatrixError(
                        f"triangular factor row {i} has no diagonal")
                diag[i] = vals[rp[i]:rp[i + 1]][sel][0]

        blocks, dinvs = [], []
        for s, e in zip(starts, ends):
            # dep entries of rows [s, e): everything except the diagonal
            bl_rows, bl_cols, bl_vals = [], [], []
            for i in range(s, e):
                c = cols[rp[i]:rp[i + 1]]
                v = vals[rp[i]:rp[i + 1]]
                keep = c != i
                bl_rows.append(np.full(int(keep.sum()), i - s,
                                       dtype=np.int64))
                bl_cols.append(c[keep])
                bl_vals.append(v[keep])
            br = np.concatenate(bl_rows) if bl_rows else \
                np.zeros(0, np.int64)
            bc = np.concatenate(bl_cols) if bl_cols else \
                np.zeros(0, np.int64)
            bv = np.concatenate(bl_vals) if bl_vals else np.zeros(0)
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
