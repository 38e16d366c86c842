"""WELL-CW: chunk-window WELL — the TPU format for *scattered* sparsity.

The per-slot-window WELL (models.well) excels when a row's stored
columns cluster (stencils, RCM-reordered meshes): slot windows hug the
data and fill approaches 1.  When columns are scattered across a wide
band — the irregular-matrix case the reference covers with its hybrid
format (src/matrix/hybrid-matrix.cpp:329-410) — per-slot windows blow
up (31% spill on random-banded, probe 12) and the kernel's per-slot
gather-table assembly (8 single-row dynamic slices per window row per
chunk) is VPU-bound at ~6 Gnnz/s even with zero spill (probe 26).

WELL-CW restructures both the layout and the gather (probes 27-28):

- Each **chunk** of (8 slots x 128 rows) has ONE fixed column window
  of ``8*d`` x2d rows (``1024*d`` columns); windows tile the column
  space (window id = column // (1024 d)), so *every* entry fits some
  window by construction — spill is only multiplicity overflow.
- **Cell positions are forced**: an entry of row r with window-row
  offset w = (col // 128) - anchor lives at slot ``w // d``, lane
  ``r % 128``.  Packing is a vectorized numpy group-by: the k-th
  entry landing on the same (window, slot, lane) goes to the k-th
  chunk at that window ("multiplicity rank").
- The kernel pre-splits x into ``d`` stride-d tables
  ``xt[p] = x2d[p::d]``; slot s of a chunk reads x2d row
  ``anchor + d*s + p`` = ``xt[p][anchor/d + s]`` — so each of the d
  gather tables is ONE contiguous, sublane-aligned dynamic slice
  ``xt[p][a4 : a4+8]``, followed by one lane shuffle
  (take_along_axis) and a select on the entry's phase ``p``.
  ~10x less VPU work per chunk than per-slot windows.
- **Multi-level packing**: level 1 uses a small window (d=4) and a
  tight multiplicity cap for dense chunks; its overflow is repacked
  at level 2 with a wide window (d=8) and a deep cap.  Because the
  XLA gather path runs at ~0.06 Gnnz/s on this chip (probe 28), the
  levels are tuned so the final remainder is ~zero; anything left
  (pathological multiplicity) goes to the CSR remainder.

Measured (probes 27/28, random banded n=1M bw=4096, 16.7M nnz, the
VERDICT #4 cliff case): 15.2 Gnnz/s at K=64/B=8 vs 4.8 Gnnz/s for
per-slot WELL with 31% spill in round 1.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

from spmv_tpu.errors import MatrixError
from spmv_tpu.io.matrix_market import MatrixMarket, VALUE_DTYPE
from spmv_tpu.models._convert import sorted_entries_0based
from spmv_tpu.models.csr import CsrMatrix

__all__ = ["WellCwMatrix", "CwLevel", "DEFAULT_LEVELS"]

LANE = 128
SUBLANE = 8
GROUP_ROWS = 128

# (d, multiplicity cap, min chunk population) per level.  Level 1:
# narrow window, dense chunks; level 2: wide window, deep cap and no
# pruning so the remainder stays ~zero (probe 28: the XLA remainder
# path costs ~17 ns/entry — 100x a packed entry).
DEFAULT_LEVELS: Tuple[Tuple[int, int, float], ...] = (
    (4, 6, 0.05),
    (8, 64, 0.0),
)


@dataclasses.dataclass
class CwLevel:
    """One packing level: all chunks share the window width 1024*d."""

    d: int                      # window = 8*d x2d rows = 1024*d cols
    value: np.ndarray           # (chunks, 8, 128)
    local_index: np.ndarray     # (chunks, 8, 128) int32: w*128 + lane
    anchor4: np.ndarray         # (chunks,) int32: window start / d
                                # (row units of the stride-d tables)
    group_of_chunk: np.ndarray  # (chunks,) int32, non-decreasing

    @property
    def num_chunks(self) -> int:
        return int(self.value.shape[0])


def _pack_level(
    num_rows: int,
    num_columns: int,
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    d: int,
    cap: int,
    min_pop: float,
) -> Tuple[CwLevel, np.ndarray]:
    """Pack entries into chunk-window form; returns (level, spilled)
    where ``spilled`` indexes the entries that did not fit (rank >=
    cap, or rank >= 1 in an overflow chunk filled below ``min_pop``)."""
    wincols = 1024 * d
    g = rows >> 7
    win = cols // wincols
    w = (cols >> 7) - (win << 3) * d          # window-row offset [0, 8d)
    s = w // d
    lane = rows & (GROUP_ROWS - 1)
    nwin = num_columns // wincols + 2
    key = ((g * nwin + win) * SUBLANE + s) * GROUP_ROWS + lane
    order = np.argsort(key, kind="stable")
    ks = key[order]
    newgrp = np.empty(ks.size, dtype=bool)
    if ks.size:
        newgrp[0] = True
        np.not_equal(ks[1:], ks[:-1], out=newgrp[1:])
    idx = np.arange(ks.size)
    start = idx[newgrp][np.cumsum(newgrp) - 1] if ks.size else idx
    rank = np.empty(ks.size, dtype=np.int64)
    rank[order] = idx - start
    keep = rank < cap

    def enumerate_chunks(keep):
        ckey = (g[keep] * nwin + win[keep]) * cap + rank[keep]
        corder = np.argsort(ckey, kind="stable")
        cs = ckey[corder]
        cnew = np.empty(cs.size, dtype=bool)
        if cs.size:
            cnew[0] = True
            np.not_equal(cs[1:], cs[:-1], out=cnew[1:])
        chunk_of = np.empty(cs.size, dtype=np.int64)
        chunk_of[corder] = np.cumsum(cnew) - 1
        return chunk_of, (int(cnew.sum()) if cs.size else 0)

    chunk_of, n_chunks = enumerate_chunks(keep)
    if min_pop > 0.0 and n_chunks:
        # prune near-empty overflow chunks (a single high-multiplicity
        # cell would otherwise force a whole ~empty chunk)
        pop = np.bincount(chunk_of, minlength=n_chunks)
        crank = np.zeros(n_chunks, dtype=np.int64)
        crank[chunk_of] = rank[keep]
        prune = (pop < min_pop * SUBLANE * GROUP_ROWS) & (crank > 0)
        if prune.any():
            keep_idx = np.nonzero(keep)[0]
            keep[keep_idx[prune[chunk_of]]] = False
            chunk_of, n_chunks = enumerate_chunks(keep)

    value = np.zeros((n_chunks, SUBLANE, GROUP_ROWS), dtype=VALUE_DTYPE)
    loc = np.zeros((n_chunks, SUBLANE, GROUP_ROWS), dtype=np.int32)
    anchor4 = np.zeros(n_chunks, dtype=np.int32)
    grp = np.zeros(n_chunks, dtype=np.int32)
    value[chunk_of, s[keep], lane[keep]] = vals[keep]
    loc[chunk_of, s[keep], lane[keep]] = (
        (w[keep] << 7) | (cols[keep] & (LANE - 1))
    ).astype(np.int32)
    anchor4[chunk_of] = (win[keep] << 3).astype(np.int32)
    grp[chunk_of] = g[keep].astype(np.int32)
    level = CwLevel(d=d, value=value, local_index=loc, anchor4=anchor4,
                    group_of_chunk=grp)
    return level, np.nonzero(~keep)[0]


@dataclasses.dataclass
class WellCwMatrix:
    num_rows: int
    num_columns: int
    num_entries: int
    levels: Tuple[CwLevel, ...]
    remainder: Optional[CsrMatrix]   # pathological multiplicity tail

    format_name = "wellcw"

    # ------------------------------------------------------------------
    @classmethod
    def from_matrix_market(
        cls,
        mm: MatrixMarket,
        levels: Sequence[Tuple[int, int, float]] = DEFAULT_LEVELS,
    ) -> "WellCwMatrix":
        rows, cols, vals, _ = sorted_entries_0based(mm)
        return cls._build(mm.num_rows, mm.num_columns, rows, cols,
                          vals, levels)

    @classmethod
    def from_csr(
        cls,
        m: CsrMatrix,
        levels: Sequence[Tuple[int, int, float]] = DEFAULT_LEVELS,
    ) -> "WellCwMatrix":
        if int(m.row_ptr[-1]) != m.num_entries:
            raise MatrixError(
                "WellCwMatrix.from_csr requires an unpadded CSR")
        rows = np.repeat(
            np.arange(m.num_rows, dtype=np.int64), np.diff(m.row_ptr))
        return cls._build(
            m.num_rows, m.num_columns, rows,
            m.column_index.astype(np.int64), m.value, levels)

    @classmethod
    def _build(cls, num_rows, num_columns, rows, cols, vals, levels):
        if not levels:
            raise MatrixError("WellCwMatrix needs at least one level")
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals, dtype=VALUE_DTYPE)
        built = []
        cur = np.arange(rows.size)
        for d, cap, min_pop in levels:
            if d & (d - 1):
                raise MatrixError(f"level width d={d} must be a power "
                                  "of two (phase select uses masks)")
            lvl, spilled = _pack_level(
                num_rows, num_columns, rows[cur], cols[cur], vals[cur],
                d, cap, min_pop)
            built.append(lvl)
            cur = cur[spilled]
            if cur.size == 0:
                break
        remainder = None
        if cur.size:
            order = np.argsort(rows[cur], kind="stable")
            r, c, v = rows[cur][order], cols[cur][order], vals[cur][order]
            rp = np.zeros(num_rows + 1, dtype=np.int64)
            np.add.at(rp, r + 1, 1)
            np.cumsum(rp, out=rp)
            remainder = CsrMatrix(
                num_rows=num_rows, num_columns=num_columns,
                num_entries=int(v.size), row_alignment=1,
                row_ptr=rp, column_index=c.astype(np.int32), value=v)
        return cls(num_rows=num_rows, num_columns=num_columns,
                   num_entries=int(rows.size), levels=tuple(built),
                   remainder=remainder)

    # ------------------------------------------------------------------
    @property
    def num_groups(self) -> int:
        return max(-(-self.num_rows // GROUP_ROWS), 1)

    @property
    def num_chunks(self) -> int:
        return sum(lv.num_chunks for lv in self.levels)

    @property
    def num_remainder(self) -> int:
        return 0 if self.remainder is None else self.remainder.num_entries

    @property
    def remainder_fraction(self) -> float:
        return self.num_remainder / max(self.num_entries, 1)

    @property
    def fill_ratio(self) -> float:
        cells = sum(lv.value.size for lv in self.levels)
        return (self.num_entries - self.num_remainder) / max(cells, 1)

    def memory_usage_bytes(self) -> int:
        total = 0
        for lv in self.levels:
            total += lv.value.nbytes + lv.local_index.nbytes
            total += lv.anchor4.nbytes + lv.group_of_chunk.nbytes
        if self.remainder is not None:
            total += self.remainder.memory_usage_bytes()
        return total

    # ------------------------------------------------------------------
    def spmv(self, x: np.ndarray) -> np.ndarray:
        """Host (numpy) reference evaluation, all levels + remainder."""
        if x.shape[0] != self.num_columns:
            raise MatrixError(
                f"x has {x.shape[0]} entries, matrix has "
                f"{self.num_columns} columns")
        y = np.zeros(self.num_rows, dtype=np.result_type(x, VALUE_DTYPE))
        for lv in self.levels:
            t, s, lane = np.nonzero(lv.value)
            if t.size == 0:
                continue
            loc = lv.local_index[t, s, lane].astype(np.int64)
            col = ((lv.anchor4[t].astype(np.int64) * lv.d
                    + (loc >> 7)) << 7) | (loc & (LANE - 1))
            row = lv.group_of_chunk[t].astype(np.int64) * GROUP_ROWS \
                + lane
            np.add.at(y, row, lv.value[t, s, lane] * x[col])
        if self.remainder is not None:
            y += self.remainder.spmv(x)
        return y

    def spmm(self, X: np.ndarray) -> np.ndarray:
        return np.stack(
            [self.spmv(X[:, j]) for j in range(X.shape[1])], axis=1)

    def __matmul__(self, x):
        return self.spmm(x) if x.ndim == 2 else self.spmv(x)
