"""BSR: block-sparse rows with dense (128, 128) blocks — the MXU format.

Third TPU-native format (with DIA and WELL; no reference counterpart —
the reference's formats are all entry-wise, SURVEY.md §2).  SpMV is
bandwidth-bound and belongs to DIA/WELL; BSR exists for the workloads
where the MXU matters: matrices with *dense block structure* (FEM,
multi-dof meshes) multiplied against **blocks of vectors** (SpMM).
Each stored block is a dense 128x128 tile, and the kernel's inner op is

    Y_block(128, k) += A_block(128, 128) @ X_block(128, k)

— a native systolic-array matmul at full utilization when k ~ 128.

Storage: ``block_col`` / ``block_rowptr`` index nonzero blocks in
block-row-major order; ``blocks`` holds them dense.  ``fill_ratio``
(stored slots / nnz) decides when BSR is worth it: below ~8 the MXU's
flops-per-byte advantage beats the zero-padding traffic for SpMM.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from spmv_tpu.errors import MatrixError
from spmv_tpu.io.matrix_market import MatrixMarket, VALUE_DTYPE
from spmv_tpu.models._convert import sorted_entries_0based
from spmv_tpu.models.csr import CsrMatrix

__all__ = ["BsrMatrix", "BLOCK"]

BLOCK = 128


@dataclasses.dataclass
class BsrMatrix:
    num_rows: int
    num_columns: int
    num_entries: int
    blocks: np.ndarray        # (NB, 128, 128) float64, dense blocks
    block_col: np.ndarray     # (NB,) int32 block-column index
    block_rowptr: np.ndarray  # (num_block_rows + 1,) int64

    format_name = "bsr"

    # ------------------------------------------------------------------
    @classmethod
    def from_matrix_market(
        cls, mm: MatrixMarket, max_fill: float | None = None
    ) -> "BsrMatrix":
        rows, cols, vals, row_ptr = sorted_entries_0based(mm)
        return cls._build(
            mm.num_rows, mm.num_columns, rows, cols, vals, max_fill
        )

    @classmethod
    def from_csr(
        cls, m: CsrMatrix, max_fill: float | None = None
    ) -> "BsrMatrix":
        if int(m.row_ptr[-1]) != m.num_entries:
            raise MatrixError("BsrMatrix.from_csr requires unpadded CSR")
        rows = np.repeat(
            np.arange(m.num_rows, dtype=np.int64), np.diff(m.row_ptr)
        )
        return cls._build(
            m.num_rows, m.num_columns, rows,
            np.asarray(m.column_index, np.int64),
            np.asarray(m.value), max_fill,
        )

    @classmethod
    def _build(cls, num_rows, num_columns, rows, cols, vals, max_fill):
        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int64)
        nbr = max(-(-num_rows // BLOCK), 1)
        bi = rows // BLOCK
        bj = cols // BLOCK
        key = bi * (num_columns // BLOCK + 1) + bj
        uniq, inv = np.unique(key, return_inverse=True)
        nb = uniq.size
        if max_fill is not None and vals.size:
            fill = nb * BLOCK * BLOCK / vals.size
            if fill > max_fill:
                raise MatrixError(
                    f"BSR fill ratio {fill:.1f} exceeds max_fill="
                    f"{max_fill}; the matrix has no dense block "
                    "structure — use WELL/CSR instead"
                )
        blocks = np.zeros((max(nb, 1), BLOCK, BLOCK), dtype=VALUE_DTYPE)
        np.add.at(
            blocks, (inv, rows % BLOCK, cols % BLOCK), vals
        )
        u_bi = (uniq // (num_columns // BLOCK + 1)).astype(np.int64)
        u_bj = (uniq % (num_columns // BLOCK + 1)).astype(np.int32)
        if nb == 0:
            u_bi = u_bi[:0]
            u_bj = u_bj[:0]
            blocks = blocks[:0]
        # The Pallas kernel initializes an output block only when its
        # first block arrives: give every EMPTY block-row one inert
        # zero block so no output tile stays unwritten.
        lengths = np.bincount(u_bi, minlength=nbr)
        empty = np.nonzero(lengths == 0)[0]
        if empty.size:
            u_bi = np.concatenate([u_bi, empty])
            u_bj = np.concatenate(
                [u_bj, np.zeros(empty.size, dtype=np.int32)]
            )
            blocks = np.concatenate([
                blocks,
                np.zeros((empty.size, BLOCK, BLOCK), dtype=VALUE_DTYPE),
            ])
            order = np.argsort(u_bi, kind="stable")
            u_bi, u_bj, blocks = u_bi[order], u_bj[order], blocks[order]
            lengths = np.bincount(u_bi, minlength=nbr)
        rowptr = np.zeros(nbr + 1, dtype=np.int64)
        np.cumsum(lengths, out=rowptr[1:])
        return cls(
            num_rows=int(num_rows),
            num_columns=int(num_columns),
            num_entries=int(rows.size),
            blocks=blocks,
            block_col=u_bj,
            block_rowptr=rowptr,
        )

    # ------------------------------------------------------------------
    @property
    def num_blocks(self) -> int:
        return int(self.blocks.shape[0])

    @property
    def num_block_rows(self) -> int:
        return int(self.block_rowptr.size - 1)

    @property
    def fill_ratio(self) -> float:
        return self.blocks.size / max(self.num_entries, 1)

    def memory_usage_bytes(self) -> int:
        return (self.blocks.nbytes + self.block_col.nbytes
                + self.block_rowptr.nbytes)

    def spmm(self, X: np.ndarray) -> np.ndarray:
        """NumPy reference SpMM (fp64 correctness gate)."""
        X = np.asarray(X)
        k = X.shape[1]
        ncb = -(-self.num_columns // BLOCK)
        Xp = np.zeros((ncb * BLOCK, k), dtype=np.result_type(
            self.blocks, X))
        Xp[: X.shape[0]] = X
        Y = np.zeros((self.num_block_rows * BLOCK, k), dtype=Xp.dtype)
        for br in range(self.num_block_rows):
            s, e = self.block_rowptr[br], self.block_rowptr[br + 1]
            for t in range(s, e):
                bj = int(self.block_col[t])
                Y[br * BLOCK:(br + 1) * BLOCK] += (
                    self.blocks[t] @ Xp[bj * BLOCK:(bj + 1) * BLOCK]
                )
        return Y[: self.num_rows]

    def spmv(self, x: np.ndarray) -> np.ndarray:
        return self.spmm(np.asarray(x)[:, None])[:, 0]

    def __matmul__(self, x):
        x = np.asarray(x)
        return self.spmv(x) if x.ndim == 1 else self.spmm(x)
