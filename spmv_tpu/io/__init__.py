"""Matrix ingestion: Matrix Market files, gzip, SuiteSparse tarballs."""

from spmv_tpu.io.matrix_market import (
    MatrixMarket,
    parse_matrix_market,
    load_matrix,
    write_matrix_market,
)

__all__ = [
    "MatrixMarket",
    "parse_matrix_market",
    "load_matrix",
    "write_matrix_market",
]
