"""Parity against the reference's embedded poisson2D ground truth.

The reference validates every format as ||A@b - result||_2 ~ 0 on the
SuiteSparse FEMLAB/poisson2D fixture (test/test_csr-matrix.cpp:105-116,
fixture at test/poisson2D.hpp).  These tests parse that exact fixture
out of the read-only reference checkout and run it through our parsers
and formats; they skip when the checkout is absent.
"""

import numpy as np
import pytest

from spmv_tpu.io import parse_matrix_market
from spmv_tpu.models import CooMatrix, CsrMatrix, EllMatrix, HybridMatrix


@pytest.mark.parametrize(
    "fmt",
    [
        CooMatrix.from_matrix_market,
        CsrMatrix.from_matrix_market,
        EllMatrix.from_matrix_market,
        lambda mm: EllMatrix.from_matrix_market(mm, skip_padding=True),
        HybridMatrix.from_matrix_market,
    ],
)
def test_poisson2d_spmv_matches_reference(reference_poisson2d, fmt):
    mtx, b, expected = reference_poisson2d
    mm = parse_matrix_market(mtx)
    assert (mm.num_rows, mm.num_columns, mm.num_entries) == (367, 367, 2417)
    m = fmt(mm)
    y = m.spmv(b)
    # Reference bound: l2norm(y - z) <= ~eps (test_csr-matrix.cpp:114).
    assert np.linalg.norm(y - expected) < 1e-12


def test_poisson2d_row_stats(reference_poisson2d):
    mtx, _, _ = reference_poisson2d
    mm = parse_matrix_market(mtx)
    assert mm.max_row_length() == 9
    assert int(mm.row_lengths().sum()) == 2417
