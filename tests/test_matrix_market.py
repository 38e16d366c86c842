"""Matrix Market parser and loader tests.

Modeled on the reference's test/test_matrix-market.cpp: header
validation, typed entry parsing, gz / tar.gz loading, sorting.
"""

import gzip
import io
import os
import tarfile

import numpy as np
import pytest

from spmv_tpu.errors import MatrixError
from spmv_tpu.io import parse_matrix_market, load_matrix
from spmv_tpu.io.generate import poisson2d


def test_parse_header_and_entries(tiny_mtx_text):
    mm = parse_matrix_market(tiny_mtx_text)
    assert mm.object == "matrix"
    assert mm.format == "coordinate"
    assert mm.field == "real"
    assert mm.symmetry == "general"
    assert (mm.num_rows, mm.num_columns, mm.num_entries) == (4, 5, 7)
    np.testing.assert_array_equal(mm.row_indices(), [1, 1, 2, 3, 4, 4, 4])
    np.testing.assert_array_equal(mm.column_indices(), [1, 2, 2, 3, 1, 4, 5])
    np.testing.assert_allclose(
        mm.values_real(), [1.0, 2.0, 1.0, 3.0, -1.0, 2.0, 1.0]
    )


def test_parse_pattern_field():
    text = (
        "%%MatrixMarket matrix coordinate pattern general\n"
        "2 2 3\n1 1\n1 2\n2 2\n"
    )
    mm = parse_matrix_market(text)
    assert mm.field == "pattern"
    np.testing.assert_allclose(mm.values_real(), [1.0, 1.0, 1.0])


def test_parse_integer_field():
    text = (
        "%%MatrixMarket matrix coordinate integer general\n"
        "2 2 2\n1 1 5\n2 2 -3\n"
    )
    mm = parse_matrix_market(text)
    np.testing.assert_allclose(mm.values_real(), [5.0, -3.0])


def test_parse_complex_field():
    text = (
        "%%MatrixMarket matrix coordinate complex general\n"
        "2 2 2\n1 1 1.5 2.5\n2 2 -3.0 0.5\n"
    )
    mm = parse_matrix_market(text)
    np.testing.assert_allclose(mm.values_real(), [1.5, -3.0])
    np.testing.assert_allclose(mm.values_imag, [2.5, 0.5])


def test_parse_array_format():
    text = "%%MatrixMarket matrix array real general\n2 2\n1\n2\n3\n4\n"
    mm = parse_matrix_market(text)
    assert mm.num_entries == 4
    # column-major: entries (1,1)=1 (2,1)=2 (1,2)=3 (2,2)=4
    np.testing.assert_array_equal(mm.row_indices(), [1, 2, 1, 2])
    np.testing.assert_array_equal(mm.column_indices(), [1, 1, 2, 2])


def test_invalid_header_rejected():
    with pytest.raises(MatrixError):
        parse_matrix_market("%%NotMatrixMarket matrix coordinate real general\n1 1 0\n")
    with pytest.raises(MatrixError):
        parse_matrix_market("%%MatrixMarket matrix coordinate real bogus\n1 1 0\n")


def test_out_of_bounds_index_rejected():
    text = "%%MatrixMarket matrix coordinate real general\n2 2 1\n3 1 1.0\n"
    with pytest.raises(MatrixError):
        parse_matrix_market(text)


def test_truncated_entries_rejected():
    text = "%%MatrixMarket matrix coordinate real general\n2 2 2\n1 1 1.0\n"
    with pytest.raises(MatrixError):
        parse_matrix_market(text)


def test_symmetric_not_expanded_by_default():
    # Reference parity: symmetry parsed but not expanded (SURVEY.md L2a).
    text = (
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "2 2 2\n1 1 1.0\n2 1 3.0\n"
    )
    mm = parse_matrix_market(text)
    assert mm.num_entries == 2
    expanded = parse_matrix_market(text, expand_symmetry=True)
    assert expanded.num_entries == 3
    assert expanded.symmetry == "general"
    d = np.zeros((2, 2))
    d[expanded.rows_1based - 1, expanded.cols_1based - 1] = expanded.values
    np.testing.assert_allclose(d, [[1.0, 3.0], [3.0, 0.0]])


def test_skew_symmetric_expansion():
    text = (
        "%%MatrixMarket matrix coordinate real skew-symmetric\n"
        "2 2 1\n2 1 3.0\n"
    )
    mm = parse_matrix_market(text, expand_symmetry=True)
    d = np.zeros((2, 2))
    d[mm.rows_1based - 1, mm.cols_1based - 1] = mm.values
    np.testing.assert_allclose(d, [[0.0, -3.0], [3.0, 0.0]])


def test_sort_row_major(tiny_mtx_text):
    mm = parse_matrix_market(tiny_mtx_text)
    shuffled = mm._permuted_entries(np.random.default_rng(0).permutation(7))
    s = shuffled.sorted_row_major()
    np.testing.assert_array_equal(s.row_indices(), [1, 1, 2, 3, 4, 4, 4])
    np.testing.assert_array_equal(s.column_indices(), [1, 2, 2, 3, 1, 4, 5])


def test_row_lengths(tiny_mtx_text):
    mm = parse_matrix_market(tiny_mtx_text)
    np.testing.assert_array_equal(mm.row_lengths(), [2, 1, 1, 3])
    assert mm.max_row_length() == 3


def test_permute_square():
    mm = poisson2d(5, 5)
    rng = np.random.default_rng(1)
    p = rng.permutation(mm.num_rows)
    permuted = mm.permute(p)
    # Dense matrices must agree: D'[p[i], p[j]] == D[i, j].
    d = np.zeros((25, 25))
    d[mm.rows_1based - 1, mm.cols_1based - 1] = mm.values
    dp = np.zeros((25, 25))
    dp[permuted.rows_1based - 1, permuted.cols_1based - 1] = permuted.values
    np.testing.assert_allclose(dp[np.ix_(p, p)], d)


def test_load_matrix_gz_and_targz(tiny_mtx_text, tmp_path):
    # .mtx
    plain = tmp_path / "tiny.mtx"
    plain.write_text(tiny_mtx_text)
    mm = load_matrix(plain)
    assert mm.num_entries == 7

    # .gz (reference: load_gz_matrix, matrix-market.cpp:738-751)
    gz = tmp_path / "tiny.mtx.gz"
    with gzip.open(gz, "wt") as f:
        f.write(tiny_mtx_text)
    mm = load_matrix(gz)
    assert mm.num_entries == 7

    # SuiteSparse .tar.gz with member stem/stem.mtx
    # (reference: load_targz_matrix, matrix-market.cpp:753-775)
    tgz = tmp_path / "tiny.tar.gz"
    data = tiny_mtx_text.encode()
    with tarfile.open(tgz, "w:gz") as tf:
        info = tarfile.TarInfo("tiny/tiny.mtx")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    mm = load_matrix(tgz)
    assert mm.num_entries == 7


def test_load_matrix_rcm_suffix(tmp_path):
    mm = poisson2d(8, 8)
    path = tmp_path / "p2d.mtx"
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{mm.num_rows} {mm.num_columns} {mm.num_entries}\n")
        for i, j, v in zip(mm.rows_1based, mm.cols_1based, mm.values):
            f.write(f"{i} {j} {v}\n")
    loaded = load_matrix(str(path) + "__RCM")
    assert loaded.num_entries == mm.num_entries
    # The permutation must preserve the multiset of values.
    np.testing.assert_allclose(
        np.sort(loaded.values), np.sort(mm.values)
    )


def test_write_expands_symmetry_and_preserves_comments():
    # ADVICE r1: a still-folded symmetric matrix must not lose its
    # mirrored half on round trip, and '%' comments must not double.
    from spmv_tpu.io.matrix_market import write_matrix_market

    text = (
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "% a comment\n"
        "2 2 2\n1 1 1.0\n2 1 3.0\n"
    )
    mm = parse_matrix_market(text)  # expand_symmetry=False default
    buf = io.StringIO()
    write_matrix_market(mm, buf)
    back = parse_matrix_market(buf.getvalue())
    d0 = np.zeros((2, 2))
    np.add.at(d0, (back.rows_1based - 1, back.cols_1based - 1),
              back.values)
    np.testing.assert_allclose(d0, [[1.0, 3.0], [3.0, 0.0]])
    # one round trip more: comments stay stable, no '%%' growth
    buf2 = io.StringIO()
    write_matrix_market(back, buf2)
    assert buf2.getvalue().count("% a comment") == 1
    assert "%% a comment" not in buf2.getvalue()


def test_array_symmetric_lower_triangle():
    """Non-general array files store only the lower triangle (MM
    spec); round-2 review found them rejected outright."""
    from spmv_tpu.io import parse_matrix_market

    text = ("%%MatrixMarket matrix array real symmetric\n"
            "2 2\n1.0\n2.0\n3.0\n")
    mm = parse_matrix_market(text, expand_symmetry=True)
    dense = np.zeros((2, 2))
    np.add.at(dense, (mm.rows_1based - 1, mm.cols_1based - 1),
              mm.values)
    np.testing.assert_allclose(dense, [[1.0, 2.0], [2.0, 3.0]])

    # skew-symmetric arrays omit the diagonal
    text = ("%%MatrixMarket matrix array real skew-symmetric\n"
            "2 2\n5.0\n")
    mm = parse_matrix_market(text, expand_symmetry=True)
    dense = np.zeros((2, 2))
    np.add.at(dense, (mm.rows_1based - 1, mm.cols_1based - 1),
              mm.values)
    np.testing.assert_allclose(dense, [[0.0, -5.0], [5.0, 0.0]])


def test_int32_dimension_guard():
    from spmv_tpu.io import parse_matrix_market

    with pytest.raises(MatrixError):
        parse_matrix_market(
            "%%MatrixMarket matrix coordinate real general\n"
            "3000000000 10 1\n1 1 1.0\n"
        )
