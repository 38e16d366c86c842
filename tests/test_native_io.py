"""Native (C++) parser vs Python parser equivalence."""

import gzip
import io
import tarfile

import numpy as np
import pytest

from spmv_tpu.io import parse_matrix_market
from spmv_tpu.io import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="no native mmparse"
)


def write_fixtures(tmp_path, text):
    plain = tmp_path / "m.mtx"
    plain.write_text(text)
    gz = tmp_path / "m.mtx.gz"
    with gzip.open(gz, "wt") as f:
        f.write(text)
    tgz = tmp_path / "m.tar.gz"
    data = text.encode()
    with tarfile.open(tgz, "w:gz") as tf:
        info = tarfile.TarInfo("m/m.mtx")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    return plain, gz, tgz


def test_native_matches_python(tiny_mtx_text, tmp_path):
    py = parse_matrix_market(tiny_mtx_text)
    for path in write_fixtures(tmp_path, tiny_mtx_text):
        mm = native.load_matrix_native(path)
        assert (mm.num_rows, mm.num_columns, mm.num_entries) == (
            py.num_rows, py.num_columns, py.num_entries,
        )
        np.testing.assert_array_equal(mm.rows_1based, py.rows_1based)
        np.testing.assert_array_equal(mm.cols_1based, py.cols_1based)
        np.testing.assert_allclose(mm.values, py.values)


def test_native_pattern_and_symmetric(tmp_path):
    text = (
        "%%MatrixMarket matrix coordinate pattern symmetric\n"
        "% c\n3 3 3\n1 1\n2 1\n3 2\n"
    )
    path = tmp_path / "p.mtx"
    path.write_text(text)
    mm = native.load_matrix_native(path)
    assert mm.field == "pattern"
    assert mm.symmetry == "symmetric"
    np.testing.assert_allclose(mm.values, 1.0)
    expanded = native.load_matrix_native(path, expand_symmetry=True)
    assert expanded.num_entries == 5


def test_native_error_reporting(tmp_path):
    from spmv_tpu.errors import MatrixError

    bad = tmp_path / "bad.mtx"
    bad.write_text("not a matrix\n")
    with pytest.raises(MatrixError):
        native.load_matrix_native(bad)


def test_native_reference_poisson2d(reference_poisson2d, tmp_path):
    mtx, b, expected = reference_poisson2d
    path = tmp_path / "poisson2D.mtx"
    path.write_text(mtx)
    mm = native.load_matrix_native(path)
    from spmv_tpu.models import CsrMatrix

    y = CsrMatrix.from_matrix_market(mm).spmv(b)
    assert np.linalg.norm(y - expected) < 1e-12
