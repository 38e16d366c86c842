"""Native (C++) WELL packer vs the pure Python packer: bit-identical.

The native core (csrc/wellpack.cpp) mirrors WellMatrix._pack_py; these
tests pin that equivalence on structured, random and spill-heavy
matrices, and check that the default build path routes through the
native packer when available.
"""

import numpy as np
import pytest

from spmv_tpu.io.generate import poisson2d, random_sparse
from spmv_tpu.models import WellMatrix
from spmv_tpu.models import _well_native
from spmv_tpu.models._convert import sorted_entries_0based

pytestmark = pytest.mark.skipif(
    not _well_native.available(), reason="no native wellpack"
)


def _both(mm, window_rows, max_rounds=4):
    rows, cols, vals, row_ptr = sorted_entries_0based(mm)
    wn = WellMatrix._build(
        mm.num_rows, mm.num_columns, row_ptr, cols, vals,
        window_rows, max_rounds, use_native=True,
    )
    wp = WellMatrix._build(
        mm.num_rows, mm.num_columns, row_ptr, cols, vals,
        window_rows, max_rounds, use_native=False,
    )
    return wn, wp


@pytest.mark.parametrize(
    "mm,wr",
    [
        (poisson2d(13, 17), 2),
        (poisson2d(40, 40), 2),
        (random_sparse(300, 300, 6, seed=4), 1),
        (random_sparse(900, 500, 9, seed=5), 2),
    ],
    ids=["poisson-small", "poisson-mid", "random-spilly", "random-rect"],
)
def test_native_matches_python(mm, wr):
    wn, wp = _both(mm, wr)
    np.testing.assert_array_equal(wn.value, wp.value)
    np.testing.assert_array_equal(wn.local_index, wp.local_index)
    np.testing.assert_array_equal(wn.window_start, wp.window_start)
    np.testing.assert_array_equal(wn.group_of_chunk, wp.group_of_chunk)
    assert (wn.spill is None) == (wp.spill is None)
    if wn.spill is not None:
        np.testing.assert_array_equal(wn.spill.row_ptr, wp.spill.row_ptr)
        np.testing.assert_array_equal(
            wn.spill.column_index, wp.spill.column_index
        )
        np.testing.assert_array_equal(wn.spill.value, wp.spill.value)


def test_default_path_is_native_and_correct():
    mm = poisson2d(20, 20)
    w = WellMatrix.from_matrix_market(mm, window_rows=2)
    x = np.random.default_rng(0).standard_normal(mm.num_columns)
    dense = np.zeros((mm.num_rows, mm.num_columns))
    np.add.at(dense, (mm.rows_1based - 1, mm.cols_1based - 1), mm.values)
    np.testing.assert_allclose(w.spmv(x), dense @ x, atol=1e-10)
