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
from spmv_tpu.models import (
    CooMatrix,
    CsrMatrix,
    DiaMatrix,
    EllMatrix,
    HybridMatrix,
    WellMatrix,
)


@pytest.mark.parametrize(
    "fmt",
    [
        CooMatrix.from_matrix_market,
        CsrMatrix.from_matrix_market,
        EllMatrix.from_matrix_market,
        lambda mm: EllMatrix.from_matrix_market(mm, skip_padding=True),
        HybridMatrix.from_matrix_market,
        DiaMatrix.from_matrix_market,
        WellMatrix.from_matrix_market,
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


@pytest.mark.slow
def test_poisson2d_device_paths_match_reference(reference_poisson2d):
    """fp64 device (XLA) and Pallas-interpret paths vs the reference's
    expected product, same l2 gate as test_csr-matrix.cpp:105-116."""
    import jax.numpy as jnp

    from spmv_tpu.models.device import (
        DeviceDia,
        DeviceWell,
        device_put_matrix,
    )
    from spmv_tpu.ops import dia_spmv, spmv, well_spmv

    mtx, b, expected = reference_poisson2d
    mm = parse_matrix_market(mtx)
    bj = jnp.asarray(b)

    for fmt in (CooMatrix, CsrMatrix, EllMatrix, HybridMatrix,
                DiaMatrix, WellMatrix):
        A = device_put_matrix(fmt.from_matrix_market(mm))
        y = np.asarray(spmv(A, bj))
        assert np.linalg.norm(y - expected) < 1e-12, fmt

    Ad = DeviceDia.from_host(DiaMatrix.from_matrix_market(mm))
    y = np.asarray(dia_spmv(Ad, bj, tile_rows=8, interpret=True))
    assert np.linalg.norm(y - expected) < 1e-12

    Aw = DeviceWell.from_host(WellMatrix.from_matrix_market(mm))
    y = np.asarray(well_spmv(Aw, bj, interpret=True))
    assert np.linalg.norm(y - expected) < 1e-12
