"""DIA format + Pallas stencil kernel tests.

The DIA format is the TPU-native addition (no reference counterpart;
see spmv_tpu/models/dia.py docstring).  Correctness gates:
- host DiaMatrix.spmv vs dense fp64 ground truth,
- device XLA path (ops.spmv on DeviceDia) vs host,
- Pallas kernel (interpret mode on CPU) vs the XLA path, bit-for-bit
  in fp32 and to fp64 tolerance vs host.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import CsrMatrix, DiaMatrix
from spmv_tpu.models.device import DeviceDia, device_put_matrix
from spmv_tpu.ops import dia_spmv, spmv
from spmv_tpu.errors import MatrixError


def _banded(n, m, offsets, seed=0):
    """Random matrix with the given diagonals, as (dia, dense)."""
    rng = np.random.default_rng(seed)
    dense = np.zeros((n, m))
    rows, cols, vals = [], [], []
    for off in offsets:
        lo, hi = max(0, -off), min(n, m - off)
        for i in range(lo, hi):
            if rng.random() < 0.8:
                v = rng.standard_normal()
                dense[i, i + off] = v
                rows.append(i)
                cols.append(i + off)
                vals.append(v)
    dia = DiaMatrix._from_coo(n, m, np.array(rows), np.array(cols),
                              np.array(vals), None)
    return dia, dense


def test_host_dia_matches_dense():
    dia, dense = _banded(37, 41, [-7, -1, 0, 2, 5])
    x = np.random.default_rng(1).standard_normal(41)
    np.testing.assert_allclose(dia.spmv(x), dense @ x, atol=1e-12)
    np.testing.assert_allclose(dia.to_dense(), dense, atol=0)
    assert dia.num_diagonals == 5


def test_from_matrix_market_poisson():
    mm = poisson2d(9, 11)
    dia = DiaMatrix.from_matrix_market(mm)
    csr = CsrMatrix.from_matrix_market(mm)
    x = np.random.default_rng(2).standard_normal(mm.num_columns)
    y_csr = np.zeros(mm.num_rows)
    for i in range(mm.num_rows):
        s, e = csr.row_ptr[i], csr.row_ptr[i + 1]
        y_csr[i] = (csr.value[s:e] * x[csr.column_index[s:e]]).sum()
    np.testing.assert_allclose(dia.spmv(x), y_csr, atol=1e-12)
    assert set(dia.offsets) == {-9, -1, 0, 1, 9}
    assert dia.num_entries == mm.num_entries


def test_from_csr_and_guards():
    mm = poisson2d(6, 6)
    csr = CsrMatrix.from_matrix_market(mm)
    dia = DiaMatrix.from_csr(csr)
    assert dia.num_entries == csr.num_entries
    with pytest.raises(MatrixError):
        DiaMatrix.from_csr(CsrMatrix.from_matrix_market(mm, row_alignment=4))
    with pytest.raises(MatrixError):
        DiaMatrix.from_matrix_market(mm, max_diagonals=3)
    assert dia.fill_ratio >= 1.0


def test_device_xla_path_matches_host():
    mm = poisson2d(13, 17)
    dia = DiaMatrix.from_matrix_market(mm)
    A = device_put_matrix(dia)
    assert isinstance(A, DeviceDia)
    x = np.random.default_rng(3).standard_normal(mm.num_columns)
    y = np.asarray(spmv(A, jnp.asarray(x)))
    np.testing.assert_allclose(y, dia.spmv(x), rtol=1e-12)


@pytest.mark.parametrize("shape", [(13, 17), (4, 4), (30, 30)])
def test_pallas_interpret_matches_xla(shape):
    mm = poisson2d(*shape)
    dia = DiaMatrix.from_matrix_market(mm)
    A = DeviceDia.from_host(dia, dtype=jnp.float32)
    x = np.random.default_rng(4).standard_normal(mm.num_columns)
    xj = jnp.asarray(x, jnp.float32)
    y_pallas = np.asarray(dia_spmv(A, xj, tile_rows=8, interpret=True))
    y_xla = np.asarray(spmv(A, xj))
    np.testing.assert_array_equal(y_pallas.shape, (mm.num_rows,))
    np.testing.assert_allclose(y_pallas, y_xla, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(y_pallas, dia.spmv(x), rtol=1e-4, atol=1e-4)


def test_pallas_interpret_large_offsets():
    # Offsets spanning multiple sublane rows in both directions,
    # including |off| > LANE and off % LANE == 0.
    n = 600
    dia, dense = _banded(n, n, [-256, -129, -128, -3, 0, 1, 127, 128, 300],
                         seed=7)
    A = DeviceDia.from_host(dia, dtype=jnp.float32)
    x = np.random.default_rng(5).standard_normal(n)
    y = np.asarray(dia_spmv(A, jnp.asarray(x, jnp.float32),
                            tile_rows=8, interpret=True))
    np.testing.assert_allclose(y, dense @ x, rtol=1e-4, atol=1e-4)


def test_pallas_fp64_interpret():
    mm = poisson2d(10, 10)
    dia = DiaMatrix.from_matrix_market(mm)
    A = DeviceDia.from_host(dia)  # fp64 under x64 tests
    x = np.random.default_rng(6).standard_normal(mm.num_columns)
    y = np.asarray(dia_spmv(A, jnp.asarray(x), tile_rows=8, interpret=True))
    np.testing.assert_allclose(y, dia.spmv(x), rtol=1e-12)


def test_pallas_spmm_interpret_matches_host():
    from spmv_tpu.ops.pallas_kernels import dia_spmm

    mm = poisson2d(13, 17)
    dia = DiaMatrix.from_matrix_market(mm)
    A = DeviceDia.from_host(dia, dtype=jnp.float32)
    X = np.random.default_rng(11).standard_normal(
        (mm.num_columns, 3)
    ).astype(np.float32)
    Y = np.asarray(dia_spmm(A, jnp.asarray(X), tile_rows=8,
                            interpret=True))
    want = np.stack([dia.spmv(X[:, j].astype(np.float64))
                     for j in range(3)], axis=1)
    assert Y.shape == (mm.num_rows, 3)
    np.testing.assert_allclose(Y, want, rtol=1e-4, atol=1e-4)


def test_in_place_chained_matches_out_of_place():
    # In-place (aliased x/y buffer, probe 24) must be bit-identical to
    # the classic double-buffered path, including across chained
    # iterations where the alias reuses the previous output buffer.
    # Offsets reach close to the guard boundary (smin_row = -w).
    n = 2100
    w = 8
    dia, dense = _banded(n, n, [-(w * 128 - 5), -130, -1, 0, 3, 128],
                         seed=9)
    from spmv_tpu.ops.pallas_kernels import (
        dia_spmv_core, dia_prepare_x, dia_extract_y, make_plan,
        _dia_in_place_ok,
    )
    A = DeviceDia.from_host(dia, dtype=jnp.float32)
    plan = make_plan(A, w)
    assert _dia_in_place_ok(plan) and plan.smin_row < 0
    x = np.random.default_rng(8).standard_normal(n)
    v_ip = v_op = dia_prepare_x(A, jnp.asarray(x, jnp.float32), w)
    for _ in range(3):
        v_ip = dia_spmv_core(A, v_ip, w, interpret=True, in_place=True)
        v_op = dia_spmv_core(A, v_op, w, interpret=True, in_place=False)
    np.testing.assert_array_equal(np.asarray(v_ip), np.asarray(v_op))
    want = dense @ (dense @ (dense @ x))
    np.testing.assert_allclose(
        np.asarray(dia_extract_y(A, v_ip, w)), want, rtol=2e-3, atol=2e-3)


def test_in_place_guard():
    # smin_row < -tile_rows: auto must fall back, explicit must raise.
    n = 3000
    w = 8
    dia, dense = _banded(n, n, [-(w * 128 + 200), 0, 1], seed=10)
    from spmv_tpu.ops.pallas_kernels import (
        dia_spmv_core, dia_prepare_x, dia_extract_y, make_plan,
        _dia_in_place_ok,
    )
    A = DeviceDia.from_host(dia, dtype=jnp.float32)
    assert not _dia_in_place_ok(make_plan(A, w))
    x = np.random.default_rng(12).standard_normal(n)
    x2d = dia_prepare_x(A, jnp.asarray(x, jnp.float32), w)
    y = dia_spmv_core(A, x2d, w, interpret=True)  # auto fallback
    np.testing.assert_allclose(
        np.asarray(dia_extract_y(A, y, w)), dense @ x,
        rtol=1e-4, atol=1e-4)
    with pytest.raises(MatrixError):
        dia_spmv_core(A, x2d, w, interpret=True, in_place=True)


def test_in_place_spmm_chained_matches():
    from spmv_tpu.ops.pallas_kernels import (
        dia_spmm_core, dia_prepare_X, dia_extract_Y,
    )
    n = 1800
    w = 8
    dia, dense = _banded(n, n, [-700, -128, 0, 2, 260], seed=13)
    A = DeviceDia.from_host(dia, dtype=jnp.float32)
    X = np.random.default_rng(14).standard_normal((n, 3)).astype(
        np.float32)
    v_ip = v_op = dia_prepare_X(A, jnp.asarray(X), w)
    for _ in range(2):
        v_ip = dia_spmm_core(A, v_ip, w, interpret=True, in_place=True)
        v_op = dia_spmm_core(A, v_op, w, interpret=True, in_place=False)
    np.testing.assert_array_equal(np.asarray(v_ip), np.asarray(v_op))
    want = dense.astype(np.float64) @ (dense.astype(np.float64) @ X)
    np.testing.assert_allclose(
        np.asarray(dia_extract_Y(A, v_ip, w)), want, rtol=2e-3,
        atol=2e-3)
