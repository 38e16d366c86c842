"""IC(0)/ILU(0) factorizations, level-scheduled triangular solves,
and the BiCGSTAB solver (ops.incomplete, ops.solvers.bicgstab).

Correctness anchors:
- IC(0): (L L^T)_ij == A_ij on A's lower pattern (the defining
  property of the incomplete factor), L lower-triangular with
  positive diagonal.
- ILU(0): (L U)_ij == A_ij on A's pattern, unit-diagonal L.
- Level solve == dense ``np.linalg.solve`` on the factor.
- Jacobi-sweep solve == exact after num_levels sweeps.
- PCG with IC(0) converges in fewer iterations than plain CG and
  Jacobi-PCG on the 2-D Laplacian.
- BiCGSTAB solves a non-symmetric system plain and ILU-preconditioned
  (fewer iterations with ILU).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spmv_tpu.errors import MatrixError
from spmv_tpu.io.generate import poisson2d, random_sparse
from spmv_tpu.models import CsrMatrix
from spmv_tpu.models.device import DeviceCsr
from spmv_tpu.ops import (
    DeviceTriSolve,
    bicgstab,
    conjugate_gradient,
    extract_diagonal,
    ic0_factor,
    ic0_preconditioner,
    ilu0_factor,
    ilu0_preconditioner,
    jacobi_preconditioner,
    preconditioned_conjugate_gradient,
    spmv,
    tri_solve_sweeps,
)
from spmv_tpu.ops.incomplete import _transpose_csr, build_level_schedule


def _dense(m: CsrMatrix) -> np.ndarray:
    A = np.zeros((m.num_rows, m.num_columns))
    for i in range(m.num_rows):
        for k in range(m.row_ptr[i], m.row_ptr[i + 1]):
            A[i, m.column_index[k]] += m.value[k]
    return A


def _nonsym_diag_dominant(n, seed=0):
    """Random sparse strictly diagonally dominant non-symmetric CSR."""
    mm = random_sparse(n, n, 4, seed=seed)
    m = CsrMatrix.from_matrix_market(mm)
    A = _dense(m)
    np.fill_diagonal(A, np.abs(A).sum(axis=1) + 1.0)
    rows, cols = np.nonzero(A)
    rp = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=rp[1:])
    return CsrMatrix(n, n, rows.size, 1, rp, cols.astype(np.int32),
                     A[rows, cols])


# ----------------------------------------------------------- factorization

def test_ic0_pattern_identity():
    m = CsrMatrix.from_matrix_market(poisson2d(7, 6))
    L = ic0_factor(m)
    Ld = _dense(L)
    assert np.allclose(Ld, np.tril(Ld))
    assert (np.diag(Ld) > 0).all()
    # (L L^T) matches A exactly on the lower pattern
    A = _dense(m)
    M = Ld @ Ld.T
    for i in range(m.num_rows):
        for k in range(m.row_ptr[i], m.row_ptr[i + 1]):
            j = m.column_index[k]
            if j <= i:
                np.testing.assert_allclose(M[i, j], A[i, j],
                                           rtol=1e-12, atol=1e-12)


def test_ic0_full_pattern_is_exact_cholesky():
    # On a dense-pattern SPD matrix, IC(0) == complete Cholesky.
    rng = np.random.default_rng(1)
    n = 12
    B = rng.standard_normal((n, n))
    A = B @ B.T + n * np.eye(n)
    rows, cols = np.nonzero(np.ones_like(A))
    rp = np.arange(n + 1, dtype=np.int64) * n
    m = CsrMatrix(n, n, n * n, 1, rp, cols.astype(np.int32),
                  A[rows, cols])
    L = ic0_factor(m)
    np.testing.assert_allclose(_dense(L), np.linalg.cholesky(A),
                               rtol=1e-10, atol=1e-12)


def test_ic0_nonpositive_pivot_and_shift():
    # An indefinite matrix must raise; the Manteuffel shift must save a
    # barely-SPD-violating one.
    n = 4
    A = np.diag([1.0, 1.0, 1.0, 1.0])
    A[0, 1] = A[1, 0] = 2.0   # indefinite
    rows, cols = np.nonzero(A)
    rp = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=rp[1:])
    m = CsrMatrix(n, n, rows.size, 1, rp, cols.astype(np.int32),
                  A[rows, cols])
    with pytest.raises(MatrixError):
        ic0_factor(m)
    L = ic0_factor(m, shift=4.0)    # diag*(1+4) = 5 > 4
    assert (np.diag(_dense(L)) > 0).all()


def test_ilu0_pattern_identity():
    m = _nonsym_diag_dominant(40, seed=2)
    L, U = ilu0_factor(m)
    Ld = _dense(L) + np.eye(m.num_rows)
    Ud = _dense(U)
    assert np.allclose(Ud, np.triu(Ud))
    A = _dense(m)
    M = Ld @ Ud
    for i in range(m.num_rows):
        for k in range(m.row_ptr[i], m.row_ptr[i + 1]):
            j = m.column_index[k]
            np.testing.assert_allclose(M[i, j], A[i, j],
                                       rtol=1e-10, atol=1e-12)


def test_ilu0_dense_pattern_is_exact_lu():
    m = _nonsym_diag_dominant(10, seed=3)
    A = _dense(m)
    rows, cols = np.nonzero(np.ones_like(A))
    n = m.num_rows
    rp = np.arange(n + 1, dtype=np.int64) * n
    md = CsrMatrix(n, n, n * n, 1, rp, cols.astype(np.int32),
                   A[rows, cols])
    L, U = ilu0_factor(md)
    Ld = _dense(L) + np.eye(n)
    np.testing.assert_allclose(Ld @ _dense(U), A, rtol=1e-10,
                               atol=1e-10)


# ------------------------------------------------------------ level solve

def test_level_schedule_respects_dependencies():
    m = CsrMatrix.from_matrix_market(poisson2d(6, 6))
    L = ic0_factor(m)
    rp = np.asarray(L.row_ptr)
    cols = np.asarray(L.column_index)
    levels = build_level_schedule(rp, cols, L.num_rows, lower=True)
    lvl_of = np.empty(L.num_rows, dtype=int)
    for l, rows in enumerate(levels):
        lvl_of[rows] = l
    for i in range(L.num_rows):
        for k in range(rp[i], rp[i + 1]):
            j = cols[k]
            if j < i:
                assert lvl_of[j] < lvl_of[i]


@pytest.mark.parametrize("lower", [True, False])
def test_tri_solve_matches_dense(lower):
    m = CsrMatrix.from_matrix_market(poisson2d(6, 5))
    L = ic0_factor(m)
    T = L if lower else _transpose_csr(L)
    dev = DeviceTriSolve.from_host(T, lower=lower)
    rng = np.random.default_rng(4)
    b = rng.standard_normal(m.num_rows)
    z = np.asarray(dev.solve(jnp.asarray(b)))
    want = np.linalg.solve(_dense(T), b)
    np.testing.assert_allclose(z, want, rtol=1e-10, atol=1e-12)


def test_tri_solve_unit_diag():
    m = _nonsym_diag_dominant(30, seed=5)
    L, U = ilu0_factor(m)
    dev = DeviceTriSolve.from_host(L, lower=True, unit_diag=True)
    rng = np.random.default_rng(6)
    b = rng.standard_normal(m.num_rows)
    z = np.asarray(dev.solve(jnp.asarray(b)))
    want = np.linalg.solve(_dense(L) + np.eye(m.num_rows), b)
    np.testing.assert_allclose(z, want, rtol=1e-10, atol=1e-12)


def test_sweeps_exact_at_num_levels():
    m = CsrMatrix.from_matrix_market(poisson2d(5, 5))
    L = ic0_factor(m)
    dev = DeviceTriSolve.from_host(L, lower=True)
    rng = np.random.default_rng(7)
    b = rng.standard_normal(m.num_rows)
    want = np.linalg.solve(_dense(L), b)
    z = np.asarray(tri_solve_sweeps(dev, jnp.asarray(b),
                                    dev.num_levels))
    np.testing.assert_allclose(z, want, rtol=1e-10, atol=1e-12)
    # a truncated sweep count is an approximation, not garbage
    z3 = np.asarray(tri_solve_sweeps(dev, jnp.asarray(b), 3))
    assert np.linalg.norm(z3 - want) < np.linalg.norm(want)


# ---------------------------------------------------------------- PCG / BiCGSTAB

def test_ic0_pcg_beats_cg_and_jacobi():
    m = CsrMatrix.from_matrix_market(poisson2d(24, 24))
    A = DeviceCsr.from_host(m)
    rng = np.random.default_rng(8)
    b = jnp.asarray(rng.standard_normal(m.num_rows))

    def mv(v):
        return spmv(A, v)

    plain = conjugate_gradient(mv, b, tol=1e-8, max_iterations=2000)
    jac = preconditioned_conjugate_gradient(
        mv, b, jacobi_preconditioner(
            jnp.asarray(extract_diagonal(m))),
        tol=1e-8, max_iterations=2000)

    Lf = ic0_factor(m)
    pre, info = ic0_preconditioner(Lf)
    ic = preconditioned_conjugate_gradient(
        mv, b, pre, tol=1e-8, max_iterations=2000)

    xd = np.linalg.solve(_dense(m), np.asarray(b))
    np.testing.assert_allclose(np.asarray(ic.x), xd, rtol=1e-5,
                               atol=1e-7)
    assert int(ic.iterations) < int(plain.iterations)
    assert int(ic.iterations) < int(jac.iterations)
    assert info["levels_forward"] > 1


def test_ic0_sweeps_preconditioner_converges():
    m = CsrMatrix.from_matrix_market(poisson2d(16, 16))
    A = DeviceCsr.from_host(m)
    rng = np.random.default_rng(9)
    b = jnp.asarray(rng.standard_normal(m.num_rows))
    Lf = ic0_factor(m)
    pre, info = ic0_preconditioner(Lf, method="sweeps", sweeps=8)
    res = preconditioned_conjugate_gradient(
        lambda v: spmv(A, v), b, pre, tol=1e-8, max_iterations=2000)
    xd = np.linalg.solve(_dense(m), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), xd, rtol=1e-5,
                               atol=1e-7)
    assert info["method"] == "sweeps"


def test_bicgstab_nonsymmetric():
    m = _nonsym_diag_dominant(120, seed=10)
    A = DeviceCsr.from_host(m)
    rng = np.random.default_rng(11)
    b = jnp.asarray(rng.standard_normal(m.num_rows))

    def mv(v):
        return spmv(A, v)

    plain = bicgstab(mv, b, tol=1e-10, max_iterations=500)
    xd = np.linalg.solve(_dense(m), np.asarray(b))
    np.testing.assert_allclose(np.asarray(plain.x), xd, rtol=1e-6,
                               atol=1e-8)

    L, U = ilu0_factor(m)
    pre, _ = ilu0_preconditioner(L, U)
    il = bicgstab(mv, b, preconditioner=pre, tol=1e-10,
                  max_iterations=500)
    np.testing.assert_allclose(np.asarray(il.x), xd, rtol=1e-6,
                               atol=1e-8)
    assert int(il.iterations) <= int(plain.iterations)


def test_bicgstab_solves_spd_too():
    m = CsrMatrix.from_matrix_market(poisson2d(10, 10))
    A = DeviceCsr.from_host(m)
    rng = np.random.default_rng(12)
    b = jnp.asarray(rng.standard_normal(m.num_rows))
    res = bicgstab(lambda v: spmv(A, v), b, tol=1e-10,
                   max_iterations=1000)
    xd = np.linalg.solve(_dense(m), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), xd, rtol=1e-6,
                               atol=1e-8)


def test_padded_csr_rejected():
    mm = poisson2d(5, 5)
    m = CsrMatrix.from_matrix_market(mm, row_alignment=4)
    with pytest.raises(MatrixError):
        ic0_factor(m)


def test_cli_ic0_and_bicgstab(tmp_path, capsys):
    import json

    from spmv_tpu.cli import main
    from spmv_tpu.io.matrix_market import write_matrix_market

    mm = poisson2d(12, 12)
    path = tmp_path / "a.mtx"
    write_matrix_market(mm, str(path))

    rc = main(["--matrix", str(path), "-s", "csr", "--cg", "500",
               "--precondition", "ic0"])
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["cg"]["preconditioner"] == "ic0"
    assert doc["cg"]["factorization"]["levels_forward"] > 1
    assert doc["cg"]["solution_rms_error_vs_ones"] < 1e-5
    it_ic = doc["cg"]["iterations"]

    rc = main(["--matrix", str(path), "-s", "csr", "--cg", "500"])
    assert rc == 0
    it_plain = json.loads(capsys.readouterr().out)["cg"]["iterations"]
    assert it_ic < it_plain

    rc = main(["--matrix", str(path), "-s", "csr", "--cg", "500",
               "--solver", "bicgstab", "--precondition", "ilu0"])
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["cg"]["solver"] == "bicgstab"
    assert doc["cg"]["solution_rms_error_vs_ones"] < 1e-4


# --------------------------------------------------------- multicoloring

def test_coloring_is_proper_and_collapses_levels():
    from spmv_tpu.models.reorder import find_new_order_coloring

    mm = poisson2d(12, 12)
    order = find_new_order_coloring(mm)
    n = mm.num_rows
    assert sorted(order.tolist()) == list(range(n))

    # proper coloring under the induced color labels: no off-diagonal
    # entry may connect two rows of the same color.  Recover color
    # boundaries from the permuted adjacency: within-color blocks must
    # have no internal edges, which is equivalent to the level test
    # below, so go straight to the operative property — IC(0) of the
    # permuted matrix has as many forward levels as colors.
    pm = mm.permute(order)
    m2 = CsrMatrix.from_matrix_market(pm)
    L = ic0_factor(m2)
    levels = build_level_schedule(
        np.asarray(L.row_ptr), np.asarray(L.column_index),
        L.num_rows, lower=True)
    # 5-point Laplacian is 2-colorable; greedy Welsh-Powell may use a
    # couple more on the degree-ordered sweep, but nothing like the
    # ~2*sqrt(n) levels of the natural order
    natural = build_level_schedule(
        np.asarray(ic0_factor(
            CsrMatrix.from_matrix_market(mm)).row_ptr),
        np.asarray(ic0_factor(
            CsrMatrix.from_matrix_market(mm)).column_index),
        mm.num_rows, lower=True)
    assert len(levels) <= 4
    assert len(natural) >= 12
    # and PCG through the colored factor still converges
    A = DeviceCsr.from_host(m2)
    pre, info = ic0_preconditioner(L)
    rng = np.random.default_rng(13)
    b = jnp.asarray(rng.standard_normal(n))
    res = preconditioned_conjugate_gradient(
        lambda v: spmv(A, v), b, pre, tol=1e-8, max_iterations=2000)
    xd = np.linalg.solve(_dense(m2), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), xd, rtol=1e-5,
                               atol=1e-7)
    assert info["levels_forward"] == len(levels)


def test_cli_reorder_color(tmp_path, capsys):
    import json

    from spmv_tpu.cli import main
    from spmv_tpu.io.matrix_market import write_matrix_market

    mm = poisson2d(10, 10)
    path = tmp_path / "a.mtx"
    write_matrix_market(mm, str(path))
    rc = main(["--matrix", str(path), "-s", "csr", "--cg", "500",
               "--reorder", "color", "--precondition", "ic0"])
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["cg"]["factorization"]["levels_forward"] <= 4
    assert doc["cg"]["solution_rms_error_vs_ones"] < 1e-5


def test_block_tri_solve_matches_dense():
    from spmv_tpu.models.reorder import find_new_order_coloring
    from spmv_tpu.ops.incomplete import BlockTriSolve

    mm = poisson2d(10, 10)
    order = find_new_order_coloring(mm)
    m = CsrMatrix.from_matrix_market(mm.permute(order))
    L = ic0_factor(m)
    fwd = BlockTriSolve.from_host(L, lower=True)
    assert fwd.num_levels <= 4
    rng = np.random.default_rng(14)
    b = rng.standard_normal(m.num_rows)
    z = np.asarray(fwd.solve(jnp.asarray(b)))
    want = np.linalg.solve(_dense(L), b)
    np.testing.assert_allclose(z, want, rtol=1e-10, atol=1e-12)
    # backward triangle through the transpose
    bwd = BlockTriSolve.from_host(_transpose_csr(L), lower=False)
    z2 = np.asarray(bwd.solve(jnp.asarray(b)))
    want2 = np.linalg.solve(_dense(L).T, b)
    np.testing.assert_allclose(z2, want2, rtol=1e-10, atol=1e-12)


def test_block_tri_solve_rejects_noncontiguous():
    from spmv_tpu.ops.incomplete import BlockTriSolve

    m = CsrMatrix.from_matrix_market(poisson2d(8, 8))
    L = ic0_factor(m)
    with pytest.raises(MatrixError):
        BlockTriSolve.from_host(L, lower=True)


def test_auto_method_picks_blocks_when_colored():
    from spmv_tpu.models.reorder import find_new_order_coloring

    mm = poisson2d(10, 10)
    mc = CsrMatrix.from_matrix_market(
        mm.permute(find_new_order_coloring(mm)))
    L = ic0_factor(mc)
    _, info = ic0_preconditioner(L)           # method="auto"
    assert info["method"] == "blocks"
    assert "dia" in info["block_formats"]
    mn = CsrMatrix.from_matrix_market(mm)
    _, info_n = ic0_preconditioner(ic0_factor(mn))
    assert info_n["method"] == "levels"


def test_anisotropic_generator_spd_and_pcg():
    from spmv_tpu.io.generate import anisotropic2d

    mm = anisotropic2d(8, 8, epsilon=50.0)
    m = CsrMatrix.from_matrix_market(mm)
    A = _dense(m)
    np.testing.assert_allclose(A, A.T)
    assert (np.linalg.eigvalsh(A) > 0).all()
    L = ic0_factor(m)
    pre, _ = ic0_preconditioner(L)
    Ad = DeviceCsr.from_host(m)
    rng = np.random.default_rng(15)
    b = jnp.asarray(rng.standard_normal(m.num_rows))
    res = preconditioned_conjugate_gradient(
        lambda v: spmv(Ad, v), b, pre, tol=1e-9, max_iterations=3000)
    np.testing.assert_allclose(np.asarray(res.x),
                               np.linalg.solve(A, np.asarray(b)),
                               rtol=1e-6, atol=1e-8)


def test_native_factor_lockstep():
    # The native csrc/ic0.cpp kernels mirror the Python loops' math;
    # only the sparse-dot reduction order differs (numpy pairwise vs
    # serial accumulation), so agreement is to reduction-order
    # rounding, with identical patterns and identical error behavior.
    from spmv_tpu.ops import _ic_native

    if not _ic_native.available():
        pytest.skip("no native ic0 library / compiler")
    mm = poisson2d(17, 13)
    m = CsrMatrix.from_matrix_market(mm)
    Ln = ic0_factor(m, native=True)
    Lp = ic0_factor(m, native=False)
    np.testing.assert_array_equal(Ln.column_index, Lp.column_index)
    np.testing.assert_allclose(Ln.value, Lp.value, rtol=1e-13,
                               atol=1e-15)

    mg = _nonsym_diag_dominant(60, seed=16)
    Ln_, Un = ilu0_factor(mg, native=True)
    Lp_, Up = ilu0_factor(mg, native=False)
    np.testing.assert_allclose(Ln_.value, Lp_.value, rtol=1e-13,
                               atol=1e-15)
    np.testing.assert_allclose(Un.value, Up.value, rtol=1e-13,
                               atol=1e-15)
    # and the non-positive-pivot path still errors identically
    n = 4
    A = np.diag([1.0, 1.0, 1.0, 1.0])
    A[0, 1] = A[1, 0] = 2.0
    rows, cols = np.nonzero(A)
    rp = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=rp[1:])
    bad = CsrMatrix(n, n, rows.size, 1, rp, cols.astype(np.int32),
                    A[rows, cols])
    with pytest.raises(MatrixError):
        ic0_factor(bad, native=True)
