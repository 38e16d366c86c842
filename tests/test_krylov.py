"""GMRES(m), Chebyshev iteration, and Lanczos spectral bounds
(ops/krylov.py).

Correctness anchors:
- GMRES solves a non-symmetric system to the requested tolerance
  (checked against ``np.linalg.solve``), with restarts smaller than
  the Krylov dimension, and converges in fewer iterations with an
  ILU(0) preconditioner.
- GMRES on an SPD system agrees with CG's solution.
- GMRES terminates in one step when b is an eigenvector direction.
- Lanczos bounds enclose the true spectrum of a small SPD matrix.
- Chebyshev with enclosing bounds matches the direct solve; it is
  inner-product-free, so it also runs over a sharded matvec where
  the only collective is the SpMV halo exchange.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmv_tpu.io.generate import poisson2d, random_sparse
from spmv_tpu.models import CsrMatrix
from spmv_tpu.models.device import DeviceCsr
from spmv_tpu.ops import (
    chebyshev,
    conjugate_gradient,
    gmres,
    ilu0_factor,
    ilu0_preconditioner,
    lanczos_bounds,
    spmv,
)


def _dense(m: CsrMatrix) -> np.ndarray:
    A = np.zeros((m.num_rows, m.num_columns))
    for i in range(m.num_rows):
        for k in range(m.row_ptr[i], m.row_ptr[i + 1]):
            A[i, m.column_index[k]] += m.value[k]
    return A


def _nonsym(n, seed=0):
    mm = random_sparse(n, n, 4, seed=seed)
    m = CsrMatrix.from_matrix_market(mm)
    A = _dense(m)
    np.fill_diagonal(A, np.abs(A).sum(axis=1) + 1.0)
    rows, cols = np.nonzero(A)
    rp = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=rp[1:])
    return CsrMatrix(n, n, rows.size, 1, rp, cols.astype(np.int32),
                     A[rows, cols]), A


def test_gmres_nonsymmetric():
    m, A = _nonsym(120, seed=3)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(120))
    res = gmres(lambda v: spmv(DeviceCsr.from_host(m), v), b, tol=1e-10, restart=30,
                max_iterations=600)
    x_ref = np.linalg.solve(A, np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-7,
                               atol=1e-9)
    r = np.asarray(b) - A @ np.asarray(res.x)
    assert np.linalg.norm(r) <= 1e-9 * np.linalg.norm(np.asarray(b))


def test_gmres_restarted_converges():
    # restart far below the Krylov dimension needed in one cycle
    m, A = _nonsym(150, seed=7)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal(150))
    res = gmres(lambda v: spmv(DeviceCsr.from_host(m), v), b, tol=1e-9, restart=8,
                max_iterations=2000)
    x_ref = np.linalg.solve(A, np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-6,
                               atol=1e-8)
    assert int(res.iterations) > 8   # actually restarted


def test_gmres_ilu0_cuts_iterations():
    m, _ = _nonsym(200, seed=11)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(200))
    mv = lambda v: spmv(DeviceCsr.from_host(m), v)   # noqa: E731
    plain = gmres(mv, b, tol=1e-10, restart=20, max_iterations=2000)
    L, U = ilu0_factor(m)
    pre, _ = ilu0_preconditioner(L, U)
    precond = gmres(mv, b, preconditioner=pre, tol=1e-10, restart=20,
                    max_iterations=2000)
    assert float(precond.residual_norm) <= 1e-9 * float(
        jnp.linalg.norm(b))
    assert int(precond.iterations) < int(plain.iterations)


def test_gmres_spd_matches_cg():
    mm = poisson2d(12, 12)
    m = CsrMatrix.from_matrix_market(mm)
    rng = np.random.default_rng(4)
    b = jnp.asarray(rng.standard_normal(m.num_rows))
    mv = lambda v: spmv(DeviceCsr.from_host(m), v)   # noqa: E731
    g = gmres(mv, b, tol=1e-11, restart=40, max_iterations=2000)
    c = conjugate_gradient(mv, b, tol=1e-11, max_iterations=2000)
    np.testing.assert_allclose(np.asarray(g.x), np.asarray(c.x),
                               rtol=1e-6, atol=1e-8)


def test_gmres_identity_one_step():
    n = 50
    eye = CsrMatrix(n, n, n, 1,
                    np.arange(n + 1, dtype=np.int64),
                    np.arange(n, dtype=np.int32),
                    np.ones(n))
    b = jnp.asarray(np.random.default_rng(5).standard_normal(n))
    res = gmres(lambda v: spmv(DeviceCsr.from_host(eye), v), b, tol=1e-12, restart=10)
    assert int(res.iterations) == 1
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(b),
                               rtol=1e-12)


def test_gmres_rejects_bad_restart():
    b = jnp.ones((4,))
    with pytest.raises(ValueError):
        gmres(lambda v: v, b, restart=0)


def test_lanczos_bounds_enclose_spectrum():
    mm = poisson2d(10, 10)
    m = CsrMatrix.from_matrix_market(mm)
    ew = np.linalg.eigvalsh(_dense(m))
    lo, hi = lanczos_bounds(lambda v: spmv(DeviceCsr.from_host(m), v), m.num_rows,
                            num_steps=60, dtype=jnp.float64)
    assert lo <= ew[0] + 1e-8
    assert hi >= ew[-1] - 1e-8
    assert lo > 0


def test_chebyshev_solves_poisson():
    mm = poisson2d(16, 16)
    m = CsrMatrix.from_matrix_market(mm)
    rng = np.random.default_rng(6)
    x_true = rng.standard_normal(m.num_rows)
    b = jnp.asarray(m.spmv(x_true))
    mv = lambda v: spmv(DeviceCsr.from_host(m), v)   # noqa: E731
    lo, hi = lanczos_bounds(mv, m.num_rows, num_steps=80,
                            dtype=jnp.float64)
    res = chebyshev(mv, b, lo, hi, tol=1e-9, max_iterations=20000,
                    check_every=25)
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-5,
                               atol=1e-7)


def test_chebyshev_rejects_bad_bounds():
    b = jnp.ones((4,))
    with pytest.raises(ValueError):
        chebyshev(lambda v: v, b, -1.0, 2.0)
    with pytest.raises(ValueError):
        chebyshev(lambda v: v, b, 3.0, 2.0)


def test_chebyshev_single_eigenvalue_degenerates_to_exact():
    # A = 2 I: bounds collapse, the recurrence must degenerate to one
    # exact Richardson step instead of dividing by delta = 0
    n = 32
    b = jnp.asarray(np.random.default_rng(7).standard_normal(n))
    res = chebyshev(lambda v: 2.0 * v, b, 2.0, 2.0, tol=1e-12,
                    check_every=1)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(b) / 2.0,
                               rtol=1e-12)


def test_sharded_gmres_and_chebyshev():
    """Both solvers run over a shard_map matvec on the 8-device CPU
    mesh; GMRES basis rows inherit the stacked (shards, rows) layout.
    """
    from spmv_tpu.parallel import (
        make_mesh,
        make_sharded_matvec,
        shard_csr,
        stack_vector,
        unstack_vector,
    )

    mesh = make_mesh(8)
    mm = poisson2d(20, 20)
    host = CsrMatrix.from_matrix_market(mm)
    A = shard_csr(host, 8, mesh=mesh)
    rng = np.random.default_rng(8)
    x_true = rng.standard_normal(mm.num_rows)
    b = host.spmv(x_true)
    bs = stack_vector(b, A, mesh=mesh)
    matvec = make_sharded_matvec(A, mesh)

    res = jax.jit(lambda bv: gmres(matvec, bv, tol=1e-10, restart=25,
                                   max_iterations=3000))(bs)
    x = unstack_vector(res.x, A)
    np.testing.assert_allclose(x, x_true, rtol=1e-6, atol=1e-8)

    v0 = stack_vector(rng.standard_normal(mm.num_rows), A, mesh=mesh)
    lo, hi = lanczos_bounds(matvec, bs.shape, num_steps=60,
                            dtype=bs.dtype, v0=v0)
    res2 = jax.jit(lambda bv: chebyshev(matvec, bv, lo, hi, tol=1e-9,
                                        max_iterations=40000,
                                        check_every=50))(bs)
    x2 = unstack_vector(res2.x, A)
    np.testing.assert_allclose(x2, x_true, rtol=1e-5, atol=1e-7)


def test_cli_gmres_and_chebyshev(tmp_path, capsys):
    import json

    from spmv_tpu.cli import main
    from spmv_tpu.io.matrix_market import write_matrix_market

    mm = poisson2d(12, 12)
    path = tmp_path / "a.mtx"
    write_matrix_market(mm, str(path))

    rc = main(["--matrix", str(path), "-s", "csr", "--cg", "2000",
               "--solver", "gmres", "--restart", "25",
               "--precondition", "ilu0"])
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["cg"]["solver"] == "gmres"
    assert doc["cg"]["restart"] == 25
    assert doc["cg"]["solution_rms_error_vs_ones"] < 1e-4

    rc = main(["--matrix", str(path), "-s", "csr", "--cg", "20000",
               "--solver", "chebyshev", "--cg-tol", "1e-8"])
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["cg"]["solver"] == "chebyshev"
    b = doc["cg"]["spectral_bounds"]
    assert 0 < b["lambda_min"] < b["lambda_max"]
    assert doc["cg"]["solution_rms_error_vs_ones"] < 1e-4

    # chebyshev + preconditioner is a usage error
    rc = main(["--matrix", str(path), "-s", "csr", "--cg", "100",
               "--solver", "chebyshev", "--precondition", "jacobi"])
    assert rc != 0
