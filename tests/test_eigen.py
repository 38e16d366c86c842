"""LOBPCG block eigensolver tests.

The poisson2d fixture has ANALYTIC eigenvalues
lambda_{ij} = 4 - 2 cos(i pi / (nx+1)) - 2 cos(j pi / (ny+1)),
which makes a no-reference-needed exact gate (the same trick the
reference's poisson2D fixture plays for SpMV, SURVEY.md section 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import DiaMatrix
from spmv_tpu.models.device import DeviceDia
from spmv_tpu.ops import dia_eigsh, lobpcg


def _poisson_eigs(nx, ny):
    i = np.arange(1, nx + 1)
    j = np.arange(1, ny + 1)
    lam = (4.0 - 2.0 * np.cos(i * np.pi / (nx + 1))[:, None]
           - 2.0 * np.cos(j * np.pi / (ny + 1))[None, :])
    return np.sort(lam.reshape(-1))


def test_lobpcg_smallest_matches_analytic():
    nx = ny = 12
    A = DeviceDia.from_host(
        DiaMatrix.from_matrix_market(poisson2d(nx, ny)))
    res = dia_eigsh(A, k=4, which="smallest", tol=1e-9,
                    max_iterations=400)
    want = _poisson_eigs(nx, ny)[:4]
    np.testing.assert_allclose(np.asarray(res.eigenvalues), want,
                               rtol=1e-7)
    assert np.all(np.asarray(res.residual_norms) < 1e-8)
    # eigenvectors are orthonormal and satisfy the eigen equation
    V = np.asarray(res.eigenvectors)
    np.testing.assert_allclose(V.T @ V, np.eye(4), atol=1e-8)


@pytest.mark.slow
def test_lobpcg_largest_matches_analytic():
    nx = ny = 10
    A = DeviceDia.from_host(
        DiaMatrix.from_matrix_market(poisson2d(nx, ny)))
    res = dia_eigsh(A, k=3, which="largest", tol=1e-9,
                    max_iterations=400)
    want = _poisson_eigs(nx, ny)[::-1][:3]
    np.testing.assert_allclose(np.asarray(res.eigenvalues), want,
                               rtol=1e-7)


def test_lobpcg_dense_random_spd():
    rng = np.random.default_rng(5)
    n, k = 60, 5
    M = rng.standard_normal((n, n))
    A = M @ M.T + n * np.eye(n)
    want = np.sort(np.linalg.eigvalsh(A))[:k]
    Ad = jnp.asarray(A)
    X0 = jnp.asarray(rng.standard_normal((n, k)))
    res = lobpcg(lambda V: Ad @ V, X0, tol=1e-10, max_iterations=400)
    np.testing.assert_allclose(np.asarray(res.eigenvalues), want,
                               rtol=1e-8)


def test_lobpcg_jacobi_preconditioner_path():
    rng = np.random.default_rng(6)
    n, k = 50, 3
    d = np.linspace(1.0, 1e4, n)          # badly scaled diagonal
    A = np.diag(d)
    A[0, 1] = A[1, 0] = 1.0
    want = np.sort(np.linalg.eigvalsh(A))[:k]
    Ad = jnp.asarray(A)
    inv = jnp.asarray(1.0 / d)[:, None]
    X0 = jnp.asarray(rng.standard_normal((n, k)))
    res = lobpcg(lambda V: Ad @ V, X0,
                 preconditioner=lambda R: R * inv,
                 tol=1e-9, max_iterations=500)
    np.testing.assert_allclose(np.asarray(res.eigenvalues), want,
                               rtol=1e-7)
    # converged well before the cap (not a guarantee of beating the
    # unpreconditioned run on this nearly diagonal case — both are
    # fast; the assertion is that the preconditioned PATH converges)
    assert int(res.iterations) < 500
    assert np.all(np.asarray(res.residual_norms) < 1e-6 * 1e4)


def test_lobpcg_jit_and_fewer_iterations_than_size():
    nx = ny = 8
    A = DeviceDia.from_host(
        DiaMatrix.from_matrix_market(poisson2d(nx, ny)))
    from spmv_tpu.ops.spmv import spmm

    X0 = jax.random.normal(jax.random.PRNGKey(1), (nx * ny, 4),
                           jnp.float64)
    run = jax.jit(lambda X0: lobpcg(lambda V: spmm(A, V), X0,
                                    tol=1e-8, max_iterations=200))
    res = run(X0)
    want = _poisson_eigs(nx, ny)[:4]
    np.testing.assert_allclose(np.asarray(res.eigenvalues), want,
                               rtol=1e-6)
    # block method: far fewer iterations than the matrix dimension
    assert int(res.iterations) < nx * ny


def test_dia_eigsh_validation():
    A = DeviceDia.from_host(
        DiaMatrix.from_matrix_market(poisson2d(6, 6)))
    with pytest.raises(ValueError):
        dia_eigsh(A, which="middle")


def test_lobpcg_agrees_with_jax_experimental():
    # cross-check against jax.experimental's reference implementation
    # (largest eigenpairs) on a random SPD matrix
    from jax.experimental.sparse.linalg import lobpcg_standard

    rng = np.random.default_rng(9)
    n, k = 80, 4
    M = rng.standard_normal((n, n))
    A = jnp.asarray(M @ M.T + n * np.eye(n))
    X0 = jnp.asarray(rng.standard_normal((n, k)))
    ours = lobpcg(lambda V: A @ V, X0, largest=True, tol=1e-10,
                  max_iterations=400)
    theirs_w, _theirs_v, _n_iter = lobpcg_standard(
        lambda V: A @ V, X0, m=200)
    np.testing.assert_allclose(
        np.sort(np.asarray(ours.eigenvalues)),
        np.sort(np.asarray(theirs_w)), rtol=1e-8)


def test_lobpcg_amg_preconditioned_laplacian():
    # The in-tree SA-AMG V-cycle as the LOBPCG preconditioner: on a
    # fine Laplacian the unpreconditioned block iteration crawls (the
    # low end of the spectrum is clustered); M^-1 ~ A^-1 makes it
    # converge in a handful of iterations.
    from spmv_tpu.models import CsrMatrix
    from spmv_tpu.ops import amg_preconditioner
    from spmv_tpu.ops.spmv import spmm

    nx = ny = 48
    mm = poisson2d(nx, ny)
    m = CsrMatrix.from_matrix_market(mm)
    A = DeviceDia.from_host(DiaMatrix.from_matrix_market(mm))
    apply_m, info = amg_preconditioner(m)
    assert info["kind"] == "sa-amg"
    precond = jax.vmap(apply_m, in_axes=1, out_axes=1)
    X0 = jax.random.normal(jax.random.PRNGKey(2), (nx * ny, 4),
                           jnp.float64)
    res = lobpcg(lambda V: spmm(A, V), X0, preconditioner=precond,
                 tol=1e-8, max_iterations=100)
    want = _poisson_eigs(nx, ny)[:4]
    np.testing.assert_allclose(np.asarray(res.eigenvalues), want,
                               rtol=1e-6)
    plain = lobpcg(lambda V: spmm(A, V), X0, tol=1e-8,
                   max_iterations=100)
    # AMG converges well inside the cap; plain does not finish
    assert int(res.iterations) < 60
    assert int(res.iterations) < int(plain.iterations)


def test_jacobi_eigh_equal_diagonal_pair():
    # tau == 0 (exactly equal diagonal pair with nonzero coupling)
    # takes the full 45-degree rotation — jnp.sign(0) = 0 would skip
    # it and silently return the unrotated diagonal.
    from spmv_tpu.ops.eigen import _jacobi_eigh

    H = jnp.asarray([[2.0, 1.0], [1.0, 2.0]])
    w, V = _jacobi_eigh(H)
    np.testing.assert_allclose(np.asarray(w), [1.0, 3.0], rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(V.T @ V), np.eye(2), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(H @ V - V * w[None, :]), 0.0, atol=1e-12)


@pytest.mark.slow
def test_jacobi_eigh_random_matches_lapack():
    from spmv_tpu.ops.eigen import _jacobi_eigh

    rng = np.random.default_rng(3)
    M = rng.standard_normal((9, 9))
    H = (M + M.T) / 2
    w, V = _jacobi_eigh(jnp.asarray(H))
    np.testing.assert_allclose(np.asarray(w), np.linalg.eigvalsh(H),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(V.T @ V), np.eye(9),
                               atol=1e-10)
