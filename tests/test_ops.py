"""Device-format and XLA-kernel tests (CPU backend, fp64).

The device kernels are validated against the host (numpy) reference
SpMVs, which are themselves validated against the reference's poisson2D
ground truth — the same layered test strategy as the reference
(SURVEY.md section 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmv_tpu.io import parse_matrix_market
from spmv_tpu.io.generate import poisson2d, powerlaw, random_sparse
from spmv_tpu.models import CooMatrix, CsrMatrix, EllMatrix, HybridMatrix
from spmv_tpu.models.device import (
    DeviceCsr,
    DeviceEll,
    DeviceHybrid,
    device_put_matrix,
)
from spmv_tpu.ops import spmv, spmm, triad, conjugate_gradient


def _make(mm, kind):
    host = {
        "coo": CooMatrix,
        "csr": CsrMatrix,
        "ell": EllMatrix,
        "hybrid": HybridMatrix,
    }[kind].from_matrix_market(mm)
    return host, device_put_matrix(host)


@pytest.mark.parametrize("kind", ["coo", "csr", "ell", "hybrid"])
@pytest.mark.parametrize(
    "gen",
    [
        lambda: poisson2d(17, 23),
        lambda: powerlaw(300, 200, 6.0, seed=5),
        lambda: random_sparse(128, 64, 3, seed=2),
    ],
)
def test_device_spmv_matches_host(kind, gen):
    mm = gen()
    host, dev = _make(mm, kind)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(mm.num_columns)
    y = jax.jit(spmv)(dev, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), host.spmv(x), rtol=1e-12)


@pytest.mark.parametrize("kind", ["csr", "ell", "hybrid"])
def test_device_spmm_matches_host(kind):
    mm = powerlaw(200, 100, 5.0, seed=9)
    host, dev = _make(mm, kind)
    rng = np.random.default_rng(1)
    X = rng.standard_normal((mm.num_columns, 8))
    Y = jax.jit(spmm)(dev, jnp.asarray(X))
    expected = np.stack([host.spmv(X[:, j]) for j in range(8)], axis=1)
    np.testing.assert_allclose(np.asarray(Y), expected, rtol=1e-12)


def test_device_formats_are_pytrees():
    mm = poisson2d(8, 8)
    for kind in ("csr", "ell", "hybrid"):
        _, dev = _make(mm, kind)
        leaves = jax.tree_util.tree_leaves(dev)
        assert all(hasattr(l, "dtype") for l in leaves)
        rebuilt = jax.tree_util.tree_map(lambda a: a, dev)
        assert type(rebuilt) is type(dev)


def test_device_padding_alignment():
    mm = poisson2d(11, 13)  # 143 rows, deliberately unaligned
    _, dev = _make(mm, "csr")
    assert dev.padded_entries % 1024 == 0
    assert dev.padded_rows % 8 == 0
    assert dev.padded_rows > dev.num_rows  # overflow row exists
    _, ell = _make(mm, "ell")
    assert ell.padded_rows % 8 == 0


def test_triad():
    b = jnp.arange(8.0)
    c = jnp.ones(8)
    np.testing.assert_allclose(np.asarray(triad(b, c, 2.0)), np.arange(8.0) + 2.0)


def test_conjugate_gradient_poisson(reference_poisson2d=None):
    mm = poisson2d(16, 16)
    _, dev = _make(mm, "csr")
    rng = np.random.default_rng(3)
    x_true = rng.standard_normal(mm.num_rows)
    b = CsrMatrix.from_matrix_market(mm).spmv(x_true)

    res = jax.jit(
        lambda b: conjugate_gradient(
            lambda v: spmv(dev, v), b, tol=1e-12, max_iterations=2000
        )
    )(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-6, atol=1e-8)
    assert int(res.iterations) < 2000


def test_spmm_dia_and_well_match_host():
    import jax.numpy as jnp

    from spmv_tpu.io.generate import poisson2d
    from spmv_tpu.models import DiaMatrix, WellMatrix
    from spmv_tpu.models.device import device_put_matrix
    from spmv_tpu.ops import spmm

    mm = poisson2d(11, 13)
    X = np.random.default_rng(0).standard_normal((mm.num_columns, 5))
    for fmt in (DiaMatrix, WellMatrix):
        host = fmt.from_matrix_market(mm)
        A = device_put_matrix(host)
        Y = np.asarray(spmm(A, jnp.asarray(X)))
        want = np.stack([host.spmv(X[:, j]) for j in range(5)], axis=1)
        np.testing.assert_allclose(Y, want, rtol=1e-12)


def test_preconditioned_cg_jacobi_poisson():
    from spmv_tpu.ops import (
        extract_diagonal,
        jacobi_preconditioner,
        preconditioned_conjugate_gradient,
    )

    mm = poisson2d(16, 16)
    host = CsrMatrix.from_matrix_market(mm)
    _, dev = _make(mm, "csr")
    rng = np.random.default_rng(5)
    x_true = rng.standard_normal(mm.num_rows)
    b = host.spmv(x_true)

    diag = extract_diagonal(host)
    minv = jacobi_preconditioner(jnp.asarray(diag))
    res = jax.jit(
        lambda b: preconditioned_conjugate_gradient(
            lambda v: spmv(dev, v), b, minv, tol=1e-12,
            max_iterations=2000,
        )
    )(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), x_true,
                               rtol=1e-6, atol=1e-8)
    # Jacobi on the constant-diagonal Poisson matrix is a pure scale:
    # same Krylov space, so it should not need MORE iterations than
    # plain CG.
    plain = jax.jit(
        lambda b: conjugate_gradient(
            lambda v: spmv(dev, v), b, tol=1e-12, max_iterations=2000
        )
    )(jnp.asarray(b))
    assert int(res.iterations) <= int(plain.iterations) + 1


def test_extract_diagonal_formats():
    from spmv_tpu.models import DiaMatrix
    from spmv_tpu.ops import extract_diagonal

    mm = poisson2d(5, 5)
    want = np.full(mm.num_rows, 4.0)
    for m in (CsrMatrix.from_matrix_market(mm),
              DiaMatrix.from_matrix_market(mm), mm):
        got = extract_diagonal(m)
        np.testing.assert_allclose(got, want)


def test_jacobi_preconditioner_zero_diag_passthrough():
    from spmv_tpu.ops import jacobi_preconditioner

    minv = jacobi_preconditioner(jnp.asarray([2.0, 0.0, 4.0]))
    out = np.asarray(minv(jnp.asarray([2.0, 3.0, 8.0])))
    np.testing.assert_allclose(out, [1.0, 3.0, 2.0])


def test_dia_conjugate_gradient_padded_fast_path():
    from spmv_tpu.models import DiaMatrix
    from spmv_tpu.models.device import DeviceDia
    from spmv_tpu.ops import dia_conjugate_gradient, extract_diagonal

    mm = poisson2d(16, 16)
    host = DiaMatrix.from_matrix_market(mm)
    A = DeviceDia.from_host(host)
    rng = np.random.default_rng(8)
    x_true = rng.standard_normal(mm.num_rows)
    b = host.spmv(x_true)

    res = jax.jit(
        lambda b: dia_conjugate_gradient(
            A, b, tol=1e-12, max_iterations=2000, interpret=True,
            path="pallas",
        )
    )(jnp.asarray(b))
    assert res.x.shape == (mm.num_rows,)
    np.testing.assert_allclose(np.asarray(res.x), x_true,
                               rtol=1e-6, atol=1e-8)

    # Jacobi-preconditioned variant converges to the same solution
    res2 = jax.jit(
        lambda b: dia_conjugate_gradient(
            A, b, tol=1e-12, max_iterations=2000, interpret=True,
            jacobi_diag=extract_diagonal(host), path="pallas",
        )
    )(jnp.asarray(b))
    # auto path on a small matrix routes to the fused XLA formulation
    res3 = jax.jit(
        lambda b: dia_conjugate_gradient(
            A, b, tol=1e-12, max_iterations=2000
        )
    )(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(res3.x), x_true,
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(res2.x), x_true,
                               rtol=1e-6, atol=1e-8)


def test_batched_cg_matches_per_column():
    from spmv_tpu.ops import batched_conjugate_gradient

    mm = poisson2d(16, 16)
    host = CsrMatrix.from_matrix_market(mm)
    _, dev = _make(mm, "csr")
    rng = np.random.default_rng(11)
    X_true = rng.standard_normal((mm.num_rows, 3))
    X_true[:, 1] *= 100.0          # different scales per column
    B = np.stack([host.spmv(X_true[:, j]) for j in range(3)], axis=1)

    res = jax.jit(
        lambda B: batched_conjugate_gradient(
            lambda V: spmm(dev, V), B, tol=1e-12, max_iterations=2000
        )
    )(jnp.asarray(B))
    assert res.x.shape == (mm.num_rows, 3)
    assert res.residual_norm.shape == (3,)
    assert res.iterations.shape == (3,)
    np.testing.assert_allclose(np.asarray(res.x), X_true,
                               rtol=1e-6, atol=1e-6)
    # per-column recurrences == k separate CG runs (same alpha/beta
    # sequences up to fp reordering): iteration counts agree closely
    for j in range(3):
        single = conjugate_gradient(
            lambda v: spmv(dev, v), jnp.asarray(B[:, j]),
            tol=1e-12, max_iterations=2000)
        assert abs(int(res.iterations[j]) - int(single.iterations)) <= 1


def test_batched_cg_frozen_and_zero_columns():
    from spmv_tpu.ops import batched_conjugate_gradient

    mm = poisson2d(12, 12)
    host = CsrMatrix.from_matrix_market(mm)
    _, dev = _make(mm, "csr")
    rng = np.random.default_rng(12)
    x_true = rng.standard_normal(mm.num_rows)
    b = host.spmv(x_true)
    # column 0: real system; column 1: zero RHS (never active)
    B = np.stack([b, np.zeros_like(b)], axis=1)

    res = batched_conjugate_gradient(
        lambda V: spmm(dev, V), jnp.asarray(B),
        tol=1e-10, max_iterations=2000)
    np.testing.assert_allclose(np.asarray(res.x[:, 0]), x_true,
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.x[:, 1]), 0.0)
    assert int(res.iterations[1]) == 0
    assert int(res.iterations[0]) > 0


def test_batched_cg_jacobi_and_replacement():
    from spmv_tpu.ops import (
        batched_conjugate_gradient,
        extract_diagonal,
        jacobi_preconditioner,
    )

    mm = poisson2d(14, 14)
    host = CsrMatrix.from_matrix_market(mm)
    _, dev = _make(mm, "csr")
    rng = np.random.default_rng(13)
    X_true = rng.standard_normal((mm.num_rows, 2))
    B = np.stack([host.spmv(X_true[:, j]) for j in range(2)], axis=1)

    minv = jacobi_preconditioner(
        jnp.asarray(extract_diagonal(host))[:, None])
    res = batched_conjugate_gradient(
        lambda V: spmm(dev, V), jnp.asarray(B), preconditioner=minv,
        tol=1e-12, max_iterations=2000, recompute_every=10)
    np.testing.assert_allclose(np.asarray(res.x), X_true,
                               rtol=1e-6, atol=1e-6)

    with pytest.raises(ValueError):
        batched_conjugate_gradient(
            lambda V: spmm(dev, V), jnp.asarray(B),
            recompute_every=-1)


@pytest.mark.slow
def test_dia_batched_cg_paths():
    from spmv_tpu.models import DiaMatrix
    from spmv_tpu.models.device import DeviceDia
    from spmv_tpu.ops import dia_batched_conjugate_gradient, extract_diagonal

    mm = poisson2d(16, 16)
    host = DiaMatrix.from_matrix_market(mm)
    A = DeviceDia.from_host(host)
    rng = np.random.default_rng(14)
    X_true = rng.standard_normal((mm.num_rows, 3))
    B = np.stack([host.spmv(X_true[:, j]) for j in range(3)], axis=1)

    # padded Pallas layout (interpret mode)
    res = jax.jit(
        lambda B: dia_batched_conjugate_gradient(
            A, B, tol=1e-12, max_iterations=2000, interpret=True,
            path="pallas",
        )
    )(jnp.asarray(B))
    assert res.x.shape == (mm.num_rows, 3)
    np.testing.assert_allclose(np.asarray(res.x), X_true,
                               rtol=1e-6, atol=1e-6)

    # Jacobi + residual replacement through the padded layout
    res2 = dia_batched_conjugate_gradient(
        A, jnp.asarray(B), tol=1e-12, max_iterations=2000,
        interpret=True, path="pallas",
        jacobi_diag=extract_diagonal(host), recompute_every=25)
    np.testing.assert_allclose(np.asarray(res2.x), X_true,
                               rtol=1e-6, atol=1e-6)

    # auto path on a small matrix routes to the fused XLA formulation
    res3 = dia_batched_conjugate_gradient(
        A, jnp.asarray(B), tol=1e-12, max_iterations=2000,
        jacobi_diag=extract_diagonal(host))
    np.testing.assert_allclose(np.asarray(res3.x), X_true,
                               rtol=1e-6, atol=1e-6)
