"""Mixed-precision iterative refinement (ops/refine.py).

Correctness anchors:
- A f32 inner CG at loose tolerance, wrapped in refinement, reaches a
  1e-12 fp64 relative residual that a single f32 CG at tol=1e-12
  demonstrably cannot (f32 rounding floors its true fp64 residual
  around 1e-6-1e-7).
- Works with a GMRES inner solver on a non-symmetric system.
- Stagnates gracefully (returns the best iterate, flags fewer
  refinements than the cap) instead of looping when asked for more
  accuracy than the inner precision supports.
"""

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.io.generate import poisson2d, random_sparse
from spmv_tpu.models import CsrMatrix
from spmv_tpu.models.device import DeviceCsr
from spmv_tpu.ops import (
    conjugate_gradient,
    gmres,
    iterative_refinement,
    spmv,
)


def test_refinement_beats_plain_f32_cg():
    mm = poisson2d(24, 24)
    m = CsrMatrix.from_matrix_market(mm)
    n = m.num_rows
    rng = np.random.default_rng(0)
    x_true = rng.standard_normal(n)
    b = m.spmv(x_true)
    b_norm = np.linalg.norm(b)
    A32 = DeviceCsr.from_host(m, dtype=jnp.float32)

    # plain f32 CG asked for 1e-12: its TRUE fp64 residual floors out
    plain = conjugate_gradient(
        lambda v: spmv(A32, v), jnp.asarray(b, jnp.float32),
        tol=1e-12, max_iterations=5000)
    rn_plain = np.linalg.norm(
        b - m.spmv(np.asarray(plain.x, np.float64)))
    assert rn_plain / b_norm > 1e-10   # f32 floor, nowhere near 1e-12

    inner = jax.jit(lambda r: conjugate_gradient(
        lambda v: spmv(A32, v), r, tol=1e-5, max_iterations=2000))
    res = iterative_refinement(m, b, inner, tol=1e-12)
    assert res.residual_norm / b_norm <= 1e-12
    np.testing.assert_allclose(res.x, x_true, rtol=1e-9, atol=1e-11)
    assert res.refinements >= 2          # took multiple f32 passes
    assert res.inner_iterations > 0


def test_refinement_with_gmres_nonsymmetric():
    n = 150
    mm = random_sparse(n, n, 4, seed=9)
    m0 = CsrMatrix.from_matrix_market(mm)
    dense = np.zeros((n, n))
    for i in range(n):
        for k in range(m0.row_ptr[i], m0.row_ptr[i + 1]):
            dense[i, m0.column_index[k]] += m0.value[k]
    np.fill_diagonal(dense, np.abs(dense).sum(axis=1) + 1.0)
    rows, cols = np.nonzero(dense)
    rp = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=rp[1:])
    m = CsrMatrix(n, n, rows.size, 1, rp, cols.astype(np.int32),
                  dense[rows, cols])
    b = np.random.default_rng(1).standard_normal(n)
    A32 = DeviceCsr.from_host(m, dtype=jnp.float32)
    inner = jax.jit(lambda r: gmres(
        lambda v: spmv(A32, v), r, tol=1e-5, restart=30,
        max_iterations=500))
    res = iterative_refinement(m, b, inner, tol=1e-13)
    x_ref = np.linalg.solve(dense, b)
    np.testing.assert_allclose(res.x, x_ref, rtol=1e-10, atol=1e-12)


def test_refinement_stagnation_returns_best():
    # an inner "solver" too weak to halve the residual: refinement
    # must stop early and return the best iterate, not loop to the cap
    mm = poisson2d(10, 10)
    m = CsrMatrix.from_matrix_market(mm)
    b = np.random.default_rng(2).standard_normal(m.num_rows)

    def weak_inner(r):
        return 0.01 * r   # barely a correction

    res = iterative_refinement(m, b, weak_inner, tol=1e-12,
                               max_refinements=20)
    assert res.refinements < 20
    assert np.isfinite(res.residual_norm)


def test_refinement_accepts_callable_operator():
    n = 64
    diag = np.linspace(1.0, 5.0, n)
    b = np.random.default_rng(3).standard_normal(n)

    def op(v):
        return diag * v

    inner = lambda r: r / jnp.asarray(diag, r.dtype)   # noqa: E731
    res = iterative_refinement(op, b, inner, tol=1e-14)
    np.testing.assert_allclose(res.x, b / diag, rtol=1e-13)
