"""Periodic true-residual replacement in CG/PCG (PLAN item 12).

The f32 CG recurrence drifts: the recurrence residual keeps shrinking
after the TRUE residual ``b - A x`` has hit the attainable f32 floor,
so the solver reports a convergence it does not have (probe 53 saw
reported 1e-6 / true 1e-4 at 1M rows).  ``recompute_every=k`` replaces
the recurrence residual with the true residual every k iterations; the
reported residual then tracks the truth.  These tests pin:

- honesty: with replacement, reported ~= true (ratio < 1.5) where the
  plain recurrence under-reports by > 5x on the same f32 system;
- no semantic change in f64: replacement solves to the same answer;
- plumbing: the option reaches the preconditioned and DIA solvers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import CsrMatrix
from spmv_tpu.models.device import DeviceCsr
from spmv_tpu.ops import (
    conjugate_gradient,
    jacobi_preconditioner,
    preconditioned_conjugate_gradient,
    spmv,
)


def _system(nx, dtype):
    mm = poisson2d(nx, nx)
    m = CsrMatrix.from_matrix_market(mm)
    A = DeviceCsr.from_host(m, dtype=dtype)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(m.num_rows), dtype)
    return m, A, b


def _true_rel(m, b, x):
    """fp64 relative true residual ||b - A x|| / ||b||."""
    xd = np.asarray(x, np.float64)
    bd = np.asarray(b, np.float64)
    r = bd.copy()
    rp = np.asarray(m.row_ptr)
    ci = np.asarray(m.column_index)
    v = np.asarray(m.value, np.float64)
    seg = np.add.reduceat(v * xd[ci], rp[:-1])
    seg[rp[:-1] == rp[1:]] = 0.0
    r -= seg
    return float(np.linalg.norm(r) / np.linalg.norm(bd))


def test_replacement_reports_honest_residual_f32():
    # 36k rows: enough iterations (~480) for the f32 recurrence to
    # drift well past the true-residual floor.
    m, A, b = _system(192, jnp.float32)
    mv = lambda v: spmv(A, v)  # noqa: E731
    bn = float(jnp.linalg.norm(b))

    plain = conjugate_gradient(mv, b, tol=1e-6, max_iterations=4000)
    plain_rep = float(plain.residual_norm) / bn
    plain_true = _true_rel(m, b, plain.x)
    # the plain recurrence under-reports: true residual is far above
    # what the solver claims (measured 22x)
    assert plain_true > 5 * plain_rep

    res = conjugate_gradient(mv, b, tol=1e-4, max_iterations=4000,
                             recompute_every=50)
    rep = float(res.residual_norm) / bn
    true = _true_rel(m, b, res.x)
    assert int(res.iterations) < 4000  # converged at an attainable tol
    assert rep <= 1e-4
    assert true <= 1.5 * rep  # reported tracks truth (measured 1.0002)


def test_replacement_matches_plain_in_f64():
    m, A, b = _system(32, jnp.float64)
    mv = lambda v: spmv(A, v)  # noqa: E731
    plain = conjugate_gradient(mv, b, tol=1e-10, max_iterations=3000)
    rep = conjugate_gradient(mv, b, tol=1e-10, max_iterations=3000,
                             recompute_every=10)
    np.testing.assert_allclose(np.asarray(rep.x), np.asarray(plain.x),
                               rtol=1e-6, atol=1e-9)
    assert _true_rel(m, b, rep.x) <= 1e-9


@pytest.mark.slow
def test_replacement_in_pcg_and_dia():
    from spmv_tpu.models.dia import DiaMatrix
    from spmv_tpu.models.device import DeviceDia
    from spmv_tpu.ops import dia_conjugate_gradient, extract_diagonal

    m, A, b = _system(24, jnp.float64)
    mv = lambda v: spmv(A, v)  # noqa: E731
    diag = jnp.asarray(extract_diagonal(m), b.dtype)
    res = preconditioned_conjugate_gradient(
        mv, b, jacobi_preconditioner(diag), tol=1e-10,
        max_iterations=3000, recompute_every=10)
    assert _true_rel(m, b, res.x) <= 1e-9

    Ad = DeviceDia.from_host(DiaMatrix.from_matrix_market(
        poisson2d(24, 24)), dtype=jnp.float64)
    resd = dia_conjugate_gradient(Ad, b, tol=1e-10,
                                  max_iterations=3000, path="xla",
                                  recompute_every=10)
    assert _true_rel(m, b, resd.x) <= 1e-9

    # padded Pallas-layout branch (ADVICE r3): replacement there
    # recomputes b2 - matvec2(x) in the padded 2-D layout; the fp64
    # true residual must still meet tol, with and without Jacobi.
    resp = dia_conjugate_gradient(Ad, b, tol=1e-10,
                                  max_iterations=3000, path="pallas",
                                  interpret=True, recompute_every=10)
    assert _true_rel(m, b, resp.x) <= 1e-9
    from spmv_tpu.ops import extract_diagonal as _ed
    respj = dia_conjugate_gradient(
        Ad, b, tol=1e-10, max_iterations=3000, path="pallas",
        interpret=True, recompute_every=10,
        jacobi_diag=jnp.asarray(_ed(m), b.dtype))
    assert _true_rel(m, b, respj.x) <= 1e-9


def test_negative_recompute_every_raises():
    """Library-level validation (ADVICE r3): programmatic callers get
    the documented semantics, not Python-modulo surprises."""
    import pytest

    m, A, b = _system(8, jnp.float64)
    mv = lambda v: spmv(A, v)  # noqa: E731
    with pytest.raises(ValueError, match="recompute_every"):
        conjugate_gradient(mv, b, recompute_every=-5)
    from spmv_tpu.ops import extract_diagonal
    diag = jnp.asarray(extract_diagonal(m), b.dtype)
    with pytest.raises(ValueError, match="recompute_every"):
        preconditioned_conjugate_gradient(
            mv, b, jacobi_preconditioner(diag), recompute_every=-1)
