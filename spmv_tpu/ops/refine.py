"""Mixed-precision iterative refinement: fp64 answers from f32 solves.

TPUs have no native fp64 — it is software-emulated at a large slowdown
— while the framework's correctness gates (BASELINE.json, the
reference-differential suite) are stated in fp64.  Iterative
refinement (Wilkinson 1963; Carson & Higham 2017 for the mixed-
precision analysis) closes that gap the TPU-native way: run the
Krylov solver entirely in the device's fast precision, and recover
full fp64 accuracy with a handful of cheap fp64 residual evaluations
on the host:

    repeat:  r = b - A x        (fp64, host SpMV)
             d ~= solve(A, r)   (f32/bf16, on device — the hot loop)
             x = x + d          (fp64, host axpy)

Each pass multiplies the error by ~cond(A) * eps_inner, so a few
passes reach eps_fp64 whenever cond(A) << 1/eps_inner — the same
regime where the inner solver converges at all.  The device never
touches a double; the host never does more than one SpMV + one axpy
per pass.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["iterative_refinement", "RefineResult"]


class RefineResult(NamedTuple):
    x: np.ndarray               # fp64 solution
    residual_norm: float        # fp64 true-residual norm at exit
    refinements: int            # outer passes taken
    inner_iterations: int       # total inner (device) iterations


def iterative_refinement(
    a_host,
    b: np.ndarray,
    inner_solve: Callable,
    tol: float = 1e-12,
    max_refinements: int = 20,
    inner_dtype=jnp.float32,
) -> RefineResult:
    """Solve ``A x = b`` to fp64 accuracy with a low-precision inner solver.

    ``a_host`` is any host matrix exposing ``spmv(x) -> y`` in fp64
    (CsrMatrix, DiaMatrix, ... — e.g. ``models/csr.py:100``), or a
    callable ``x -> A @ x`` operating on fp64 numpy arrays.
    ``inner_solve`` maps a device residual (cast to ``inner_dtype``)
    to an approximate correction — typically a jitted closure over
    :func:`~spmv_tpu.ops.solvers.conjugate_gradient`,
    :func:`~spmv_tpu.ops.krylov.gmres`, or
    :func:`~spmv_tpu.ops.krylov.chebyshev` at a loose tolerance
    (~sqrt(eps_inner)); it may return either the solution array or a
    ``CgResult``-like object with ``.x`` and ``.iterations``.

    Stops when the fp64 relative residual reaches ``tol``, or when a
    pass fails to shrink the residual (stagnation: cond(A) too large
    for the inner precision), whichever first.  Returns the best
    iterate seen.
    """
    if callable(getattr(a_host, "spmv", None)):
        matvec64 = lambda v: np.asarray(a_host.spmv(v), np.float64)  # noqa: E731
    elif callable(a_host):
        matvec64 = lambda v: np.asarray(a_host(v), np.float64)      # noqa: E731
    else:
        raise TypeError(
            "a_host must expose .spmv or be callable, got "
            f"{type(a_host)!r}")
    b = np.asarray(b, np.float64)
    b_norm = max(float(np.linalg.norm(b)), np.finfo(np.float64).tiny)

    x = np.zeros_like(b)
    best_x, best_rn = x, float("inf")
    prev_rn = float("inf")
    inner_total = 0
    k = 0
    while k < max_refinements:
        r = b - matvec64(x)
        rn = float(np.linalg.norm(r))
        if rn < best_rn:
            best_x, best_rn = x, rn
        if rn <= tol * b_norm:
            break
        if rn > 0.5 * prev_rn:
            # stagnated: the pass failed to at least halve the
            # residual, so the inner precision can't resolve further
            break
        prev_rn = rn
        res = inner_solve(jnp.asarray(r, inner_dtype))
        d = getattr(res, "x", res)
        inner_total += int(getattr(res, "iterations", 0))
        x = x + np.asarray(jax.device_get(d), np.float64)
        k += 1
    r = b - matvec64(x)
    rn = float(np.linalg.norm(r))
    if rn < best_rn:
        best_x, best_rn = x, rn
    return RefineResult(x=best_x, residual_norm=best_rn,
                        refinements=k, inner_iterations=inner_total)
