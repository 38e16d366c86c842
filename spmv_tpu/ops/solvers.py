"""Iterative solvers built on the SpMV operator.

The reference is a kernel tool, not a solver library, but SpMV's raison
d'etre is iterative methods; conjugate gradient is the flagship
composite workload here (it is also the multi-collective "step" the
multi-chip dry run exercises: one SpMV + two dots + three axpys per
iteration, with psums across shards when sharded).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "conjugate_gradient",
    "preconditioned_conjugate_gradient",
    "batched_conjugate_gradient",
    "bicgstab",
    "dia_conjugate_gradient",
    "dia_batched_conjugate_gradient",
    "jacobi_preconditioner",
    "extract_diagonal",
    "CgResult",
]


class CgResult(NamedTuple):
    x: jax.Array
    residual_norm: jax.Array
    iterations: jax.Array


def conjugate_gradient(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: jax.Array = None,
    tol: float = 1e-8,
    max_iterations: int = 1000,
    recompute_every: int = 0,
) -> CgResult:
    """Unpreconditioned CG for SPD systems, jit-compatible.

    Fixed-shape ``lax.while_loop``; convergence on the relative
    residual. ``matvec`` may be a local or a sharded (shard_map) SpMV.

    ``recompute_every=k`` (k>0) replaces the recurrence residual with
    the true residual ``b - A x`` every k iterations (van der Vorst /
    Ye residual replacement).  In f32 the recurrence drifts: at 1M
    rows a run that "converged" at rel 1e-6 can carry ~1e-4 TRUE
    residual (probe 53 / PLAN item 12).  With replacement the reported
    residual tracks the true one (measured ratio 1.0002 vs 22x for the
    plain recurrence on a 36k-row f32 Poisson solve), at one extra
    matvec per k iterations.  Two measured consequences: (a) ``tol``
    must be attainable in the working precision — an honest solver
    cannot certify 1e-6 in f32 when the attainable true residual is
    ~2e-5, so it runs to ``max_iterations`` where the plain recurrence
    would falsely report convergence; (b) the search direction p is
    KEPT — restarting p on replacement measured 838 vs 352 iterations
    to the same tolerance.  ``recompute_every`` must be >= 0 (0
    disables replacement); negative values raise.
    """
    if recompute_every < 0:
        raise ValueError(
            f"recompute_every must be >= 0, got {recompute_every}")
    x0 = jnp.zeros_like(b) if x0 is None else x0
    r0 = b - matvec(x0)
    p0 = r0
    rs0 = jnp.vdot(r0, r0)
    b_norm2 = jnp.maximum(jnp.vdot(b, b), jnp.asarray(1e-300, b.dtype))
    tol2 = jnp.asarray(tol, b.dtype) ** 2 * b_norm2

    def cond(state):
        _, _, _, rs, k = state
        return jnp.logical_and(rs > tol2, k < max_iterations)

    def body(state):
        x, r, p, rs, k = state
        ap = matvec(p)
        alpha = rs / jnp.vdot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        if recompute_every:
            r = jax.lax.cond(
                (k + 1) % recompute_every == 0,
                lambda x: b - matvec(x), lambda _: r, x)
        rs_new = jnp.vdot(r, r)
        beta = rs_new / rs
        p = r + beta * p
        return (x, r, p, rs_new, k + 1)

    x, r, p, rs, k = jax.lax.while_loop(
        cond, body, (x0, r0, p0, rs0, jnp.array(0, jnp.int32))
    )
    return CgResult(x=x, residual_norm=jnp.sqrt(rs), iterations=k)


def _colsum(v: jax.Array, w: jax.Array) -> jax.Array:
    """Per-column <v, w>: sum over every axis except the column axis
    (axis 1), so it works for both the (n, k) layout and the padded
    (rows, k, LANE) Pallas layout."""
    axes = tuple(i for i in range(v.ndim) if i != 1)
    return jnp.sum(v * w, axis=axes)


def _bcast_cols(a: jax.Array, ndim: int) -> jax.Array:
    shape = [1] * ndim
    shape[1] = -1
    return a.reshape(shape)


def batched_conjugate_gradient(
    matmat: Callable[[jax.Array], jax.Array],
    B: jax.Array,
    x0: jax.Array = None,
    preconditioner: Callable[[jax.Array], jax.Array] = None,
    tol: float = 1e-8,
    max_iterations: int = 1000,
    recompute_every: int = 0,
) -> CgResult:
    """Multi-RHS CG: k independent per-column recurrences sharing one
    SpMM per iteration.

    The TPU-native reason this exists: one SpMM streams A once for
    all k columns, so the A traffic amortizes exactly as in the
    reference's cache-reuse model.  Measured (probe 59,
    experiments/RESULTS.md): **1.87x** throughput at k = 4 in the
    on-chip resident regime (1M-row poisson, 90 -> 193 us/iteration),
    but only ~1.03x in the HBM-streaming regime (16.8M rows), where
    CG's per-column vector traffic (~0.9 ms of axpys/dots per
    iteration vs a 0.45 ms A-stream) dominates and scales with k.
    Use it when the operator is resident, the matrix has many
    diagonals (bigger A-share), or you simply need many solves.  The
    recurrences are NOT coupled (this is not O'Leary block CG — no
    shared Krylov space, no k x k inverses, no rank-deficiency
    breakdown): each column carries its own alpha/beta and converges
    on its own relative residual; converged columns freeze (their
    alpha and beta are forced to 0) while the rest keep iterating, so
    the result equals k separate CG runs up to fp reordering.

    ``B`` has columns on axis 1: shape (n, k), or the padded
    (rows, k, LANE) layout used by :func:`dia_batched_conjugate_
    gradient`.  ``preconditioner`` (optional) applies an SPD M^-1
    column-wise (an elementwise/Jacobi apply broadcasts unchanged).
    ``recompute_every`` replaces R with the true residual B - A X
    every k iterations (all columns, frozen ones included — a frozen
    column whose TRUE residual is above tolerance honestly reactivates,
    with its search direction restarted).  Returns per-column
    ``residual_norm`` and ``iterations`` arrays of shape (k,).
    """
    if recompute_every < 0:
        raise ValueError(
            f"recompute_every must be >= 0, got {recompute_every}")
    X0 = jnp.zeros_like(B) if x0 is None else x0
    R0 = B - matmat(X0)
    Z0 = preconditioner(R0) if preconditioner is not None else R0
    P0 = Z0
    rz0 = _colsum(R0, Z0)
    rr0 = _colsum(R0, R0) if preconditioner is not None else rz0
    b2 = jnp.maximum(_colsum(B, B), jnp.asarray(1e-300, B.dtype))
    tol2 = jnp.asarray(tol, B.dtype) ** 2 * b2
    ndim = B.ndim
    iters0 = jnp.zeros(B.shape[1], jnp.int32)

    def cond(state):
        _, _, _, _, rr, it, _ = state
        return jnp.logical_and(jnp.any(rr > tol2), it < max_iterations)

    def body(state):
        X, R, P, rz, rr, it, iters = state
        active = rr > tol2
        AP = matmat(P)
        pap = _colsum(P, AP)
        alpha = jnp.where(
            active, rz / jnp.where(active, pap, 1.0), 0.0
        ).astype(B.dtype)
        X = X + _bcast_cols(alpha, ndim) * P
        R = R - _bcast_cols(alpha, ndim) * AP
        if recompute_every:
            R = jax.lax.cond(
                (it + 1) % recompute_every == 0,
                lambda X: B - matmat(X), lambda _: R, X)
        Z = preconditioner(R) if preconditioner is not None else R
        rz_new = _colsum(R, Z)
        rr_new = (_colsum(R, R) if preconditioner is not None
                  else rz_new)
        beta = jnp.where(
            active, rz_new / jnp.where(active, rz, 1.0), 0.0
        ).astype(B.dtype)
        P = Z + _bcast_cols(beta, ndim) * P
        return (X, R, P, rz_new, rr_new, it + 1,
                iters + active.astype(jnp.int32))

    X, R, P, rz, rr, it, iters = jax.lax.while_loop(
        cond, body,
        (X0, R0, P0, rz0, rr0, jnp.array(0, jnp.int32), iters0),
    )
    return CgResult(x=X, residual_norm=jnp.sqrt(rr), iterations=iters)


def preconditioned_conjugate_gradient(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    preconditioner: Callable[[jax.Array], jax.Array],
    x0: jax.Array = None,
    tol: float = 1e-8,
    max_iterations: int = 1000,
    recompute_every: int = 0,
) -> CgResult:
    """PCG for SPD systems with an SPD preconditioner M^-1.

    ``preconditioner(r)`` applies M^-1 to a vector (e.g. a Jacobi
    diagonal scale — one elementwise multiply, which XLA fuses into
    the surrounding axpys; the SpMV stays the only kernel that touches
    HBM-sized data).  Convergence is still tested on the true residual
    ||r||, matching :func:`conjugate_gradient`.

    ``recompute_every`` enables periodic residual replacement exactly
    as in :func:`conjugate_gradient` (one extra matvec per k
    iterations; bounds f32 recurrence drift); must be >= 0.
    """
    if recompute_every < 0:
        raise ValueError(
            f"recompute_every must be >= 0, got {recompute_every}")
    x0 = jnp.zeros_like(b) if x0 is None else x0
    r0 = b - matvec(x0)
    z0 = preconditioner(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)
    rr0 = jnp.vdot(r0, r0)
    b_norm2 = jnp.maximum(jnp.vdot(b, b), jnp.asarray(1e-300, b.dtype))
    tol2 = jnp.asarray(tol, b.dtype) ** 2 * b_norm2

    def cond(state):
        _, _, _, _, rr, k = state
        return jnp.logical_and(rr > tol2, k < max_iterations)

    def body(state):
        x, r, p, rz, _, k = state
        ap = matvec(p)
        alpha = rz / jnp.vdot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        if recompute_every:
            r = jax.lax.cond(
                (k + 1) % recompute_every == 0,
                lambda x: b - matvec(x), lambda _: r, x)
        z = preconditioner(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, p, rz_new, jnp.vdot(r, r), k + 1)

    x, r, p, rz, rr, k = jax.lax.while_loop(
        cond, body, (x0, r0, p0, rz0, rr0, jnp.array(0, jnp.int32))
    )
    return CgResult(x=x, residual_norm=jnp.sqrt(rr), iterations=k)


def bicgstab(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    preconditioner: Callable[[jax.Array], jax.Array] = None,
    x0: jax.Array = None,
    tol: float = 1e-8,
    max_iterations: int = 1000,
) -> CgResult:
    """BiCGSTAB for general (non-symmetric) systems, jit-compatible.

    The solver that makes ILU(0) useful: CG requires SPD, BiCGSTAB
    does not (van der Vorst 1992).  Right-preconditioned form — the
    preconditioner (e.g. :func:`spmv_tpu.ops.incomplete.ilu0_preconditioner`)
    is applied to the search directions, so the residual being tested
    is the true residual of A x = b.  Fixed-shape ``lax.while_loop``
    like :func:`conjugate_gradient`; stagnation (rho ~ 0) exits via
    the same condition as convergence.
    """
    if preconditioner is None:
        def preconditioner(v):
            return v
    x0 = jnp.zeros_like(b) if x0 is None else x0
    r0 = b - matvec(x0)
    rhat = r0
    b_norm2 = jnp.maximum(jnp.vdot(b, b), jnp.asarray(1e-300, b.dtype))
    tol2 = jnp.asarray(tol, b.dtype) ** 2 * b_norm2
    eps = jnp.asarray(np.finfo(np.dtype(b.dtype)).tiny * 1e4, b.dtype)

    def cond(state):
        _, _, _, _, rr, ok, k = state
        return (rr > tol2) & ok & (k < max_iterations)

    def body(state):
        x, r, p, prev, rr, ok, k = state
        rho_prev, alpha_prev, omega_prev, v_prev = prev
        rho = jnp.vdot(rhat, r)
        beta = (rho / _safe(rho_prev, eps)) * (
            alpha_prev / _safe(omega_prev, eps))
        p = r + beta * (p - omega_prev * v_prev)
        ph = preconditioner(p)
        v = matvec(ph)
        alpha = rho / _safe(jnp.vdot(rhat, v), eps)
        s = r - alpha * v
        sh = preconditioner(s)
        t = matvec(sh)
        omega = jnp.vdot(t, s) / _safe(jnp.vdot(t, t), eps)
        x = x + alpha * ph + omega * sh
        r = s - omega * t
        rr = jnp.vdot(r, r)
        # breakdown (rho/omega ~ 0): stop iterating, keep the iterate
        ok = jnp.abs(rho) >= eps
        ok = ok & (jnp.abs(omega) >= eps)
        return (x, r, p, (rho, alpha, omega, v), rr, ok, k + 1)

    one = jnp.asarray(1.0, b.dtype)
    state0 = (x0, r0, jnp.zeros_like(b),
              (one, one, one, jnp.zeros_like(b)),
              jnp.vdot(r0, r0), jnp.array(True),
              jnp.array(0, jnp.int32))
    x, r, p, _, rr, ok, k = jax.lax.while_loop(cond, body, state0)
    return CgResult(x=x, residual_norm=jnp.sqrt(rr), iterations=k)


def _safe(v, eps):
    """Divide-safe denominator: keep magnitude >= eps, keep sign."""
    mag = jnp.maximum(jnp.abs(v), eps)
    return jnp.where(v < 0, -mag, mag)


def dia_conjugate_gradient(
    A,
    b: jax.Array,
    x0: jax.Array = None,
    tol: float = 1e-8,
    max_iterations: int = 1000,
    tile_rows: int = 256,
    interpret: bool = False,
    jacobi_diag=None,
    path: str = "auto",
    machine=None,
    recompute_every: int = 0,
    fused: bool = True,
) -> CgResult:
    """CG specialized to DIA, with a size-dependent matvec path.

    ``fused`` (Pallas path only): fold the p.Ap dot into the matvec
    kernel (``dia_spmv_core(with_dot=True)``) — measured ~12% off a
    streaming-regime iteration (probe 60).  ``fused=False`` keeps the
    separate 2-vector dot pass; it exists as the A/B control for that
    measurement (bench solver leg) and as an escape hatch.

    Measured (16.7M-row poisson): the padded-layout Pallas path runs
    one CG iteration in 1.15 ms vs 6.1 ms for the generic
    pad-per-call path — 5.3x.  But when the diagonal data itself fits
    the on-chip residency budget (~4M rows at 5 diagonals), XLA's
    fused shifted-slice formulation wins instead (41 us vs 136 us per
    iteration at 4.2M rows): everything stays on-chip and fuses.
    ``path="auto"`` picks by comparing the diagonal bytes to the
    machine model's residency budget; "pallas" / "xla" force it.

    On the Pallas path everything is padded ONCE: b, x and the CG
    work vectors live in the kernel's 2-D layout (padding rows are
    exact zeros — the diagonal data is zero there, so A@p keeps them
    zero and every axpy/dot is unaffected), each iteration is one
    ``dia_spmv_core`` call, and x is extracted at the end.

    ``jacobi_diag`` (optional, length num_rows) switches to Jacobi-
    preconditioned CG with the diagonal padded into the same layout.
    """
    from spmv_tpu.ops.pallas_kernels import (
        dia_extract_y,
        dia_prepare_x,
        dia_spmv_core,
    )

    if A.num_rows != A.num_columns:
        raise ValueError("dia_conjugate_gradient requires a square "
                         "matrix")
    if path == "auto":
        # machine defaults to the measured target chip; pass the
        # actual machine model when running elsewhere (a model with
        # resident_bytes=0 always takes the Pallas streaming path)
        if machine is None:
            from spmv_tpu.perfmodel.tiling import TPU_V5E

            machine = TPU_V5E
        diag_bytes = A.data.size * A.data.dtype.itemsize
        path = ("xla" if 0 < diag_bytes <= machine.resident_bytes
                else "pallas")
    if path == "xla":
        from spmv_tpu.ops.spmv import spmv as _spmv

        matvec = lambda v: _spmv(A, v)   # noqa: E731
        if jacobi_diag is not None:
            return preconditioned_conjugate_gradient(
                matvec, b,
                jacobi_preconditioner(
                    jnp.asarray(jacobi_diag, b.dtype)),
                x0=x0, tol=tol, max_iterations=max_iterations,
                recompute_every=recompute_every)
        return conjugate_gradient(
            matvec, b, x0=x0, tol=tol,
            max_iterations=max_iterations,
            recompute_every=recompute_every)
    b2 = dia_prepare_x(A, b, tile_rows)
    x02 = (jnp.zeros_like(b2) if x0 is None
           else dia_prepare_x(A, x0, tile_rows))

    inv2 = None
    if jacobi_diag is not None:
        d2 = dia_prepare_x(A, jnp.asarray(jacobi_diag, b.dtype),
                           tile_rows)
        safe = jnp.where(d2 == 0, jnp.ones_like(d2), d2)
        # real rows with zero diagonal pass through unscaled (as
        # jacobi_preconditioner does); padding rows scale by 0 so the
        # layout's zero padding stays invariant
        mask2 = dia_prepare_x(
            A, jnp.ones((A.num_rows,), b.dtype), tile_rows)
        inv2 = jnp.where(d2 == 0, mask2, 1.0 / safe)
    res = _dia_cg_fused(
        A, b2, x02, tol, max_iterations, tile_rows, interpret,
        recompute_every, inv2=inv2, fused=fused)
    return CgResult(
        x=dia_extract_y(A, res.x, tile_rows),
        residual_norm=res.residual_norm,
        iterations=res.iterations,
    )


def _dia_cg_fused(A, b2, x02, tol, max_iterations, tile_rows,
                  interpret, recompute_every, inv2=None, fused=True):
    """CG over the padded Pallas layout with the p.A p dot FUSED into
    the matvec kernel (``dia_spmv_core(with_dot=True)``): p's tile is
    already in the kernel's VMEM window, so alpha's dot skips its own
    2-vector HBM pass — measured ~12% off a streaming-regime
    iteration (probe 60).  ``inv2`` (optional) is the Jacobi M^-1 in
    the padded layout; the PCG recurrence keeps the same fused dot.
    """
    from spmv_tpu.ops.pallas_kernels import dia_spmv_core

    def matvec(p2):
        return dia_spmv_core(A, p2, tile_rows, interpret=interpret,
                             in_place=False)

    def matvec_dot(p2):
        if not fused:
            y2 = matvec(p2)
            return y2, jnp.vdot(p2, y2)
        y2, parts = dia_spmv_core(A, p2, tile_rows,
                                  interpret=interpret, in_place=False,
                                  with_dot=True)
        return y2, parts.sum().astype(b2.dtype)

    r0 = b2 - matvec(x02)
    z0 = r0 * inv2 if inv2 is not None else r0
    p0 = z0
    rz0 = jnp.vdot(r0, z0)
    rr0 = jnp.vdot(r0, r0) if inv2 is not None else rz0
    b_norm2 = jnp.maximum(jnp.vdot(b2, b2),
                          jnp.asarray(1e-300, b2.dtype))
    tol2 = jnp.asarray(tol, b2.dtype) ** 2 * b_norm2

    def cond(state):
        _, _, _, _, rr, k = state
        return jnp.logical_and(rr > tol2, k < max_iterations)

    def body(state):
        x, r, p, rz, _rr, k = state
        ap, pap = matvec_dot(p)
        alpha = rz / pap
        x = x + alpha * p
        r = r - alpha * ap
        if recompute_every:
            r = jax.lax.cond(
                (k + 1) % recompute_every == 0,
                lambda x: b2 - matvec(x), lambda _: r, x)
        z = r * inv2 if inv2 is not None else r
        rz_new = jnp.vdot(r, z)
        rr_new = jnp.vdot(r, r) if inv2 is not None else rz_new
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, p, rz_new, rr_new, k + 1)

    x, r, p, rz, rr, k = jax.lax.while_loop(
        cond, body, (x02, r0, p0, rz0, rr0, jnp.array(0, jnp.int32))
    )
    return CgResult(x=x, residual_norm=jnp.sqrt(rr), iterations=k)


def dia_batched_conjugate_gradient(
    A,
    B: jax.Array,
    x0: jax.Array = None,
    tol: float = 1e-8,
    max_iterations: int = 1000,
    tile_rows: int = 512,
    interpret: bool = False,
    jacobi_diag=None,
    path: str = "auto",
    machine=None,
    recompute_every: int = 0,
) -> CgResult:
    """Multi-RHS CG specialized to DIA: one ``dia_spmm_core`` call per
    iteration over all k right-hand sides.

    Same path selection as :func:`dia_conjugate_gradient` (XLA
    shifted-slice when the diagonals fit residency, padded Pallas
    layout otherwise), same padding-invariance argument: B's padding
    rows are exact zeros, A@P keeps them zero, and every per-column
    axpy/dot is unaffected.  ``B`` is (num_rows, k); returns X of the
    same shape with per-column residual norms / iteration counts.
    ``tile_rows`` defaults to the SpMM-preferred 512 (probe 20s:
    SpMM likes bigger DMAs than SpMV's 256).
    """
    from spmv_tpu.ops.pallas_kernels import (
        dia_extract_Y,
        dia_prepare_X,
        dia_prepare_x,
        dia_spmm_core,
    )

    if A.num_rows != A.num_columns:
        raise ValueError("dia_batched_conjugate_gradient requires a "
                         "square matrix")
    if B.ndim != 2:
        raise ValueError(f"B must be (num_rows, k); got {B.shape}")
    if path == "auto":
        if machine is None:
            from spmv_tpu.perfmodel.tiling import TPU_V5E

            machine = TPU_V5E
        diag_bytes = A.data.size * A.data.dtype.itemsize
        path = ("xla" if 0 < diag_bytes <= machine.resident_bytes
                else "pallas")
    precond = None
    if path == "xla":
        from spmv_tpu.ops.spmv import spmm as _spmm

        if jacobi_diag is not None:
            precond = jacobi_preconditioner(
                jnp.asarray(jacobi_diag, B.dtype)[:, None])
        return batched_conjugate_gradient(
            lambda V: _spmm(A, V), B, x0=x0, preconditioner=precond,
            tol=tol, max_iterations=max_iterations,
            recompute_every=recompute_every)

    B2 = dia_prepare_X(A, B, tile_rows)
    X02 = (jnp.zeros_like(B2) if x0 is None
           else dia_prepare_X(A, x0, tile_rows))

    def matmat2(P2):
        return dia_spmm_core(A, P2, tile_rows, interpret=interpret,
                             in_place=False)

    if jacobi_diag is not None:
        d2 = dia_prepare_x(A, jnp.asarray(jacobi_diag, B.dtype),
                           tile_rows)
        safe = jnp.where(d2 == 0, jnp.ones_like(d2), d2)
        mask2 = dia_prepare_x(
            A, jnp.ones((A.num_rows,), B.dtype), tile_rows)
        inv2 = jnp.where(d2 == 0, mask2, 1.0 / safe)[:, None, :]

        def precond(R2):  # noqa: F811 — column-broadcast Jacobi
            return R2 * inv2

    res = batched_conjugate_gradient(
        matmat2, B2, x0=X02, preconditioner=precond, tol=tol,
        max_iterations=max_iterations, recompute_every=recompute_every)
    return CgResult(
        x=dia_extract_Y(A, res.x, tile_rows),
        residual_norm=res.residual_norm,
        iterations=res.iterations,
    )


def jacobi_preconditioner(diag: jax.Array) -> Callable:
    """M^-1 r = r / diag, with zero diagonal entries passed through
    unscaled (the reference has no solver layer; Jacobi is the
    baseline preconditioner every SpMV library pairs with CG)."""
    diag = jnp.asarray(diag)
    safe = jnp.where(diag == 0, jnp.ones_like(diag), diag)
    inv = jnp.where(diag == 0, jnp.ones_like(diag), 1.0 / safe)

    def apply(r):
        return r * inv

    return apply


def extract_diagonal(m, dtype=np.float64) -> np.ndarray:
    """Host-side main diagonal of any host matrix format.

    Accepts DiaMatrix (offset-0 slice), CsrMatrix (per-row column
    search), or anything exposing ``row_indices()/column_indices()/
    values_real()`` (MatrixMarket) or ``row_index/column_index/value``
    arrays (COO-like).  Duplicate (i, i) entries sum, matching SpMV
    semantics.
    """
    n = min(m.num_rows, m.num_columns)
    out = np.zeros(n, dtype=dtype)
    offsets = getattr(m, "offsets", None)
    if offsets is not None and hasattr(m, "data"):
        offs = np.asarray(offsets)
        hit = np.nonzero(offs == 0)[0]
        if hit.size:
            out[:] = np.asarray(m.data)[int(hit[0]), :n]
        return out
    if hasattr(m, "row_ptr"):
        rp = np.asarray(m.row_ptr)
        ci = np.asarray(m.column_index)
        va = np.asarray(m.value)
        rows = np.repeat(np.arange(m.num_rows, dtype=np.int64),
                         np.diff(rp))
        sel = rows == ci
        np.add.at(out, rows[sel][rows[sel] < n], va[sel][rows[sel] < n])
        return out
    if hasattr(m, "row_indices"):
        # MatrixMarket accessors are 1-based (matrix-market.cpp:171).
        ri = np.asarray(m.row_indices()) - 1
        ci = np.asarray(m.column_indices()) - 1
        va = np.asarray(m.values_real())
    else:
        ri = np.asarray(m.row_index)
        ci = np.asarray(m.column_index)
        va = np.asarray(m.value)
    sel = ri == ci
    np.add.at(out, ri[sel][ri[sel] < n], va[sel][ri[sel] < n])
    return out
