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
) -> CgResult:
    """Unpreconditioned CG for SPD systems, jit-compatible.

    Fixed-shape ``lax.while_loop``; convergence on the relative
    residual. ``matvec`` may be a local or a sharded (shard_map) SpMV.
    """
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
        rs_new = jnp.vdot(r, r)
        beta = rs_new / rs
        p = r + beta * p
        return (x, r, p, rs_new, k + 1)

    x, r, p, rs, k = jax.lax.while_loop(
        cond, body, (x0, r0, p0, rs0, jnp.array(0, jnp.int32))
    )
    return CgResult(x=x, residual_norm=jnp.sqrt(rs), iterations=k)


def preconditioned_conjugate_gradient(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    preconditioner: Callable[[jax.Array], jax.Array],
    x0: jax.Array = None,
    tol: float = 1e-8,
    max_iterations: int = 1000,
) -> CgResult:
    """PCG for SPD systems with an SPD preconditioner M^-1.

    ``preconditioner(r)`` applies M^-1 to a vector (e.g. a Jacobi
    diagonal scale — one elementwise multiply, which XLA fuses into
    the surrounding axpys; the SpMV stays the only kernel that touches
    HBM-sized data).  Convergence is still tested on the true residual
    ||r||, matching :func:`conjugate_gradient`.
    """
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
        z = preconditioner(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, p, rz_new, jnp.vdot(r, r), k + 1)

    x, r, p, rz, rr, k = jax.lax.while_loop(
        cond, body, (x0, r0, p0, rz0, rr0, jnp.array(0, jnp.int32))
    )
    return CgResult(x=x, residual_norm=jnp.sqrt(rr), iterations=k)


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
