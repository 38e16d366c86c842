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

__all__ = ["conjugate_gradient", "CgResult"]


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
