"""Restarted GMRES and Chebyshev iteration, TPU-shaped.

The reference has no solver layer (it is a kernel tool); these round
out the solver family (ops/solvers.py: CG, PCG, BiCGSTAB) with the two
methods whose structure maps unusually well onto TPUs:

- **GMRES(m)** stores its Krylov basis as one dense ``(m+1, n)``
  array, so the Arnoldi orthogonalization is two full-basis matmuls
  per step (classical Gram-Schmidt with one reorthogonalization pass,
  "CGS2") instead of the j sequential dots of modified Gram-Schmidt.
  Two (m+1, n) matmuls are MXU work at full tile utilization and two
  collectives per step when sharded; MGS would be j round trips.
  CGS2's orthogonality loss is O(eps) like MGS (Giraud et al. 2005),
  unlike single-pass CGS — that is why the second pass is not
  optional.
- **Chebyshev iteration** needs NO inner products in its loop — only
  SpMV + axpys — so a sharded run needs no per-iteration psum at all
  (the only collective is inside the matvec halo exchange).  The cost
  is needing eigenvalue bounds up front; :func:`lanczos_bounds`
  estimates them with a short Lanczos run.

Both solvers are single fixed-shape ``lax.while_loop``s (restart
cycles for GMRES, check-interval chunks for Chebyshev), jittable and
shardable: ``matvec`` may be any local or shard_map SpMV closure.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.ops.solvers import CgResult

__all__ = ["gmres", "chebyshev", "lanczos_bounds"]


def gmres(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    preconditioner: Callable[[jax.Array], jax.Array] = None,
    x0: jax.Array = None,
    tol: float = 1e-8,
    restart: int = 32,
    max_iterations: int = 1000,
) -> CgResult:
    """Right-preconditioned restarted GMRES for general systems.

    Saad & Schultz 1986 GMRES(m).  Right preconditioning solves
    ``A M^-1 u = b`` with ``x = M^-1 u``, so the residual driving the
    stopping test is the TRUE residual of ``A x = b`` (matching
    :func:`spmv_tpu.ops.solvers.bicgstab`'s convention) and any
    preconditioner from ops/incomplete.py plugs in unchanged.

    Shapes are fixed for jit: the Krylov basis is a dense
    ``(restart+1, n)`` array (mind the memory: ``restart * n * 4``
    bytes at f32 — 33 MB per 256k rows at the default restart=32), the
    inner Arnoldi loop always runs ``restart`` steps with converged
    steps masked to no-ops, and convergence is re-tested on the true
    residual at each restart boundary.  The least-squares problem is
    carried as Givens rotations applied on the fly, so the residual
    estimate ``|g[j+1]|`` is free at every inner step.
    """
    if preconditioner is None:
        def preconditioner(v):
            return v
    m = int(restart)
    if m < 1:
        raise ValueError("restart must be >= 1")
    x0 = jnp.zeros_like(b) if x0 is None else x0
    # b may be any shape (e.g. the (shards, rows_per_shard) stacked
    # layout of parallel/shard.py) — basis rows mirror it and all
    # contractions run over every operand axis
    nd = b.ndim
    dtype = b.dtype
    b_norm2 = jnp.maximum(jnp.vdot(b, b), jnp.asarray(1e-300, dtype))
    tol2 = jnp.asarray(tol, dtype) ** 2 * b_norm2
    tol_abs = jnp.sqrt(tol2)
    eps = jnp.asarray(np.finfo(np.dtype(dtype)).tiny * 1e4, dtype)

    def inner_step(j, st):
        V, R, g, cs, sn, done, steps = st

        def frozen(_):
            return st

        def active(_):
            w = matvec(preconditioner(V[j]))
            # CGS2: orthogonalize against rows 0..j with two classical
            # Gram-Schmidt passes — each pass is one (m+1, n) matmul
            # pair rather than j sequential dots.
            mask = (jnp.arange(m + 1) <= j).astype(dtype)
            h1 = jnp.tensordot(V, w, axes=nd) * mask
            w = w - jnp.tensordot(h1, V, axes=1)
            h2 = jnp.tensordot(V, w, axes=nd) * mask
            w = w - jnp.tensordot(h2, V, axes=1)
            h = h1 + h2
            hn = jnp.sqrt(jnp.vdot(w, w))
            # lucky breakdown (Krylov space exhausted): leave the next
            # basis row zero; the masked rotations below see h[j+1]=0
            grew = hn > eps
            vnext = jnp.where(grew, w / jnp.where(grew, hn, 1.0), 0.0)
            h = h.at[j + 1].set(jnp.where(grew, hn, 0.0))
            V2 = V.at[j + 1].set(vnext)

            # apply previous Givens rotations 0..j-1 to the new column
            def rot(i, hc):
                valid = i < j
                hi = cs[i] * hc[i] + sn[i] * hc[i + 1]
                hip = -sn[i] * hc[i] + cs[i] * hc[i + 1]
                hc = hc.at[i].set(jnp.where(valid, hi, hc[i]))
                return hc.at[i + 1].set(jnp.where(valid, hip, hc[i + 1]))

            h = jax.lax.fori_loop(0, m, rot, h)
            # new rotation zeroing h[j+1]
            denom = jnp.sqrt(h[j] ** 2 + h[j + 1] ** 2)
            ok = denom > eps
            c = jnp.where(ok, h[j] / jnp.where(ok, denom, 1.0),
                          jnp.asarray(1.0, dtype))
            s = jnp.where(ok, h[j + 1] / jnp.where(ok, denom, 1.0),
                          jnp.asarray(0.0, dtype))
            h = h.at[j].set(c * h[j] + s * h[j + 1])
            h = h.at[j + 1].set(0.0)
            R2 = R.at[:, j].set(h[:m])
            gj = g[j]
            g2 = g.at[j].set(c * gj).at[j + 1].set(-s * gj)
            done2 = jnp.abs(g2[j + 1]) <= tol_abs
            return (V2, R2, g2, cs.at[j].set(c), sn.at[j].set(s),
                    done2, steps + 1)

        return jax.lax.cond(done, frozen, active, None)

    def outer_cond(st):
        _, rr, k = st
        return jnp.logical_and(rr > tol2, k < max_iterations)

    def outer_body(st):
        x, _, k = st
        r = b - matvec(x)
        beta = jnp.sqrt(jnp.vdot(r, r))
        safe_beta = jnp.where(beta > eps, beta, 1.0)
        V = jnp.zeros((m + 1,) + b.shape, dtype).at[0].set(
            r / safe_beta)
        # unused columns of R stay identity so the padded triangular
        # solve is non-singular and yields y=0 there
        R = jnp.eye(m, dtype=dtype)
        g = jnp.zeros((m + 1,), dtype).at[0].set(beta)
        cs = jnp.zeros((m,), dtype)
        sn = jnp.zeros((m,), dtype)
        st_in = (V, R, g, cs, sn, beta <= eps,
                 jnp.array(0, jnp.int32))
        V, R, g, cs, sn, _, steps = jax.lax.fori_loop(
            0, m, inner_step, st_in)
        # solve R y = g over the columns actually produced; zero the
        # trailing g entry (the residual estimate) and the identity
        # columns so frozen steps contribute nothing
        g_solve = jnp.where(jnp.arange(m) < steps, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(R, g_solve, lower=False)
        x = x + preconditioner(jnp.tensordot(y, V[:m], axes=1))
        r = b - matvec(x)
        return (x, jnp.vdot(r, r), k + steps)

    r0 = b - matvec(x0)
    x, rr, k = jax.lax.while_loop(
        outer_cond, outer_body,
        (x0, jnp.vdot(r0, r0), jnp.array(0, jnp.int32)))
    return CgResult(x=x, residual_norm=jnp.sqrt(rr), iterations=k)


def chebyshev(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    lambda_min: float,
    lambda_max: float,
    x0: jax.Array = None,
    tol: float = 1e-8,
    max_iterations: int = 1000,
    check_every: int = 20,
) -> CgResult:
    """Chebyshev iteration for SPD systems with known spectral bounds.

    Saad, Iterative Methods 2nd ed., Algorithm 12.1.  The loop body is
    one SpMV + three axpys and **zero inner products**: on a sharded
    matvec the only collective per iteration is the halo exchange
    inside the SpMV itself — no psum latency on the iteration's
    critical path, unlike CG's two reduction round-trips.  The price
    is needing ``0 < lambda_min <= lambda_max`` enclosing A's
    spectrum (use :func:`lanczos_bounds`); bounds that clip the
    spectrum diverge.

    Convergence is tested on the true residual once every
    ``check_every`` iterations (a fixed-shape inner ``fori_loop``
    inside the outer ``while_loop``), keeping the loop dot-free
    between checks.
    """
    lo = float(lambda_min)
    hi = float(lambda_max)
    if not (0 < lo <= hi):
        raise ValueError("chebyshev needs 0 < lambda_min <= lambda_max"
                         f", got [{lambda_min}, {lambda_max}]")
    x0 = jnp.zeros_like(b) if x0 is None else x0
    dtype = b.dtype
    theta = jnp.asarray((hi + lo) / 2.0, dtype)
    delta = jnp.asarray((hi - lo) / 2.0, dtype)
    b_norm2 = jnp.maximum(jnp.vdot(b, b), jnp.asarray(1e-300, dtype))
    tol2 = jnp.asarray(tol, dtype) ** 2 * b_norm2
    # sigma in Saad 12.1; delta=0 (single eigenvalue) degenerates to
    # Richardson with the exact step 1/theta
    sigma1 = jnp.where(delta > 0, theta / jnp.where(delta > 0, delta,
                                                    1.0),
                       jnp.asarray(jnp.inf, dtype))
    check = max(1, int(check_every))

    def chunk(_, st):
        x, r, p, rho = st
        x = x + p
        r = r - matvec(p)
        rho_new = jnp.where(
            jnp.isinf(sigma1), jnp.asarray(0.0, dtype),
            1.0 / (2.0 * sigma1 - rho))
        scale = jnp.where(delta > 0,
                          2.0 * rho_new / jnp.where(delta > 0, delta,
                                                    1.0),
                          1.0 / theta)
        p = rho_new * rho * p + scale * r
        return (x, r, p, rho_new)

    def cond(st):
        x, r, p, rho, rr, k = st
        return jnp.logical_and(rr > tol2, k < max_iterations)

    def body(st):
        x, r, p, rho, _, k = st
        x, r, p, rho = jax.lax.fori_loop(0, check, chunk,
                                         (x, r, p, rho))
        return (x, r, p, rho, jnp.vdot(r, r), k + check)

    r0 = b - matvec(x0)
    p0 = r0 / theta
    rho0 = jnp.where(jnp.isinf(sigma1), jnp.asarray(0.0, dtype),
                     1.0 / sigma1)
    x, r, p, rho, rr, k = jax.lax.while_loop(
        cond, body, (x0, r0, p0, rho0, jnp.vdot(r0, r0),
                     jnp.array(0, jnp.int32)))
    return CgResult(x=x, residual_norm=jnp.sqrt(rr), iterations=k)


@partial(jax.jit, static_argnums=(0, 2))
def _lanczos_tridiag(matvec, v0, num_steps):
    """num_steps of Lanczos with full reorthogonalization (the basis
    is small — (steps, n) — so the two-matmul CGS2 used in gmres() is
    cheap insurance against ghost eigenvalues)."""
    nd = v0.ndim
    dtype = v0.dtype
    m = num_steps
    V = jnp.zeros((m + 1,) + v0.shape, dtype)
    V = V.at[0].set(v0 / jnp.sqrt(jnp.vdot(v0, v0)))
    alpha = jnp.zeros((m,), dtype)
    beta = jnp.zeros((m,), dtype)   # beta[j] couples step j and j+1

    def step(j, st):
        V, alpha, beta = st
        w = matvec(V[j])
        a = jnp.vdot(V[j], w)
        mask = (jnp.arange(m + 1) <= j).astype(dtype)
        w = w - jnp.tensordot(jnp.tensordot(V, w, axes=nd) * mask,
                              V, axes=1)
        w = w - jnp.tensordot(jnp.tensordot(V, w, axes=nd) * mask,
                              V, axes=1)
        bnew = jnp.sqrt(jnp.vdot(w, w))
        safe = jnp.where(bnew > 0, bnew, 1.0)
        V = V.at[j + 1].set(jnp.where(bnew > 0, w / safe, 0.0))
        return (V, alpha.at[j].set(a), beta.at[j].set(bnew))

    V, alpha, beta = jax.lax.fori_loop(0, m, step, (V, alpha, beta))
    return alpha, beta[:m - 1]


def lanczos_bounds(
    matvec: Callable[[jax.Array], jax.Array],
    n,
    num_steps: int = 30,
    dtype=jnp.float32,
    seed: int = 0,
    safety: float = 0.05,
    v0: jax.Array = None,
) -> tuple[float, float]:
    """Estimate ``(lambda_min, lambda_max)`` bounds for an SPD operator.

    ``n`` is the operand length, or a shape tuple when the operator
    works on stacked shard layouts.
    Runs ``num_steps`` of Lanczos from a fixed pseudorandom start,
    takes the Ritz extremes of the tridiagonal on the host, and widens
    them by ``safety`` (Ritz values lie INSIDE the spectrum, and
    :func:`chebyshev` diverges on bounds that clip it — widening
    trades a few iterations for robustness).  The returned floor is
    clamped positive.

    Pass an explicit ``v0`` when the operand layout carries padding
    (e.g. the stacked shard layout): a random start with nonzero
    padding slots would probe the operator's structurally-zero rows
    and drag the estimated floor to ~0.
    """
    if v0 is None:
        v0 = jnp.asarray(
            np.random.default_rng(seed).standard_normal(n), dtype)
    else:
        v0 = jnp.asarray(v0, dtype)
    alpha, beta = _lanczos_tridiag(matvec, v0, int(num_steps))
    a = np.asarray(alpha, np.float64)
    bb = np.asarray(beta, np.float64)
    T = np.diag(a) + np.diag(bb, 1) + np.diag(bb, -1)
    ritz = np.linalg.eigvalsh(T)
    lo, hi = float(ritz[0]), float(ritz[-1])
    # multiplicative widening: Ritz values sit INSIDE the spectrum,
    # and for stiff operators lambda_min can be orders of magnitude
    # below the spread, so additive widening would push the floor
    # through zero
    lo *= (1.0 - safety)
    hi *= (1.0 + safety)
    return max(lo, 1e-30), max(hi, 1e-30)
