"""Block eigensolver: LOBPCG for SPD operators.

The reference has no eigensolver layer, but the framework's solver
family (CG/Chebyshev) already needs spectral information —
``lanczos_bounds`` (ops/krylov.py) estimates the extremes for the
Chebyshev interval; this module computes actual eigenpairs.  LOBPCG
(Knyazev 2001, locally optimal block preconditioned conjugate
gradient) is the TPU-natural choice: its per-iteration work is ONE
block SpMM over k vectors (the 0.92-of-roofline path the batched CG
rides, ops/solvers.py) plus small (3k, 3k) dense algebra that lives
happily on the MXU, and its block Rayleigh-Ritz needs no
re-orthogonalization sweeps against a growing basis the way Lanczos
does.

Implementation notes (standard S-basis formulation, as in SciPy's
``lobpcg``):

- The search basis is S = [X, W, P] with W the (preconditioned)
  residual block and P the previous update direction; fixed (n, 3k)
  shape throughout so the whole iteration jits as one
  ``lax.while_loop``.  P is seeded with random directions at start
  (harmless extra search space) so the basis never carries an
  all-zero block and shapes stay static.
- Orthonormalization is Gram-eigh based: G = S^T S, and directions
  whose Gram eigenvalue falls below ``eps * max(w)`` are masked out
  by zeroing their inverse square root; their Rayleigh-Ritz diagonal
  gets a spectrum-scaled penalty so degenerate directions can never
  be selected as eigenpair approximations.  The selected Ritz
  coefficients are then polished against the exact Gram metric with
  a Newton-Schulz inverse square root.
- A @ S is tracked incrementally (AX and AP update by the same
  coefficient recurrences as X and P), so each iteration costs
  exactly one ``matmat`` call on the W block.
"""

from __future__ import annotations

import warnings
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["lobpcg", "dia_eigsh", "EigResult"]

# The solver's OWN contractions (Grams, projections, basis updates)
# run at full f32 matmul precision: TPU matmuls default to bf16 MXU
# passes whose ~5e-3 relative error floors the whole iteration at a
# ~1e-2 residual (measured).  Annotated per-call rather than via
# jax.default_matmul_precision so the user's matmat and
# preconditioner genuinely keep their own precision policy.


def _mmh(a, b):
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _coldot(a, b):
    # per-column <a_j, b_j>; einsum also lowers to bf16 MXU passes on
    # TPU by default, so it carries the same precision annotation
    return jnp.einsum("nk,nk->k", a, b,
                      precision=jax.lax.Precision.HIGHEST)


class EigResult(NamedTuple):
    eigenvalues: jax.Array      # (k,)
    eigenvectors: jax.Array     # (n, k), orthonormal columns
    residual_norms: jax.Array   # (k,) ||A v - theta v||
    iterations: jax.Array


def _jacobi_eigh(H: jax.Array, sweeps: int = 12):
    """Cyclic-Jacobi symmetric eigendecomposition for SMALL matrices.

    Why not ``jnp.linalg.eigh``: on TPU in f32 its (QDWH) eigenvector
    matrices are only ~5e-3-orthogonal with ~1e-2 residual ||HV - VW||
    (measured; LAPACK on CPU gives ~eps) — enough to stall LOBPCG's
    whole iteration at a ~1e-2 residual floor.  Cyclic Jacobi is
    unconditionally stable and reaches f32 machine precision in a few
    sweeps; for the (3k, 3k) matrices here the statically-unrolled
    rotations are trivial work.  Returns (w, V) sorted ascending.
    """
    m = H.shape[0]
    V = jnp.eye(m, dtype=H.dtype)
    tiny = jnp.asarray(np.finfo(np.dtype(H.dtype)).tiny * 1e4, H.dtype)

    def one_sweep(carry):
        H, V = carry
        for p in range(m - 1):
            for q in range(p + 1, m):
                hpp = H[p, p]
                hqq = H[q, q]
                hpq = H[p, q]
                rotate = jnp.abs(hpq) > tiny
                tau = (hqq - hpp) / jnp.where(
                    rotate, 2.0 * hpq, jnp.asarray(1.0, H.dtype))
                # tau == 0 (exactly equal diagonal pair) takes the
                # full 45-degree rotation, t = 1; jnp.sign(0) = 0
                # would silently skip it and never annihilate hpq.
                t = jnp.where(
                    tau == 0.0, 1.0,
                    jnp.sign(tau) / (
                        jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau)))
                c = jnp.where(
                    rotate, 1.0 / jnp.sqrt(1.0 + t * t), 1.0)
                s = jnp.where(rotate, t * c, 0.0)
                # H <- G^T H G, V <- V G with G the (p, q) rotation
                rp = c * H[p, :] - s * H[q, :]
                rq = s * H[p, :] + c * H[q, :]
                H = H.at[p, :].set(rp).at[q, :].set(rq)
                cp = c * H[:, p] - s * H[:, q]
                cq = s * H[:, p] + c * H[:, q]
                H = H.at[:, p].set(cp).at[:, q].set(cq)
                vp = c * V[:, p] - s * V[:, q]
                vq = s * V[:, p] + c * V[:, q]
                V = V.at[:, p].set(vp).at[:, q].set(vq)
        return H, V

    H, V = jax.lax.fori_loop(
        0, sweeps, lambda _, c: one_sweep(c), (H, V))
    w = jnp.diagonal(H)
    order = jnp.argsort(w)
    return w[order], V[:, order]


def _small_eigh(H: jax.Array):
    """Symmetric eigh for the solver's small matrices: LAPACK on CPU
    (exact, fast), cyclic Jacobi elsewhere (TPU's f32 eigh is too
    inaccurate — see :func:`_jacobi_eigh`)."""
    if jax.default_backend() == "cpu":
        return jnp.linalg.eigh(H)
    return _jacobi_eigh(H)


def _ortho_coeffs(G: jax.Array, eps: float):
    """Inverse-sqrt coefficients for a Gram matrix, masking the
    degenerate directions.  Returns (Vinv (m, m), mask (m,))."""
    w, V = _small_eigh(G)
    wmax = jnp.maximum(w[-1], jnp.asarray(1e-30, G.dtype))
    mask = w > eps * wmax
    inv_sqrt = jnp.where(mask, 1.0 / jnp.sqrt(jnp.where(mask, w, 1.0)),
                         0.0)
    return V * inv_sqrt[None, :], mask


def lobpcg(
    matmat: Callable[[jax.Array], jax.Array],
    X0: jax.Array,
    preconditioner: Callable[[jax.Array], jax.Array] = None,
    largest: bool = False,
    tol: float = 1e-6,
    max_iterations: int = 200,
    gram_eps: float = None,
    mask: jax.Array = None,
) -> EigResult:
    """k extreme eigenpairs of the SPD operator behind ``matmat``.

    ``X0`` is the (n, k) starting block (e.g. pseudorandom — see
    :func:`dia_eigsh`); ``largest`` selects the top instead of the
    bottom of the spectrum.  Convergence: every column satisfies
    ``||A v - theta v|| <= tol * max(max_j |theta_j|, 1)`` — scaled by
    the BLOCK's largest Rayleigh quotient (an operator-norm proxy),
    because the attainable residual floor of the Gram-based basis
    scales with ``||A||``.  ``matmat`` may be
    a local SpMM or a sharded (shard_map) operator, exactly like the
    solver layer's matvecs.

    Precision: in f32 on TPU the smallest eigenvalues of a 65k-row
    Laplacian (3e-4 against ||A|| ~ 8) come back to ~1e-5 relative in
    10 AMG-preconditioned iterations (measured; Rayleigh quotients
    square the eigenvector error, so the naive eps*||A|| bound is
    pessimistic).  Use f64 (CPU) when the bottom of the spectrum must
    be tighter than f32's attainable residual, and pair with a strong
    preconditioner (e.g. ``amg_preconditioner`` vmapped over columns —
    see tests/test_eigen.py) on fine meshes, where the
    unpreconditioned block iteration crawls through the clustered low
    end.  The solver's own algebra is annotated to full matmul
    precision, but ``matmat`` keeps its caller's policy — a DENSE
    operator on TPU should pass ``precision=Precision.HIGHEST`` in its
    own matmul or its ~5e-3 bf16 default bounds the attainable
    residual (the framework's sparse operators are elementwise /
    explicitly-accumulated and unaffected).
    """
    X0 = jnp.asarray(X0)
    n, k = X0.shape
    dtype = X0.dtype
    # The Rayleigh-Ritz step eigendecomposes a (3k, 3k) Gram matrix
    # with statically-unrolled Jacobi rotations (m(m-1)/2 per sweep),
    # so compile time and HLO size grow quadratically in k; and the
    # (n, 3k) trial basis only has full column rank when 3k <= n
    # (below that the gram_eps masking drops the degenerate
    # directions — correct but wasteful).
    if k > n:
        raise ValueError(
            f"lobpcg needs k <= n; got k={k}, n={n}")
    if 3 * k > n:
        warnings.warn(
            f"lobpcg trial basis (n={n}, 3k={3*k}) is rank-deficient; "
            "fine for toy sizes, but prefer 3*k <= n", stacklevel=2)
    if k > 32:
        warnings.warn(
            f"lobpcg block size k={k} unrolls {3*k*(3*k-1)//2} Jacobi "
            "rotations per sweep in the Rayleigh-Ritz step; compile "
            "time grows quadratically — consider k <= 32 or batching "
            "the spectrum in slices", stacklevel=2)
    if gram_eps is None:
        # The degenerate-direction mask must sit WELL above the
        # working precision's epsilon: a fixed 1e-10 is fine in f64
        # (~450 eps) but far below f32's eps=1.2e-7, where it keeps
        # numerically-garbage basis directions and the iteration
        # diverges (measured: 1e19-scale "eigenvalues" on TPU f32).
        gram_eps = float(np.finfo(np.dtype(dtype)).eps) * 1e3
    sign = -1.0 if largest else 1.0
    if mask is not None:
        mask = jnp.asarray(mask, dtype).reshape(-1, 1)
        X0 = X0 * mask
    return _lobpcg_impl(matmat, X0, preconditioner, largest, tol,
                        max_iterations, gram_eps, sign, n, k, dtype,
                        mask)


def _lobpcg_impl(matmat, X0, preconditioner, largest, tol,
                 max_iterations, gram_eps, sign, n, k, dtype,
                 row_mask=None):
    # Orthonormalize X0 and seed P with random directions so the
    # (n, 3k) basis has full column count from step one.  ``mask``
    # (optional (n, 1) 0/1) confines the basis to the real rows of a
    # PADDED layout (e.g. the sharded stacked (P, R) vectors):
    # without it the random directions alias the operator's padding
    # null-space and surface as spurious zero eigenvalues.
    cX, _ = _ortho_coeffs(_mmh(X0.T, X0), gram_eps)
    X = _mmh(X0, cX)
    key = jax.random.PRNGKey(0)
    P = jax.random.normal(key, (n, k), dtype)
    if row_mask is not None:
        P = P * row_mask
    AX = matmat(X)
    AP = matmat(P)
    theta0 = _coldot(X, AX)

    def body(state):
        X, AX, P, AP, _theta, _res, it = state
        theta = _coldot(X, AX)
        R = AX - X * theta[None, :]
        W = preconditioner(R) if preconditioner is not None else R
        if row_mask is not None:
            W = W * row_mask
        # Per-column normalization of the W and P blocks conditions
        # the Gram matrix (their natural scales shrink toward zero as
        # the iteration converges).
        def _colnorm(B):
            s = jnp.sqrt(_coldot(B, B))
            return B / jnp.maximum(s, jnp.asarray(1e-30, dtype))[None]

        W = _colnorm(W)
        AW = matmat(W)
        Pn = jnp.sqrt(_coldot(P, P))
        Ps = jnp.maximum(Pn, jnp.asarray(1e-30, dtype))[None, :]

        S = jnp.concatenate([X, W, P / Ps], axis=1)     # (n, 3k)
        AS = jnp.concatenate([AX, AW, AP / Ps], axis=1)
        G = _mmh(S.T, S)
        Vinv, mask = _ortho_coeffs(G, gram_eps)
        H = _mmh(_mmh(Vinv.T, _mmh(S.T, AS)), Vinv)
        H = 0.5 * (H + H.T)
        # Degenerate directions must sort AWAY from the selected end.
        # The penalty is spectrum-scaled (2 ||H||_F >= 2 ||H||_2): an
        # absolute constant like 1e30 would wreck eigh's accuracy for
        # every OTHER eigenvalue (LAPACK's error is relative to ||H||).
        pen = 2.0 * jnp.sqrt(jnp.sum(H * H)) + 1.0
        H = H + jnp.diag(jnp.where(mask, 0.0, sign * pen))
        # eigh sorts ascending: with sign applied, the first k columns
        # are the wanted end of the spectrum (the Ritz VALUES are not
        # used — theta is recomputed as exact Rayleigh quotients of
        # the polished block below).
        _evals, C = _small_eigh(sign * H)
        coeff = _mmh(Vinv, C[:, :k])                     # S-basis
        # Eigh EIGENVALUES are accurate everywhere, but its
        # EIGENVECTOR matrices are only ~5e-3-orthogonal in f32 on
        # TPU (QDWH; measured, unlike LAPACK's ~eps) — through both
        # the whitening and the Ritz rotation that would leave X_new
        # non-orthonormal and stall the residual at ~1e-2.  Polish
        # the combined coefficients against the ACCURATE metric G
        # with a Newton-Schulz inverse square root: M = coeff^T G
        # coeff is within O(1e-2) of I, where the iteration converges
        # quadratically using nothing but small matmuls (f32-exact).
        M = _mmh(_mmh(coeff.T, G), coeff)
        T = jnp.eye(k, dtype=dtype)
        eye_k = jnp.eye(k, dtype=dtype)
        for _ in range(3):
            T = 0.5 * _mmh(T, 3.0 * eye_k - _mmh(M, _mmh(T, T)))
        coeff = _mmh(coeff, T)
        X_new = _mmh(S, coeff)
        AX_new = _mmh(AS, coeff)
        theta_new = _coldot(X_new, AX_new)
        # P spans only the W/P contribution of the update (classical
        # LOBPCG three-term recurrence).
        coeff_wp = coeff.at[:k, :].set(0.0)
        P_new = _mmh(S, coeff_wp)
        AP_new = _mmh(AS, coeff_wp)

        R_new = AX_new - X_new * theta_new[None, :]
        res = jnp.sqrt(_coldot(R_new, R_new))
        return (X_new, AX_new, P_new, AP_new, theta_new, res, it + 1)

    def cond(state):
        _X, _AX, _P, _AP, theta, res, it = state
        # Block-wide spectral scale: the attainable residual floor of
        # the Gram-based basis scales with the operator norm, not with
        # each column's own (possibly tiny) Rayleigh quotient — a
        # per-column |theta_j| scale would demand unattainable
        # absolute residuals from the smallest eigenpair of an
        # ill-conditioned operator.
        scale = jnp.maximum(jnp.max(jnp.abs(theta)), 1.0)
        return jnp.logical_and(
            jnp.any(res > tol * scale), it < max_iterations
        )

    res0 = jnp.full((k,), jnp.inf, dtype)
    state = (X, AX, P, AP, theta0, res0,
             jnp.array(0, jnp.int32))
    X, AX, P, AP, theta, res, it = jax.lax.while_loop(cond, body, state)
    # One final Rayleigh-quotient pass on the returned block.
    theta = _coldot(X, AX)
    R = AX - X * theta[None, :]
    res = jnp.sqrt(_coldot(R, R))
    order = jnp.argsort(-theta if largest else theta)
    return EigResult(
        eigenvalues=theta[order],
        eigenvectors=X[:, order],
        residual_norms=res[order],
        iterations=it,
    )


def dia_eigsh(
    A,
    k: int = 4,
    which: str = "smallest",
    preconditioner: Callable[[jax.Array], jax.Array] = None,
    tol: float = 1e-6,
    max_iterations: int = 200,
    seed: int = 0,
    dtype=None,
) -> EigResult:
    """k extreme eigenpairs of a symmetric DeviceDia operator.

    Convenience wrapper: pseudorandom orthonormal start, XLA SpMM
    matmat (eigenproblems live at/below residency scale — the
    spectral information for a streaming-scale matrix comes from
    ``lanczos_bounds``).  ``which`` is "smallest" or "largest".
    """
    from spmv_tpu.ops.spmv import spmm as _spmm

    if which not in ("smallest", "largest"):
        raise ValueError(
            f"which must be 'smallest' or 'largest', got {which!r}")
    if A.num_rows != A.num_columns:
        raise ValueError("dia_eigsh requires a square matrix")
    dtype = dtype or A.data.dtype
    X0 = jax.random.normal(
        jax.random.PRNGKey(seed), (A.num_rows, k), dtype)
    return lobpcg(
        lambda V: _spmm(A, V), X0, preconditioner=preconditioner,
        largest=(which == "largest"), tol=tol,
        max_iterations=max_iterations,
    )
