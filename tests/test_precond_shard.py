"""Sharded block-Jacobi IC(0) preconditioning (VERDICT r4 item 4).

Each shard factors and solves only its diagonal block — the classic
domain-decomposition preconditioner, zero collectives beyond the halo
exchange + psum dots the solver already pays (the solver-layer
analogue of the reference's NUMA-domain locality model,
cache-trace.cpp:156-160).  The contract pinned here: on an
anisotropic Laplacian the block-IC(0) PCG needs FEWER iterations
than diagonal-Jacobi PCG, and the apply matches a dense
blockdiag(A_pp)^-1-ish solve (IC(0) is exact on each block here
because the test block patterns fill in enough).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmv_tpu.io.generate import anisotropic2d, poisson2d
from spmv_tpu.models import CsrMatrix
from spmv_tpu.ops import (
    extract_diagonal,
    jacobi_preconditioner,
    preconditioned_conjugate_gradient,
)
from spmv_tpu.parallel import (
    make_mesh,
    make_sharded_halo_matvec,
    shard_csr,
    shard_csr_halo,
    stack_vector,
    unstack_vector,
)
from spmv_tpu.parallel.precond_shard import (
    block_jacobi_ic0,
    make_sharded_block_ic0_preconditioner,
    sharded_block_ic0_apply,
)

P_SHARDS = 8


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(P_SHARDS)


def _setup(mm, mesh):
    host = CsrMatrix.from_matrix_market(mm)
    A = shard_csr(host, P_SHARDS, partition="nnz", mesh=mesh)
    Ah = shard_csr_halo(host, P_SHARDS, partition="nnz", mesh=mesh)
    assert tuple(A.bounds) == tuple(Ah.bounds)
    assert A.rows_per_shard == Ah.rows_per_shard
    return host, A, Ah


def test_block_ic0_apply_matches_host_solve(mesh):
    """The sharded apply equals the per-block host solve
    L^-T (L^-1 r) computed with scipy-free numpy."""
    mm = poisson2d(16, 16)
    host, A, Ah = _setup(mm, mesh)
    M = block_jacobi_ic0(host, Ah.bounds, Ah.rows_per_shard,
                         mesh=mesh)
    rng = np.random.default_rng(0)
    r = rng.standard_normal(host.num_rows)
    rs = stack_vector(r, A, mesh=mesh)
    zs = sharded_block_ic0_apply(M, rs, mesh)
    z = unstack_vector(zs, A)

    # host reference: per block, dense L from the IC(0) factor
    from spmv_tpu.ops.incomplete import ic0_factor

    bounds = np.asarray(Ah.bounds)
    want = np.zeros_like(r)
    for p in range(P_SHARDS):
        b0, b1 = int(bounds[p]), int(bounds[p + 1])
        nb = b1 - b0
        if nb == 0:
            continue
        # extract the diagonal block densely
        blk = np.zeros((nb, nb))
        rp = np.asarray(host.row_ptr)
        cols = np.asarray(host.column_index)
        vals = np.asarray(host.value)
        for i in range(b0, b1):
            for t in range(rp[i], rp[i + 1]):
                j = cols[t]
                if b0 <= j < b1:
                    blk[i - b0, j - b0] = vals[t]
        Lc = ic0_factor(CsrMatrix.from_dense(blk)
                        if hasattr(CsrMatrix, "from_dense")
                        else _csr_of_dense(blk))
        Ld = np.zeros((nb, nb))
        lrp = np.asarray(Lc.row_ptr)
        lcols = np.asarray(Lc.column_index)
        lvals = np.asarray(Lc.value)
        for i in range(nb):
            for t in range(lrp[i], lrp[i + 1]):
                Ld[i, lcols[t]] = lvals[t]
        y = np.linalg.solve(Ld, r[b0:b1])
        want[b0:b1] = np.linalg.solve(Ld.T, y)
    np.testing.assert_allclose(z, want, rtol=1e-8, atol=1e-10)


def _csr_of_dense(a):
    n = a.shape[0]
    rows, cols = np.nonzero(a)
    rp = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=rp[1:])
    return CsrMatrix(
        num_rows=n, num_columns=n, num_entries=rows.size,
        row_alignment=1, row_ptr=rp,
        column_index=cols.astype(np.int32), value=a[rows, cols],
    )


def test_block_ic0_pcg_beats_jacobi_on_anisotropic(mesh):
    """Fewer PCG iterations than diagonal Jacobi on an anisotropic
    Laplacian, same answer."""
    mm = anisotropic2d(24, 24, epsilon=0.01)
    host, A, Ah = _setup(mm, mesh)
    matvec = make_sharded_halo_matvec(Ah, mesh)
    rng = np.random.default_rng(1)
    x_true = rng.standard_normal(host.num_rows)
    b = host.spmv(x_true)
    bs = stack_vector(b, A, mesh=mesh)

    diag_s = stack_vector(extract_diagonal(host), A, mesh=mesh)
    jac = jacobi_preconditioner(diag_s.astype(bs.dtype))
    res_j = jax.jit(lambda v: preconditioned_conjugate_gradient(
        matvec, v, jac, tol=1e-8, max_iterations=2000))(bs)

    M = block_jacobi_ic0(host, Ah.bounds, Ah.rows_per_shard,
                         mesh=mesh)
    pre = make_sharded_block_ic0_preconditioner(M, mesh)
    res_b = jax.jit(lambda v: preconditioned_conjugate_gradient(
        matvec, v, pre, tol=1e-8, max_iterations=2000))(bs)

    x_b = unstack_vector(res_b.x, A)
    err = np.linalg.norm(x_b - x_true) / np.linalg.norm(x_true)
    assert err < 1e-5, err
    it_j, it_b = int(res_j.iterations), int(res_b.iterations)
    assert it_b < it_j, (it_b, it_j)


def test_block_ic0_shift_ladder():
    """A block that breaks down at shift 0 escalates the Manteuffel
    ladder instead of failing."""
    # an SPD-ish matrix whose IC(0) pattern loses positivity: strong
    # off-diagonals relative to the diagonal
    n = 32
    a = np.eye(n)
    for i in range(n - 1):
        a[i, i + 1] = a[i + 1, i] = -0.49
    for i in range(n - 2):
        a[i, i + 2] = a[i + 2, i] = -0.49
    host = _csr_of_dense(a)
    bounds = np.array([0, 16, 32])
    M = block_jacobi_ic0(host, bounds, rows_per_shard=24,
                         shifts=(0.0, 0.05, 0.2, 0.5, 2.0))
    assert M.shift_used >= 0.0
    assert M.num_shards == 2
