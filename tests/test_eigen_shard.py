"""Distributed LOBPCG: the block eigensolver over the sharded halo
SpMM (round 5).

The eigensolver takes any matmat; here it rides
``make_sharded_halo_matmat`` — ONE halo exchange per iteration moves
every basis column's strips together (collective count flat in k),
and the solver's Gram algebra runs on the globally-sharded stacked
vectors with XLA-inserted reductions.  The stacked layout's padding
rows need the ``mask`` argument: without it the random basis
directions alias the padded operator's null-space and come back as
spurious zero eigenvalues (pinned below).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import CsrMatrix
from spmv_tpu.ops import lobpcg
from spmv_tpu.parallel import (
    make_mesh,
    make_sharded_halo_matmat,
    shard_csr_halo,
    sharded_halo_spmm,
    stack_block,
    unstack_block,
)

P_SHARDS = 8


def _poisson_eigs(nx, ny):
    i = np.arange(1, nx + 1)
    j = np.arange(1, ny + 1)
    lam = (4.0 - 2.0 * np.cos(i * np.pi / (nx + 1))[:, None]
           - 2.0 * np.cos(j * np.pi / (ny + 1))[None, :])
    return np.sort(lam.reshape(-1))


@pytest.fixture(scope="module")
def setup():
    mesh = make_mesh(P_SHARDS)
    mm = poisson2d(16, 16)
    host = CsrMatrix.from_matrix_market(mm)
    Ah = shard_csr_halo(host, P_SHARDS, partition="nnz", mesh=mesh)
    return mesh, mm, host, Ah


def test_sharded_spmm_matches_host(setup):
    mesh, mm, host, Ah = setup
    rng = np.random.default_rng(0)
    V = rng.standard_normal((host.num_rows, 3))
    Vs = stack_block(V, Ah, mesh=mesh)
    Ys = sharded_halo_spmm(Ah, Vs, mesh)
    Y = unstack_block(Ys, Ah)
    want = np.stack([host.spmv(V[:, j]) for j in range(3)], axis=1)
    np.testing.assert_allclose(Y, want, atol=1e-10)


def test_sharded_lobpcg_smallest(setup):
    mesh, mm, host, Ah = setup
    k = 4
    matmat = make_sharded_halo_matmat(Ah, mesh)
    n_stacked = Ah.num_shards * Ah.rows_per_shard

    # validity mask for the stacked layout's padding rows
    bounds = np.asarray(Ah.bounds)
    m = np.zeros((Ah.num_shards, Ah.rows_per_shard))
    for p in range(Ah.num_shards):
        m[p, : bounds[p + 1] - bounds[p]] = 1.0
    m[:, Ah.rows_per_shard - 1] = 0.0   # sacrificial overflow row
    mask = jnp.asarray(m.reshape(-1))

    rng = np.random.default_rng(1)
    X0 = stack_block(rng.standard_normal((host.num_rows, k)), Ah,
                     mesh=mesh)

    @jax.jit
    def solve(X0):
        Xf = X0.reshape(n_stacked, k)
        res = lobpcg(
            lambda V: matmat(
                V.reshape(Ah.num_shards, Ah.rows_per_shard, k)
            ).reshape(n_stacked, k),
            Xf, tol=1e-9, max_iterations=400, mask=mask)
        return res

    res = solve(X0)
    want = _poisson_eigs(16, 16)[:k]
    np.testing.assert_allclose(np.asarray(res.eigenvalues), want,
                               rtol=1e-7)
    # eigenvector check through the sharded operator
    V = np.asarray(res.eigenvectors)
    AV = np.asarray(unstack_block(
        sharded_halo_spmm(
            Ah, jnp.asarray(V).reshape(
                Ah.num_shards, Ah.rows_per_shard, k), mesh),
        Ah))
    Vh = unstack_block(
        np.asarray(V).reshape(Ah.num_shards, Ah.rows_per_shard, k),
        Ah)
    resid = np.linalg.norm(AV - Vh * np.asarray(res.eigenvalues),
                           axis=0)
    assert np.all(resid < 1e-7), resid


@pytest.mark.slow
def test_sharded_wellcw_spmm_and_lobpcg():
    """Multi-RHS on the SCATTERED sharded format: one halo exchange
    per product regardless of k, and the distributed LOBPCG runs on
    it (symmetrized scattered fixture)."""
    from spmv_tpu.io.generate import random_sparse
    from spmv_tpu.parallel import (
        make_sharded_wellcw_halo_matmat,
        shard_wellcw_halo,
        sharded_wellcw_halo_spmm,
    )

    mesh = make_mesh(P_SHARDS)
    base = random_sparse(512, 512, 5, seed=4)
    # SPD-ize: A = S + S^T + diag shift (host dense, small fixture)
    dense = np.zeros((512, 512))
    np.add.at(dense, (base.rows_1based - 1, base.cols_1based - 1),
              base.values)
    dense = dense + dense.T
    dense[np.diag_indices(512)] += np.abs(dense).sum(axis=1) + 1.0
    from spmv_tpu.io.generate import from_coo_arrays

    r, c = np.nonzero(dense)
    mm = from_coo_arrays(512, 512, r, c, dense[r, c])
    host = CsrMatrix.from_matrix_market(mm)
    Ac = shard_wellcw_halo(host, P_SHARDS, mesh=mesh,
                           exchange="all2all")

    rng = np.random.default_rng(5)
    V = rng.standard_normal((512, 3))
    Vs = stack_block(V, Ac, mesh=mesh)
    Y = unstack_block(sharded_wellcw_halo_spmm(Ac, Vs, mesh), Ac)
    want = dense @ V
    np.testing.assert_allclose(Y, want, rtol=1e-9, atol=1e-9)

    # distributed LOBPCG on the scattered operator
    k = 2
    matmat = make_sharded_wellcw_halo_matmat(Ac, mesh)
    n_stacked = Ac.num_shards * Ac.rows_per_shard
    bounds = np.asarray(Ac.bounds)
    m = np.zeros((Ac.num_shards, Ac.rows_per_shard))
    for p in range(Ac.num_shards):
        m[p, : bounds[p + 1] - bounds[p]] = 1.0
    m[:, Ac.rows_per_shard - 1] = 0.0
    mask = jnp.asarray(m.reshape(-1))
    X0 = stack_block(rng.standard_normal((512, k)), Ac, mesh=mesh)
    res = lobpcg(
        lambda W: matmat(
            W.reshape(Ac.num_shards, Ac.rows_per_shard, k)
        ).reshape(n_stacked, k),
        X0.reshape(n_stacked, k), tol=1e-8, max_iterations=600,
        mask=mask)
    want_eigs = np.sort(np.linalg.eigvalsh(dense))[:k]
    np.testing.assert_allclose(np.asarray(res.eigenvalues),
                               want_eigs, rtol=1e-6)


def test_sharded_lobpcg_without_mask_is_poisoned(setup):
    """The failure mode the mask exists for: without it, the padded
    layout's null-space rows surface as spurious ~0 eigenvalues."""
    mesh, mm, host, Ah = setup
    k = 2
    matmat = make_sharded_halo_matmat(Ah, mesh)
    n_stacked = Ah.num_shards * Ah.rows_per_shard
    rng = np.random.default_rng(2)
    X0 = jnp.asarray(rng.standard_normal((n_stacked, k)))

    res = lobpcg(
        lambda V: matmat(
            V.reshape(Ah.num_shards, Ah.rows_per_shard, k)
        ).reshape(n_stacked, k),
        X0, tol=1e-9, max_iterations=100)
    want = _poisson_eigs(16, 16)[:k]
    # at least one returned value collapses toward the padding
    # null-space instead of the true spectrum
    assert np.any(np.asarray(res.eigenvalues) < 0.5 * want[0])