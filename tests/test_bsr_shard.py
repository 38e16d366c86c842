"""Halo-exchange sharded BSR on the 8-virtual-device CPU mesh.

Block-granular halos: each remote reference moves a whole 128-column
x tile.  Checks vs the single-device SpMM/SpMV, both exchange
branches, CG through the sharded matvec, and the exchanged-volume
accounting (comm_elements = 128 x distinct remote block columns,
an upper bound on the element-granular analytic model).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spmv_tpu.errors import MatrixError
from spmv_tpu.io.generate import poisson2d, random_sparse
from spmv_tpu.models import CsrMatrix
from spmv_tpu.models.bsr import BLOCK, BsrMatrix
from spmv_tpu.models.device import DeviceBsr
from spmv_tpu.ops.spmv import spmm
from spmv_tpu.parallel import (
    communication_volume,
    make_mesh,
    make_sharded_bsr_matvec,
    shard_bsr_halo,
    sharded_bsr_spmm,
    sharded_bsr_spmv,
)
from spmv_tpu.parallel.bsr_shard import stack_columns, unstack_rows


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def _dense(mm):
    A = np.zeros((mm.num_rows, mm.num_columns))
    np.add.at(A, (mm.rows_1based - 1, mm.cols_1based - 1), mm.values)
    return A


@pytest.mark.parametrize("gen,kw,expect", [
    # banded/neighbor rides with the slow suite (the all2all case
    # keeps the fast-core signal; coverage moved, not deleted)
    pytest.param(poisson2d, dict(), "neighbor",
                 marks=pytest.mark.slow),
    (random_sparse, dict(seed=3), "all2all"),  # scattered
])
def test_sharded_bsr_matches_host(mesh, gen, kw, expect):
    if gen is poisson2d:
        mm = gen(40, 40)          # 1600 rows
    else:
        mm = gen(1600, 1600, 4, **kw)
    host = BsrMatrix.from_matrix_market(mm, block_rows=8)
    A = shard_bsr_halo(host, 8, mesh=mesh)
    assert A.exchange == expect
    assert A.rows_per_shard % BLOCK == 0

    rng = np.random.default_rng(1)
    k = 4
    X = rng.standard_normal((host.num_columns, k))
    Xs = stack_columns(X, A, mesh)
    Y = unstack_rows(sharded_bsr_spmm(A, Xs, mesh), A)
    np.testing.assert_allclose(Y, _dense(mm) @ X, rtol=1e-10,
                               atol=1e-12)

    # SpMV leg (2-D stacked input)
    x = X[:, 0]
    xs = stack_columns(x, A, mesh)[..., 0]
    y = np.asarray(sharded_bsr_spmv(A, xs, mesh)).reshape(-1)
    np.testing.assert_allclose(y[: host.num_rows], _dense(mm) @ x,
                               rtol=1e-10, atol=1e-12)


def test_sharded_matches_single_device(mesh):
    mm = poisson2d(32, 32)
    host = BsrMatrix.from_matrix_market(mm, block_rows=16)
    A = shard_bsr_halo(host, 8, mesh=mesh)
    dev = DeviceBsr.from_host(host)

    rng = np.random.default_rng(4)
    X = rng.standard_normal((host.num_columns, 3))
    want = np.asarray(spmm(dev, jnp.asarray(X)))
    got = unstack_rows(
        sharded_bsr_spmm(A, stack_columns(X, A, mesh), mesh), A)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_forced_exchange_branches_agree(mesh):
    mm = poisson2d(24, 24)
    host = BsrMatrix.from_matrix_market(mm, block_rows=8)
    rng = np.random.default_rng(5)
    x = rng.standard_normal(host.num_columns)
    outs = {}
    for ex in ("neighbor", "all2all"):
        A = shard_bsr_halo(host, 8, mesh=mesh, exchange=ex)
        assert A.exchange == ex
        xs = stack_columns(x, A, mesh)
        outs[ex] = unstack_rows(
            sharded_bsr_spmm(A, xs, mesh), A).ravel()
    np.testing.assert_allclose(outs["neighbor"], outs["all2all"],
                               rtol=1e-13)


def test_comm_volume_accounting():
    mm = poisson2d(40, 40)
    host = BsrMatrix.from_matrix_market(mm, block_rows=8)
    A = shard_bsr_halo(host, 8)
    # block-granular exchange: exactly 128 elements per distinct
    # remote block column
    assert A.comm_elements_exact == 128 * A.comm_blocks_exact
    assert A.comm_blocks_exact > 0
    # upper-bounds the element-granular model on the same partition
    csr = CsrMatrix.from_matrix_market(mm)
    bounds = np.minimum(np.asarray(A.bounds), csr.num_rows)
    vol = communication_volume(csr, bounds)
    assert A.comm_elements_exact >= vol["halo_elements"]


def test_cg_through_sharded_bsr(mesh):
    # SPD 2-D Laplacian; CG in the stacked layout via the matvec
    # closure must converge to the dense solution.
    from spmv_tpu.ops import conjugate_gradient

    mm = poisson2d(24, 24)
    host = BsrMatrix.from_matrix_market(mm, block_rows=8)
    A = shard_bsr_halo(host, 8, mesh=mesh)
    rng = np.random.default_rng(6)
    b = rng.standard_normal(host.num_rows)
    bs = stack_columns(b, A, mesh)[..., 0]
    mv = make_sharded_bsr_matvec(A, mesh)
    res = conjugate_gradient(mv, bs, max_iterations=400, tol=1e-10)
    xd = np.linalg.solve(_dense(mm), b)
    got = np.asarray(res.x).reshape(-1)[: host.num_rows]
    np.testing.assert_allclose(got, xd, rtol=1e-6, atol=1e-8)


def test_rectangular_raises():
    mm = random_sparse(64, 96, 4, seed=8)
    host = BsrMatrix.from_matrix_market(mm, block_rows=8)
    with pytest.raises(MatrixError):
        shard_bsr_halo(host, 4)
