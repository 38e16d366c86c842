"""Halo-exchange sharded WELL-CW (VERDICT r2 item 3).

The scattered-matrix flagship format's multi-device path, verified on
the 8-virtual-device CPU mesh: correctness vs dense fp64 ground truth,
exchange-strategy selection, byte counts vs the analytic remote-traffic
model (parallel.halo.communication_volume — the reference's
[thread][numa_domain] miss-matrix analogue, csr-matrix.cpp:132-136),
bit-for-bit agreement between the neighbor and all2all exchanges, and
CG through the sharded matvec.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spmv_tpu.errors import MatrixError
from spmv_tpu.io.generate import banded_random, poisson2d, random_sparse
from spmv_tpu.models import CsrMatrix
from spmv_tpu.ops import conjugate_gradient
from spmv_tpu.parallel import (
    communication_volume,
    make_mesh,
    make_sharded_wellcw_halo_matvec,
    shard_wellcw_halo,
    sharded_wellcw_halo_spmv,
    stack_vector,
    unstack_vector,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def _dense_of(mm):
    A = np.zeros((mm.num_rows, mm.num_columns))
    np.add.at(A, (mm.rows_1based - 1, mm.cols_1based - 1), mm.values)
    return A


CASES = [
    ("banded", banded_random(4000, 300, 8, seed=3), "neighbor"),
    ("scattered", random_sparse(3000, 3000, 6, seed=4), "all2all"),
    ("stencil", poisson2d(64, 64), "neighbor"),
]


@pytest.mark.parametrize("name,mm,expect_exchange", CASES,
                         ids=[c[0] for c in CASES])
@pytest.mark.slow
def test_sharded_matches_dense(mesh, name, mm, expect_exchange):
    m = CsrMatrix.from_matrix_market(mm)
    A = shard_wellcw_halo(m, 8, mesh=mesh)
    assert A.exchange == expect_exchange
    x = np.random.default_rng(0).standard_normal(m.num_columns)
    xs = stack_vector(x, A, mesh=mesh)
    y = unstack_vector(sharded_wellcw_halo_spmv(A, xs, mesh), A)
    want = _dense_of(mm) @ x
    np.testing.assert_allclose(y, want, rtol=1e-11, atol=1e-11)


def test_comm_volume_matches_model(mesh):
    mm = banded_random(4000, 300, 8, seed=5)
    m = CsrMatrix.from_matrix_market(mm)
    A = shard_wellcw_halo(m, 8, mesh=mesh)
    # bounds are 128-aligned inside the builder; re-derive the model's
    # halo count on the SAME bounds (also asserted at build time)
    vol = communication_volume(m, np.asarray(A.bounds))
    assert A.comm_elements_exact == vol["halo_elements"]
    assert A.comm_elements_padded >= A.comm_elements_exact


@pytest.mark.slow
def test_forced_all2all_bitwise_matches_neighbor(mesh):
    # the exchange only changes how halo values ARRIVE, not which
    # values feed which cell — the two strategies must agree exactly
    mm = banded_random(3000, 200, 7, seed=6)
    m = CsrMatrix.from_matrix_market(mm)
    An = shard_wellcw_halo(m, 8, mesh=mesh, exchange="neighbor")
    Aa = shard_wellcw_halo(m, 8, mesh=mesh, exchange="all2all")
    assert An.exchange == "neighbor" and Aa.exchange == "all2all"
    x = np.random.default_rng(1).standard_normal(m.num_columns)
    yn = unstack_vector(
        sharded_wellcw_halo_spmv(An, stack_vector(x, An, mesh=mesh),
                                 mesh), An)
    ya = unstack_vector(
        sharded_wellcw_halo_spmv(Aa, stack_vector(x, Aa, mesh=mesh),
                                 mesh), Aa)
    np.testing.assert_array_equal(yn, ya)


@pytest.mark.slow
def test_sharded_cg(mesh):
    mm = poisson2d(48, 48)
    m = CsrMatrix.from_matrix_market(mm)
    A = shard_wellcw_halo(m, 8, mesh=mesh)
    rng = np.random.default_rng(2)
    x_true = rng.standard_normal(m.num_rows)
    b = _dense_of(mm) @ x_true
    bs = stack_vector(b, A, mesh=mesh)
    matvec = make_sharded_wellcw_halo_matvec(A, mesh)
    res = conjugate_gradient(matvec, bs, tol=1e-10,
                             max_iterations=600)
    x = unstack_vector(np.asarray(res.x), A)
    rel = np.linalg.norm(x - x_true) / np.linalg.norm(x_true)
    assert rel < 1e-6, (rel, int(res.iterations))


@pytest.mark.slow
def test_single_shard_and_guards(mesh):
    mm = random_sparse(500, 500, 5, seed=7)
    m = CsrMatrix.from_matrix_market(mm)
    A = shard_wellcw_halo(m, 1)
    assert A.exchange == "none"
    x = np.random.default_rng(3).standard_normal(500)
    y = unstack_vector(
        sharded_wellcw_halo_spmv(A, stack_vector(x, A),
                                 make_mesh(1)), A)
    np.testing.assert_allclose(y, _dense_of(mm) @ x, rtol=1e-11,
                               atol=1e-11)

    rect = CsrMatrix.from_matrix_market(
        random_sparse(300, 400, 4, seed=8))
    with pytest.raises(MatrixError):
        shard_wellcw_halo(rect, 4)
