"""Halo-exchange sharded CSR (VERDICT r1 next-round #2).

Verifies on the 8-virtual-device CPU mesh that exchanging only the
halo strips of x (ppermute / all_to_all) reproduces the all-gather
path's results, that the exchange strategy is picked from the halo
plan, and that the communication volume matches the analytic model
(parallel.halo.communication_volume) — the byte-count check the
reference's remote-traffic model implies (csr-matrix.cpp:132-136).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spmv_tpu.errors import MatrixError
from spmv_tpu.io.generate import poisson2d, random_sparse
from spmv_tpu.models import CsrMatrix
from spmv_tpu.ops import conjugate_gradient
from spmv_tpu.parallel import (
    communication_volume,
    make_mesh,
    make_sharded_halo_matvec,
    make_sharded_matvec,
    shard_csr,
    shard_csr_halo,
    sharded_halo_spmv,
    sharded_spmv,
    stack_vector,
    unstack_vector,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def _dense_spmv(mm, x):
    A = np.zeros((mm.num_rows, mm.num_columns))
    np.add.at(A, (mm.rows_1based - 1, mm.cols_1based - 1), mm.values)
    return A @ x


@pytest.mark.parametrize("gen,kw", [
    pytest.param(poisson2d, dict(), marks=pytest.mark.slow),
    (random_sparse, dict(seed=7)),       # scattered -> all2all
])
def test_halo_matches_allgather_and_host(mesh, gen, kw):
    if gen is poisson2d:
        mm = gen(16, 16)
    else:
        mm = gen(200, 200, 6, **kw)
    m = CsrMatrix.from_matrix_market(mm)
    x = np.random.default_rng(3).standard_normal(m.num_rows)

    Ah = shard_csr_halo(m, 8)
    Ag = shard_csr(m, 8)
    assert Ah.bounds == Ag.bounds
    assert Ah.rows_per_shard == Ag.rows_per_shard

    xs = stack_vector(x, Ag, mesh)
    yg = unstack_vector(sharded_spmv(Ag, xs, mesh), Ag)
    yh = unstack_vector(sharded_halo_spmv(Ah, xs, mesh), Ag)

    np.testing.assert_allclose(yh, _dense_spmv(mm, x), rtol=1e-10)
    # same partition, same per-row contraction sets: agreement with the
    # all-gather path down to summation-order rounding
    np.testing.assert_allclose(yh, yg, rtol=1e-13)


def test_exchange_strategy_selection():
    # 5-point stencil rows only read +-width neighbors: one-shard reach
    mm = poisson2d(16, 16)
    m = CsrMatrix.from_matrix_market(mm)
    Ah = shard_csr_halo(m, 8)
    assert Ah.exchange == "neighbor"
    assert Ah.max_distance >= 1

    # random 200x200 over 8 shards: columns land everywhere
    mm2 = random_sparse(200, 200, 6, seed=7)
    m2 = CsrMatrix.from_matrix_market(mm2)
    Ah2 = shard_csr_halo(m2, 8)
    assert Ah2.exchange == "all2all"

    # forced mode must also be correct
    Af = shard_csr_halo(m, 8, exchange="all2all")
    assert Af.exchange == "all2all"


def test_comm_volume_matches_model():
    mm = poisson2d(16, 16)
    m = CsrMatrix.from_matrix_market(mm)
    Ah = shard_csr_halo(m, 8)
    vol = communication_volume(
        m, np.asarray(Ah.bounds, dtype=np.int64)
    )
    # the plan moves exactly the model's halo elements (plus padding)
    assert Ah.comm_elements_exact == vol["halo_elements"]
    assert Ah.comm_elements_padded >= Ah.comm_elements_exact
    # and orders of magnitude less than all-gather for the stencil
    assert Ah.comm_elements_padded < vol["all_gather_elements"]


@pytest.mark.slow
def test_forced_all2all_matches_neighbor(mesh):
    mm = poisson2d(12, 12)
    m = CsrMatrix.from_matrix_market(mm)
    x = np.random.default_rng(5).standard_normal(m.num_rows)
    An = shard_csr_halo(m, 8)                      # auto -> neighbor
    Aa = shard_csr_halo(m, 8, exchange="all2all")
    Ag = shard_csr(m, 8)
    xs = stack_vector(x, Ag, mesh)
    yn = unstack_vector(sharded_halo_spmv(An, xs, mesh), Ag)
    ya = unstack_vector(sharded_halo_spmv(Aa, xs, mesh), Ag)
    np.testing.assert_allclose(yn, ya, rtol=1e-13)


@pytest.mark.slow
def test_halo_cg_matches_allgather_cg(mesh):
    mm = poisson2d(16, 16)
    m = CsrMatrix.from_matrix_market(mm)
    rng = np.random.default_rng(1)
    x_true = rng.standard_normal(m.num_rows)
    b = _dense_spmv(mm, x_true)

    Ah = shard_csr_halo(m, 8)
    Ag = shard_csr(m, 8)
    bs = stack_vector(b, Ag, mesh)

    xh, resh, ith = conjugate_gradient(
        make_sharded_halo_matvec(Ah, mesh), bs, tol=1e-8, max_iterations=400
    )
    xg, resg, itg = conjugate_gradient(
        make_sharded_matvec(Ag, mesh), bs, tol=1e-8, max_iterations=400
    )
    np.testing.assert_allclose(
        unstack_vector(xh, Ag), x_true, rtol=1e-5, atol=1e-5
    )
    assert abs(int(ith) - int(itg)) <= 2


def test_single_shard_and_rectangular():
    mm = poisson2d(8, 8)
    m = CsrMatrix.from_matrix_market(mm)
    A1 = shard_csr_halo(m, 1)
    assert A1.exchange == "none"
    mesh1 = make_mesh(1)
    x = np.random.default_rng(2).standard_normal(m.num_rows)
    xs = stack_vector(x, shard_csr(m, 1), mesh1)
    y = unstack_vector(sharded_halo_spmv(A1, xs, mesh1), shard_csr(m, 1))
    np.testing.assert_allclose(y, _dense_spmv(mm, x), rtol=1e-10)

    rect = random_sparse(60, 40, 3, seed=1)
    mr = CsrMatrix.from_matrix_market(rect)
    with pytest.raises(MatrixError):
        shard_csr_halo(mr, 4)


# --- WELL halo variant -----------------------------------------------------


@pytest.mark.slow
def test_well_halo_matches_allgather(mesh):
    from spmv_tpu.parallel import (
        shard_well, shard_well_halo,
        sharded_well_spmv, sharded_well_halo_spmv,
    )

    for mk in (lambda: poisson2d(20, 20),
               lambda: random_sparse(300, 300, 6, seed=9)):
        mm = mk()
        m = CsrMatrix.from_matrix_market(mm)
        x = np.random.default_rng(4).standard_normal(m.num_rows)

        Ag = shard_well(m, 8, window_rows=2)
        Ah = shard_well_halo(m, 8, window_rows=2)
        assert Ah.bounds == Ag.bounds

        xs = stack_vector(x, Ag, mesh=mesh)
        yg = np.asarray(sharded_well_spmv(Ag, xs, mesh))
        yh = np.asarray(sharded_well_halo_spmv(Ah, xs, mesh))
        np.testing.assert_allclose(yh, yg, rtol=1e-12)

        # and the halo path matches the dense host product
        y = unstack_vector(yh, Ag)
        np.testing.assert_allclose(y, _dense_spmv(mm, x), rtol=1e-10)
        # halo moves less than the all-gather path
        assert Ah.comm_elements_padded < (8 - 1) * Ag.stacked_size
