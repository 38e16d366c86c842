"""Smoothed-aggregation AMG (ops/amg.py + csrc/amg.cpp).

Correctness anchors:
- The host SpGEMM / transpose helpers match dense numpy products.
- Aggregation assigns every node exactly one contiguous aggregate id;
  the native pass is lockstep-identical to the Python reference.
- The Galerkin coarse operator P^T A P is symmetric positive definite
  when A is.
- AMG-PCG converges in far fewer iterations than plain CG on the 2-D
  Laplacian and produces the same solution.
- The V-cycle works as a standalone stationary iteration (residual
  contraction), accepts DIA-format input, and composes with
  iterative_refinement for fp64-accurate f32 solves.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# Long-running (VERDICT r3 item 9): excluded from the fast core;
# run with the full suite or -m slow.
pytestmark = pytest.mark.slow

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import CsrMatrix, DiaMatrix
from spmv_tpu.models.device import DeviceCsr
from spmv_tpu.ops import (
    amg_preconditioner,
    conjugate_gradient,
    iterative_refinement,
    preconditioned_conjugate_gradient,
    smoothed_aggregation_setup,
    spmv,
)
from spmv_tpu.ops import _amg_native
from spmv_tpu.ops.amg import (
    _aggregate_py,
    _as_host_csr,
    _spgemm,
    _strength_graph,
    _transpose,
)


def _dense(n_rows, n_cols, rp, cols, vals):
    A = np.zeros((n_rows, n_cols))
    rows = np.repeat(np.arange(n_rows), np.diff(rp))
    np.add.at(A, (rows, cols), vals)
    return A


def _rand_csr(n_rows, n_cols, density, seed):
    rng = np.random.default_rng(seed)
    mask = rng.random((n_rows, n_cols)) < density
    dense = np.where(mask, rng.standard_normal((n_rows, n_cols)), 0.0)
    rows, cols = np.nonzero(dense)
    rp = np.zeros(n_rows + 1, np.int64)
    np.cumsum(np.bincount(rows, minlength=n_rows), out=rp[1:])
    return (rp, cols.astype(np.int32), dense[rows, cols]), dense


def test_spgemm_matches_dense():
    (ar, ac, av), da = _rand_csr(23, 17, 0.2, 0)
    (br, bc, bv), db = _rand_csr(17, 29, 0.25, 1)
    cr, cc, cv = _spgemm(23, ar, ac, av, br, bc, bv, 29)
    np.testing.assert_allclose(_dense(23, 29, cr, cc, cv), da @ db,
                               atol=1e-13)


def test_transpose_matches_dense():
    (ar, ac, av), da = _rand_csr(13, 19, 0.3, 2)
    tr, tc, tv = _transpose(13, 19, ar, ac, av)
    np.testing.assert_allclose(_dense(19, 13, tr, tc, tv), da.T,
                               atol=0)


def test_strength_graph_filters_weak_edges():
    # 3-node chain with one weak link: 0-1 strong, 1-2 weak
    rp = np.array([0, 2, 5, 7], np.int64)
    cols = np.array([0, 1, 0, 1, 2, 1, 2], np.int32)
    vals = np.array([2.0, -1.0, -1.0, 2.0, -0.01, -0.01, 2.0])
    srp, scols, _ = _strength_graph(3, rp, cols, vals, theta=0.1)
    assert list(np.diff(srp)) == [1, 1, 0]
    assert scols[0] == 1 and scols[1] == 0


def test_aggregation_covers_all_nodes():
    mm = poisson2d(15, 15)
    m = CsrMatrix.from_matrix_market(mm)
    rp, cols, vals = _as_host_csr(m)
    srp, scols, _ = _strength_graph(m.num_rows, rp, cols, vals, 0.08)
    agg, cnt = _aggregate_py(m.num_rows, srp, scols)
    assert (agg >= 0).all()
    assert agg.max() == cnt - 1
    assert len(np.unique(agg)) == cnt
    assert cnt < m.num_rows / 2      # genuinely coarsens


@pytest.mark.skipif(not _amg_native.available(),
                    reason="no native amg library")
def test_native_aggregation_lockstep():
    for seed, shape in [(0, (20, 20)), (1, (7, 31)), (2, (1, 64))]:
        mm = poisson2d(*shape)
        m = CsrMatrix.from_matrix_market(mm)
        rp, cols, vals = _as_host_csr(m)
        srp, scols, _ = _strength_graph(m.num_rows, rp, cols, vals,
                                        0.08)
        agg_py, cnt_py = _aggregate_py(m.num_rows, srp, scols)
        agg_c, cnt_c = _amg_native.aggregate(srp, scols)
        assert cnt_c == cnt_py
        np.testing.assert_array_equal(agg_c, agg_py)


def test_galerkin_coarse_operator_is_spd():
    mm = poisson2d(12, 12)
    m = CsrMatrix.from_matrix_market(mm)
    hier = smoothed_aggregation_setup(m, coarse_size=30)
    assert len(hier.levels) >= 1
    lv = hier.levels[0]
    ac = hier.levels[1].a if len(hier.levels) > 1 else None
    if ac is None:
        # coarsest reached immediately: check via the dense inverse
        nc = hier.coarse_inv.shape[0]
        assert nc == lv.n_coarse
        return
    nc = hier.levels[1].n
    A1 = _dense(nc, nc, *ac)
    np.testing.assert_allclose(A1, A1.T, atol=1e-12)
    ew = np.linalg.eigvalsh(A1)
    assert ew[0] > 0


def test_operator_complexity_sane():
    # big enough that the dense coarse level does not dominate the
    # metric (on tiny matrices coarse_inv's n^2 swamps the fine nnz)
    mm = poisson2d(64, 64)
    m = CsrMatrix.from_matrix_market(mm)
    hier = smoothed_aggregation_setup(m, coarse_size=128)
    assert 1.0 <= hier.operator_complexity < 3.0
    # levels shrink geometrically
    sizes = [lv.n for lv in hier.levels]
    assert all(b < a for a, b in zip(sizes, sizes[1:] + [
        hier.coarse_inv.shape[0]]))


def test_amg_pcg_beats_plain_cg():
    mm = poisson2d(48, 48)
    m = CsrMatrix.from_matrix_market(mm)
    A = DeviceCsr.from_host(m)
    rng = np.random.default_rng(0)
    x_true = rng.standard_normal(m.num_rows)
    b = jnp.asarray(m.spmv(x_true))
    mv = lambda v: spmv(A, v)   # noqa: E731
    plain = conjugate_gradient(mv, b, tol=1e-10, max_iterations=5000)
    apply_m, info = amg_preconditioner(m)
    res = preconditioned_conjugate_gradient(mv, b, apply_m,
                                            tol=1e-10,
                                            max_iterations=500)
    assert info["kind"] == "sa-amg"
    assert int(res.iterations) <= int(plain.iterations) // 5
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-6,
                               atol=1e-8)


def test_vcycle_standalone_contraction():
    mm = poisson2d(24, 24)
    m = CsrMatrix.from_matrix_market(mm)
    apply_m, _ = amg_preconditioner(m)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(m.num_rows))
    A = DeviceCsr.from_host(m)
    x = jnp.zeros_like(b)
    norms = [float(jnp.linalg.norm(b))]
    for _ in range(5):
        r = b - spmv(A, x)
        x = x + apply_m(r)
        norms.append(float(jnp.linalg.norm(b - spmv(A, x))))
    # stationary V-cycle iteration contracts monotonically (measured
    # factor ~0.58/cycle with greedy aggregation on the 5-point
    # stencil; the preconditioned-CG test above is the quality gate)
    assert all(b_ < a_ for a_, b_ in zip(norms, norms[1:]))
    assert norms[-1] < 0.2 * norms[0]


def test_amg_accepts_dia_input():
    mm = poisson2d(20, 20)
    dia = DiaMatrix.from_matrix_market(mm)
    csr = CsrMatrix.from_matrix_market(mm)
    hd = smoothed_aggregation_setup(dia, coarse_size=50)
    hc = smoothed_aggregation_setup(csr, coarse_size=50)
    assert [lv.n for lv in hd.levels] == [lv.n for lv in hc.levels]
    np.testing.assert_allclose(hd.levels[0].a[2], hc.levels[0].a[2])


def test_amg_f32_refinement_reaches_fp64():
    mm = poisson2d(32, 32)
    m = CsrMatrix.from_matrix_market(mm)
    A32 = DeviceCsr.from_host(m, dtype=jnp.float32)
    apply_m, _ = amg_preconditioner(m, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    x_true = rng.standard_normal(m.num_rows)
    b = m.spmv(x_true)
    inner = jax.jit(lambda r: preconditioned_conjugate_gradient(
        lambda v: spmv(A32, v), r, apply_m, tol=1e-5,
        max_iterations=200))
    res = iterative_refinement(m, b, inner, tol=1e-12)
    assert res.residual_norm <= 1e-12 * np.linalg.norm(b)
    np.testing.assert_allclose(res.x, x_true, rtol=1e-9, atol=1e-11)


def test_cli_amg(tmp_path, capsys):
    import json

    from spmv_tpu.cli import main
    from spmv_tpu.io.matrix_market import write_matrix_market

    mm = poisson2d(32, 32)   # > coarse_size, so a real 2-level cycle
    path = tmp_path / "a.mtx"
    write_matrix_market(mm, str(path))

    rc = main(["--matrix", str(path), "-s", "csr", "--cg", "200",
               "--precondition", "amg"])
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["cg"]["preconditioner"] == "amg"
    assert doc["cg"]["factorization"]["kind"] == "sa-amg"
    assert doc["cg"]["factorization"]["levels"] >= 2
    assert doc["cg"]["iterations"] < 30
    assert doc["cg"]["solution_rms_error_vs_ones"] < 1e-5


# ------------------------------------------------------ block layout


def test_block_setup_pads_and_coarsens():
    from spmv_tpu.ops import block_aggregation_setup

    mm = poisson2d(13, 11)   # 143 rows, not a multiple of 4
    m = CsrMatrix.from_matrix_market(mm)
    hier = block_aggregation_setup(m, block=4, coarse_size=20)
    lv = hier.levels[0]
    assert lv.n == 143 and lv.n_pad == 144 and lv.n_coarse == 36
    # padded rows are identity at the mean |diag|
    rp, cols, vals = lv.a
    assert rp[-1] - rp[143] == 1 and cols[-1] == 143
    # every level's padded size is block * next size
    for lv in hier.levels:
        assert lv.n_pad == lv.n_coarse * lv.block


def test_block_galerkin_matches_explicit_composition():
    # the device applies P as (I - w D^-1 A) P0 by composition; the
    # host Galerkin uses the explicit P — check they are the same
    # operator by comparing P@xc both ways on the finest level
    from spmv_tpu.ops.amg import (
        _host_spmv_fast,
        block_aggregation_setup,
    )

    mm = poisson2d(8, 8)
    m = CsrMatrix.from_matrix_market(mm)
    hier = block_aggregation_setup(m, block=4, coarse_size=4)
    lv = hier.levels[0]
    rng = np.random.default_rng(0)
    xc = rng.standard_normal(lv.n_coarse)
    w = 1.0 / np.sqrt(lv.block)
    y0 = np.repeat(xc, lv.block) * w
    rp, cols, vals = lv.a
    composed = y0 - lv.omega * lv.dinv * _host_spmv_fast(
        rp, cols, vals, y0)
    # explicit P from a fresh setup of the same level (recompute)
    from spmv_tpu.ops.amg import _coo_dedupe, _csr_from_coo, _spgemm

    n_pad = lv.n_pad
    p0_rp = np.arange(n_pad + 1, dtype=np.int64)
    p0_cols = (np.arange(n_pad) // lv.block).astype(np.int32)
    p0_vals = np.full(n_pad, w)
    ap = _spgemm(n_pad, rp, cols, vals, p0_rp, p0_cols, p0_vals,
                 lv.n_coarse)
    ap_rows = np.repeat(np.arange(n_pad), np.diff(ap[0]))
    rows_cat = np.concatenate([np.arange(n_pad), ap_rows])
    cols_cat = np.concatenate([p0_cols.astype(np.int64),
                               ap[1].astype(np.int64)])
    vals_cat = np.concatenate([p0_vals,
                               -lv.omega * lv.dinv[ap_rows] * ap[2]])
    pr, pc, pv = _coo_dedupe(n_pad, lv.n_coarse, rows_cat, cols_cat,
                             vals_cat)
    prp, pcols, pvals = _csr_from_coo(n_pad, pr, pc, pv)
    explicit = _host_spmv_fast(prp, pcols, pvals, xc)
    np.testing.assert_allclose(composed, explicit, atol=1e-13)


def test_block_amg_solve_matches_truth():
    from spmv_tpu.ops import amg_solve

    mm = poisson2d(65, 63)   # odd sizes force padding at every level
    m = CsrMatrix.from_matrix_market(mm)
    rng = np.random.default_rng(1)
    x_true = rng.standard_normal(m.num_rows)
    b = m.spmv(x_true)
    res, info = amg_solve(m, b, tol=1e-10, max_iterations=500,
                          coarse_size=100)
    assert info["kind"] == "sa-amg-block"
    assert all(f == "DeviceDia" for f in info["level_formats"])
    assert int(res.iterations) < 40
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-6,
                               atol=1e-8)


def test_block_closure_matches_solver_path():
    from spmv_tpu.ops import (
        block_amg_preconditioner,
        preconditioned_conjugate_gradient,
    )

    mm = poisson2d(24, 24)
    m = CsrMatrix.from_matrix_market(mm)
    A = DeviceCsr.from_host(m)
    rng = np.random.default_rng(2)
    x_true = rng.standard_normal(m.num_rows)
    b = jnp.asarray(m.spmv(x_true))
    apply_m, info = block_amg_preconditioner(m, coarse_size=64)
    res = preconditioned_conjugate_gradient(
        lambda v: spmv(A, v), b, apply_m, tol=1e-10,
        max_iterations=500)
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-6,
                               atol=1e-8)


def test_block_amg_dia_input_and_refinement():
    from spmv_tpu.models import DiaMatrix
    from spmv_tpu.ops import amg_solve, block_aggregation_setup

    mm = poisson2d(32, 32)
    dia = DiaMatrix.from_matrix_market(mm)
    rng = np.random.default_rng(3)
    x_true = rng.standard_normal(dia.num_rows)
    b = dia.spmv(x_true)
    hier = block_aggregation_setup(dia, coarse_size=64)

    def inner(r):
        res, _ = amg_solve(dia, r, tol=1e-5, max_iterations=100,
                           dtype=jnp.float32, hierarchy=hier)
        return res
    res = iterative_refinement(dia, b, inner, tol=1e-12)
    assert res.residual_norm <= 1e-12 * np.linalg.norm(b)
    np.testing.assert_allclose(res.x, x_true, rtol=1e-9, atol=1e-11)
