"""WELL-CW (chunk-window WELL) format + Pallas stride-table kernel.

Correctness chain: host WellCwMatrix.spmv vs dense fp64 ground truth
-> device XLA path vs host -> Pallas kernel (interpret mode) vs XLA.
Multi-level overflow, remainder handling, rectangular shapes, the
refstring shape contract, and the auto_format no-cliff guarantee are
exercised explicitly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spmv_tpu.errors import MatrixError
from spmv_tpu.io.generate import banded_random, poisson2d, random_sparse
from spmv_tpu.models import WellCwMatrix, auto_format
from spmv_tpu.models.device import DeviceWellCw, device_put_matrix
from spmv_tpu.ops import spmv, spmm
from spmv_tpu.ops.pallas_kernels import (
    wellcw_spmm,
    wellcw_spmv,
)


def _dense_of(mm):
    A = np.zeros((mm.num_rows, mm.num_columns))
    np.add.at(A, (mm.rows_1based - 1, mm.cols_1based - 1), mm.values)
    return A


CASES = [
    ("scattered", random_sparse(700, 700, 10, seed=1)),
    ("banded_random", banded_random(1500, 400, 8, seed=2)),
    ("rect_wide", random_sparse(300, 1100, 6, seed=3)),
    ("rect_tall", random_sparse(1100, 300, 5, seed=4)),
    ("stencil", poisson2d(30, 30)),
]


@pytest.mark.parametrize("name,mm", CASES, ids=[c[0] for c in CASES])
def test_host_matches_dense(name, mm):
    w = WellCwMatrix.from_matrix_market(mm)
    dense = _dense_of(mm)
    x = np.random.default_rng(0).standard_normal(mm.num_columns)
    np.testing.assert_allclose(w.spmv(x), dense @ x, atol=1e-9)
    assert w.num_entries == mm.num_entries
    # accounting: packed cells (+ pool + remainder) cover every entry
    packed = sum(
        int((lv.value != 0).sum()) for lv in w.levels
    )
    packed += sum(int((p.value != 0).sum()) for p in w._pools())
    assert packed + w.num_remainder >= np.count_nonzero(mm.values)


@pytest.mark.parametrize("name,mm", CASES, ids=[c[0] for c in CASES])
def test_device_xla_matches_host(name, mm):
    w = WellCwMatrix.from_matrix_market(mm)
    A = device_put_matrix(w, dtype=jnp.float32)
    assert isinstance(A, DeviceWellCw)
    x = np.random.default_rng(1).standard_normal(mm.num_columns)
    want = w.spmv(x)
    got = np.asarray(spmv(A, jnp.asarray(x.astype(np.float32))))
    scale = max(1.0, np.abs(want).max())
    np.testing.assert_allclose(got / scale, want / scale, atol=1e-5)


@pytest.mark.parametrize("name,mm", CASES, ids=[c[0] for c in CASES])
@pytest.mark.slow
def test_pallas_interpret_matches_host(name, mm):
    w = WellCwMatrix.from_matrix_market(mm)
    A = DeviceWellCw.from_host(w, dtype=jnp.float32)
    x = np.random.default_rng(2).standard_normal(mm.num_columns)
    want = w.spmv(x)
    got = np.asarray(
        wellcw_spmv(A, jnp.asarray(x.astype(np.float32)),
                    interpret=True)
    )
    scale = max(1.0, np.abs(want).max())
    np.testing.assert_allclose(got / scale, want / scale, atol=1e-5)


@pytest.mark.slow
def test_spmm_interpret_and_xla():
    mm = random_sparse(500, 400, 9, seed=5)
    w = WellCwMatrix.from_matrix_market(mm)
    A = DeviceWellCw.from_host(w, dtype=jnp.float32)
    X = np.random.default_rng(3).standard_normal((400, 3))
    want = _dense_of(mm) @ X
    scale = max(1.0, np.abs(want).max())
    got_p = np.asarray(
        wellcw_spmm(A, jnp.asarray(X.astype(np.float32)),
                    interpret=True)
    )
    got_x = np.asarray(spmm(A, jnp.asarray(X.astype(np.float32))))
    np.testing.assert_allclose(got_p / scale, want / scale, atol=1e-5)
    np.testing.assert_allclose(got_x / scale, want / scale, atol=1e-5)


def test_multiplicity_overflow_spreads_over_levels():
    # 40 entries per row into only 64 columns: level-1 chunks overflow
    # heavily; the pooled tail must absorb them with ~zero remainder
    mm = random_sparse(300, 64, 40, seed=6)
    w = WellCwMatrix.from_matrix_market(mm)
    assert w.pool is not None and w.pool.num_chunks > 0
    assert w.remainder_fraction < 0.01
    dense = _dense_of(mm)
    x = np.random.default_rng(4).standard_normal(64)
    np.testing.assert_allclose(w.spmv(x), dense @ x, atol=1e-9)
    # explicit multi-level spec (no pool): level 2 absorbs instead
    w2 = WellCwMatrix.from_matrix_market(
        mm, levels=((4, 6, 0.05), (8, 64, 0.0)), pool_cap=0)
    assert len(w2.levels) >= 2 and w2.levels[1].num_chunks > 0
    assert w2.pool is None
    np.testing.assert_allclose(w2.spmv(x), dense @ x, atol=1e-9)


def test_remainder_path():
    # cap=1 on a single shallow level forces a real remainder; the
    # device paths must still match
    mm = random_sparse(256, 256, 12, seed=7)
    w = WellCwMatrix.from_matrix_market(mm, levels=[(2, 1, 0.0)],
                                        pool_cap=0)
    assert w.remainder is not None and w.num_remainder > 0
    dense = _dense_of(mm)
    x = np.random.default_rng(5).standard_normal(256)
    np.testing.assert_allclose(w.spmv(x), dense @ x, atol=1e-9)
    A = DeviceWellCw.from_host(w, dtype=jnp.float32)
    got = np.asarray(
        wellcw_spmv(A, jnp.asarray(x.astype(np.float32)),
                    interpret=True)
    )
    want = dense @ x
    scale = max(1.0, np.abs(want).max())
    np.testing.assert_allclose(got / scale, want / scale, atol=1e-5)


def test_guards():
    mm = random_sparse(64, 64, 4, seed=8)
    with pytest.raises(MatrixError):
        WellCwMatrix.from_matrix_market(mm, levels=[(3, 4, 0.0)])
    with pytest.raises(MatrixError):
        WellCwMatrix.from_matrix_market(mm, levels=[])
    w = WellCwMatrix.from_matrix_market(mm)
    with pytest.raises(MatrixError):
        DeviceWellCw.from_host(w, dtype=jnp.bfloat16)
    with pytest.raises(MatrixError):
        w.spmv(np.zeros(63))


def test_auto_format_scattered_picks_wellcw_not_csr():
    # the VERDICT #4 cliff case in miniature: fully scattered columns
    # defeat DIA and per-slot WELL (order-statistic spread >> window,
    # RCM cannot band a random pattern); auto_format must land on the
    # cliff-free chunk-window format, never raw CSR
    mm = random_sparse(2000, 2000, 12, seed=9)
    m, rationale = auto_format(mm)
    assert rationale["format"] == "wellcw"
    assert isinstance(m, WellCwMatrix)
    assert m.remainder_fraction < 0.05


_TRACE_CONFIG = {
    "caches": {
        "L1-0": {"size": 32768, "line_size": 64, "parent": "L2"},
        "L1-1": {"size": 32768, "line_size": 64, "parent": "L2"},
        "L2": {"size": 2097152, "line_size": 64, "parent": None},
    },
    "num_numa_domains": 1,
    "thread_affinities": [
        {"thread": 0, "cpu": 0, "cache": "L1-0", "numa_domain": 0},
        {"thread": 1, "cpu": 1, "cache": "L1-1", "numa_domain": 0},
    ],
}


def test_refstring_shape_contract():
    from spmv_tpu.kernels import make_kernel
    from spmv_tpu.perfmodel.trace_config import parse_trace_config

    mm = random_sparse(600, 600, 8, seed=10)
    k = make_kernel("wellcw", mm=mm)
    k.init()
    cfg = parse_trace_config(_TRACE_CONFIG)
    total = 0
    for t in range(2):
        addrs, numas = k.memory_reference_string(cfg, t, 2)
        assert addrs.size == numas.size
        total += addrs.size
    w = k.matrix
    per_chunk = 1 + 3 * 8 * 128 + 128
    want = sum(lv.num_chunks for lv in w.levels) * per_chunk
    want += sum(p.num_chunks for p in w._pools()) * (1 + 5 * 8 * 128)
    if w.remainder is not None:
        r = w.remainder
        want += 3 * r.num_entries + 2 * r.num_rows + 2
    assert total == want


def test_simulation_mode_runs():
    from spmv_tpu.kernels import make_kernel
    from spmv_tpu.perfmodel.cache_trace import trace_cache_misses
    from spmv_tpu.perfmodel.trace_config import parse_trace_config

    mm = random_sparse(200, 200, 6, seed=11)
    k = make_kernel("wellcw", mm=mm)
    k.init()
    cfg = parse_trace_config(_TRACE_CONFIG)
    out = trace_cache_misses(cfg, k, warmup=False)
    assert set(out.cache_misses.keys()) == set(cfg.caches.keys())
    # compulsory misses at least cover the packed data once
    total = sum(m.sum() for m in out.cache_misses.values())
    assert total > 0


@pytest.mark.slow
def test_fast_spmv_dispatch():
    from spmv_tpu.ops.spmv import fast_spmv

    mm = random_sparse(300, 300, 7, seed=12)
    w = WellCwMatrix.from_matrix_market(mm)
    A = DeviceWellCw.from_host(w, dtype=jnp.float32)
    x = np.random.default_rng(6).standard_normal(300)
    want = _dense_of(mm) @ x
    got = np.asarray(fast_spmv(A, jnp.asarray(x.astype(np.float32))))
    scale = max(1.0, np.abs(want).max())
    np.testing.assert_allclose(got / scale, want / scale, atol=1e-5)


# ---------------------------------------------------------------------
# Merged-grid layout (DeviceCwMerged): level + stage-1 pool in one
# pallas grid (probes 46-48).  Needs >= 64 groups and low dense-slot
# waste, so these cases are bigger than the CASES table above.
# ---------------------------------------------------------------------
def _merged_case():
    return banded_random(16384, 512, 6, seed=20)


@pytest.mark.slow
def test_merged_layout_selected_and_matches():
    mm = _merged_case()
    w = WellCwMatrix.from_matrix_market(mm)
    A = device_put_matrix(w, dtype=jnp.float32)
    assert A.merged is not None, "expected the merged grid layout"
    assert A.levels == () and A.pool is None
    assert A.merged.kl == 64 * A.merged.cap + A.merged.pool_per_block
    # every packed entry appears exactly once in the merged arrays
    n_merged = int((np.asarray(A.merged.value) != 0).sum())
    n_host = sum(int((lv.value != 0).sum()) for lv in w.levels)
    n_host += 0 if w.pool is None else int((w.pool.value != 0).sum())
    assert n_merged == n_host

    x = np.random.default_rng(21).standard_normal(mm.num_columns)
    want = w.spmv(x)
    # XLA path
    got = np.asarray(spmv(A, jnp.asarray(x.astype(np.float32))))
    scale = max(1.0, np.abs(want).max())
    np.testing.assert_allclose(got / scale, want / scale, atol=1e-5)
    # Pallas merged kernel (interpret)
    got_pl = np.asarray(
        wellcw_spmv(A, jnp.asarray(x.astype(np.float32)),
                    interpret=True))
    np.testing.assert_allclose(got_pl / scale, want / scale,
                               atol=1e-5)


@pytest.mark.slow
def test_merged_spmm_matches():
    mm = _merged_case()
    w = WellCwMatrix.from_matrix_market(mm)
    A = device_put_matrix(w, dtype=jnp.float32)
    assert A.merged is not None
    X = np.random.default_rng(22).standard_normal(
        (mm.num_columns, 2))
    want = w.spmm(X)
    scale = max(1.0, np.abs(want).max())
    got = np.asarray(spmm(A, jnp.asarray(X.astype(np.float32))))
    np.testing.assert_allclose(got / scale, want / scale, atol=1e-5)
    got_pl = np.asarray(
        wellcw_spmm(A, jnp.asarray(X.astype(np.float32)),
                    interpret=True))
    np.testing.assert_allclose(got_pl / scale, want / scale,
                               atol=1e-5)


@pytest.mark.slow
def test_merged_fallback_on_forced_chunks_per_step():
    # an explicit chunks_per_step opts out of the merged layout and
    # must still agree
    mm = _merged_case()
    w = WellCwMatrix.from_matrix_market(mm)
    A = DeviceWellCw.from_host(w, dtype=jnp.float32,
                               chunks_per_step=32)
    assert A.merged is None and len(A.levels) == 1
    x = np.random.default_rng(23).standard_normal(mm.num_columns)
    want = w.spmv(x)
    scale = max(1.0, np.abs(want).max())
    got = np.asarray(
        wellcw_spmv(A, jnp.asarray(x.astype(np.float32)),
                    interpret=True))
    np.testing.assert_allclose(got / scale, want / scale, atol=1e-5)


def test_tail_cascade_accounting():
    # the stage-1 cap + tail cascade covers what the old deep ladder
    # covered: remainder stays ~zero on a scattered case
    mm = banded_random(16384, 2048, 8, seed=24)
    w = WellCwMatrix.from_matrix_market(mm)
    assert w.remainder_fraction < 0.005
    assert w.pool is not None and w.pool.cap <= 16
    for p in w.tail_pools:
        assert p.pool_groups in (64, 128, 256)
    x = np.random.default_rng(25).standard_normal(mm.num_columns)
    dense = _dense_of(mm)
    np.testing.assert_allclose(w.spmv(x), dense @ x, atol=1e-8)
