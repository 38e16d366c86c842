"""Native WELL-CW packer (csrc/cwpack.cpp) lockstep tests.

The native core must be BIT-IDENTICAL to the numpy packers
(models.wellcw._pack_level / _pack_pool) — same placement, same chunk
enumeration, same spill order — across level mode (band-adaptive
rank-alternating anchors, min_pop pruning) and pool mode (position
ladder, empty-streak break, per-cell rowmap), including the tail-pool
widths used by DEFAULT_TAIL_SPECS.
"""

import numpy as np
import pytest

from spmv_tpu.io.generate import banded_random, poisson2d, random_sparse
from spmv_tpu.models import WellCwMatrix
from spmv_tpu.models import _cw_native
from spmv_tpu.models import wellcw as W

pytestmark = pytest.mark.skipif(
    not _cw_native.available(),
    reason="no compiler for the native packer",
)


CASES = [
    ("banded", banded_random(5000, 400, 9, seed=1)),
    ("scattered", random_sparse(4000, 4000, 7, seed=2)),
    ("stencil", poisson2d(50, 50)),
    ("rect_wide", random_sparse(900, 3000, 6, seed=3)),
    ("rect_tall", random_sparse(3000, 900, 5, seed=4)),
    ("multiplicity", random_sparse(300, 64, 40, seed=5)),
]


def _entries(mm):
    return W.sorted_entries_0based(mm)[:3]


@pytest.mark.parametrize("name,mm", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("d,cap,mp", [(4, 2, 0.0), (4, 6, 0.05),
                                      (8, 3, 0.0), (2, 1, 0.0)])
def test_level_lockstep(name, mm, d, cap, mp):
    rows, cols, vals = _entries(mm)
    want, want_sp = W._pack_level(
        mm.num_rows, mm.num_columns, rows, cols, vals, d, cap, mp)
    got, got_sp = _cw_native.pack_level(
        mm.num_rows, mm.num_columns, rows, cols, vals, d, cap, mp)
    np.testing.assert_array_equal(got.value, want.value)
    np.testing.assert_array_equal(got.local_index, want.local_index)
    np.testing.assert_array_equal(got.anchor4, want.anchor4)
    np.testing.assert_array_equal(got.group_of_chunk,
                                  want.group_of_chunk)
    np.testing.assert_array_equal(got.rank_of_chunk,
                                  want.rank_of_chunk)
    np.testing.assert_array_equal(got_sp, want_sp)


@pytest.mark.parametrize("name,mm", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("pg,cap", [(64, 16), (128, 16), (64, 256),
                                    (256, 8)])
def test_pool_lockstep(name, mm, pg, cap):
    rows, cols, vals = _entries(mm)
    # pool the level-1 spill, the way _build does
    d0, cap0, mp0 = W.DEFAULT_LEVELS[0]
    _lvl, spilled = W._pack_level(
        mm.num_rows, mm.num_columns, rows, cols, vals, d0, cap0, mp0)
    r, c, v = rows[spilled], cols[spilled], vals[spilled]
    want, want_sp = W._pack_pool(
        mm.num_rows, mm.num_columns, r, c, v, 4, cap, pool_groups=pg)
    got, got_sp = _cw_native.pack_pool(
        mm.num_rows, mm.num_columns, r, c, v, 4, cap, pg)
    if want is None:
        assert got is None
        np.testing.assert_array_equal(got_sp, want_sp)
        return
    np.testing.assert_array_equal(got.value, want.value)
    np.testing.assert_array_equal(got.local_index, want.local_index)
    np.testing.assert_array_equal(got.anchor4, want.anchor4)
    np.testing.assert_array_equal(got.rowmap, want.rowmap)
    np.testing.assert_array_equal(got.pool_of_chunk,
                                  want.pool_of_chunk)
    assert got.pool_groups == want.pool_groups == pg
    np.testing.assert_array_equal(got_sp, want_sp)


@pytest.mark.parametrize("name,mm", CASES[:3], ids=[c[0] for c in
                                                    CASES[:3]])
def test_full_build_lockstep(name, mm):
    rows, cols, vals = _entries(mm)
    a = WellCwMatrix._build(mm.num_rows, mm.num_columns, rows, cols,
                            vals, W.DEFAULT_LEVELS, use_native=True)
    b = WellCwMatrix._build(mm.num_rows, mm.num_columns, rows, cols,
                            vals, W.DEFAULT_LEVELS, use_native=False)
    assert len(a.levels) == len(b.levels)
    for la, lb in zip(a.levels, b.levels):
        np.testing.assert_array_equal(la.value, lb.value)
        np.testing.assert_array_equal(la.local_index, lb.local_index)
    assert (a.pool is None) == (b.pool is None)
    if a.pool is not None:
        np.testing.assert_array_equal(a.pool.value, b.pool.value)
        np.testing.assert_array_equal(a.pool.rowmap, b.pool.rowmap)
    assert len(a.tail_pools) == len(b.tail_pools)
    for ta, tb in zip(a.tail_pools, b.tail_pools):
        np.testing.assert_array_equal(ta.value, tb.value)
    assert (a.remainder is None) == (b.remainder is None)
    if a.remainder is not None:
        np.testing.assert_array_equal(a.remainder.value,
                                      b.remainder.value)
    # and both evaluate identically
    x = np.random.default_rng(0).standard_normal(mm.num_columns)
    np.testing.assert_array_equal(a.spmv(x), b.spmv(x))


def test_sort_perm_matches_lexsort():
    rng = np.random.default_rng(9)
    for n, rmax, cmax in ((1, 1, 1), (1000, 50, 37),
                          (200_000, 5000, 7000)):
        rows = rng.integers(1, rmax + 1, n)
        cols = rng.integers(1, cmax + 1, n)
        np.testing.assert_array_equal(
            _cw_native.sort_perm(rows, cols),
            np.lexsort((cols, rows)))
