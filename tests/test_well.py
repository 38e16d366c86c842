"""WELL (windowed sliced-ELL) format + Pallas shuffle-gather kernel.

Correctness chain: host WellMatrix.spmv vs dense fp64 ground truth ->
device XLA path vs host -> Pallas kernel (interpret mode) vs XLA.
Spill behavior (out-of-window entries to the CSR remainder) is
exercised explicitly with a tiny window.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spmv_tpu.errors import MatrixError
from spmv_tpu.io.generate import banded_random, poisson2d, random_sparse
from spmv_tpu.models import CsrMatrix, WellMatrix
from spmv_tpu.models.device import DeviceWell, device_put_matrix
from spmv_tpu.ops import spmv, well_spmv


def _dense_of(mm):
    A = np.zeros((mm.num_rows, mm.num_columns))
    np.add.at(A, (mm.rows_1based - 1, mm.cols_1based - 1), mm.values)
    return A


@pytest.mark.parametrize("shape", [(13, 17), (40, 40)])
def test_host_well_matches_dense(shape):
    mm = poisson2d(*shape)
    w = WellMatrix.from_matrix_market(mm, window_rows=16)
    dense = _dense_of(mm)
    x = np.random.default_rng(0).standard_normal(mm.num_columns)
    np.testing.assert_allclose(w.spmv(x), dense @ x, atol=1e-10)
    assert w.num_entries == mm.num_entries


def test_spill_with_tiny_window():
    mm = random_sparse(90, 90, 8, seed=3)
    w = WellMatrix.from_matrix_market(mm, window_rows=1)
    # a 128-column window over a 90-column matrix never spills
    assert w.num_spilled == 0
    mm2 = random_sparse(300, 300, 6, seed=4)
    w2 = WellMatrix.from_matrix_market(mm2, window_rows=1)
    # columns span 300 > 128: some entries must spill...
    assert w2.num_spilled > 0
    assert w2.spill_fraction < 1.0
    # ...and the result still matches
    dense = _dense_of(mm2)
    x = np.random.default_rng(5).standard_normal(300)
    np.testing.assert_allclose(w2.spmv(x), dense @ x, atol=1e-10)


def test_device_xla_path_matches_host():
    mm = random_sparse(200, 150, 5, seed=6)
    w = WellMatrix.from_matrix_market(mm, window_rows=2)
    A = device_put_matrix(w)
    assert isinstance(A, DeviceWell)
    x = np.random.default_rng(7).standard_normal(150)
    y = np.asarray(spmv(A, jnp.asarray(x)))
    np.testing.assert_allclose(y, w.spmv(x), rtol=1e-12)


@pytest.mark.parametrize("window_rows", [1, 2, 16])
@pytest.mark.slow
def test_pallas_interpret_matches_xla(window_rows):
    mm = poisson2d(30, 40)
    w = WellMatrix.from_matrix_market(mm, window_rows=window_rows)
    A = DeviceWell.from_host(w, dtype=jnp.float32)
    x = np.random.default_rng(8).standard_normal(mm.num_columns)
    xj = jnp.asarray(x, jnp.float32)
    y_pallas = np.asarray(well_spmv(A, xj, interpret=True))
    assert y_pallas.shape == (mm.num_rows,)
    y_host = w.spmv(x)
    np.testing.assert_allclose(y_pallas, y_host, rtol=1e-4, atol=1e-4)


def test_pallas_interpret_fp64():
    mm = random_sparse(128, 128, 4, seed=9)
    w = WellMatrix.from_matrix_market(mm, window_rows=1)
    A = DeviceWell.from_host(w)   # fp64 under x64 tests
    x = np.random.default_rng(10).standard_normal(128)
    y = np.asarray(well_spmv(A, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y, w.spmv(x), rtol=1e-12)


def test_guards():
    mm = poisson2d(4, 4)
    with pytest.raises(MatrixError):
        WellMatrix.from_matrix_market(mm, window_rows=0)
    csr = CsrMatrix.from_matrix_market(mm, row_alignment=4)
    with pytest.raises(MatrixError):
        WellMatrix.from_csr(csr)


def test_rcm_reduces_well_spill():
    """Reordering pipeline: a scrambled banded matrix spills heavily in
    WELL; RCM restores locality and the spill collapses."""
    from spmv_tpu.models.reorder import find_new_order_rcm

    rng = np.random.default_rng(12)
    n, bw, per = 1500, 40, 5
    rows = np.repeat(np.arange(n), per)
    cols = np.clip(rows + rng.integers(-bw, bw + 1, rows.size), 0, n - 1)
    key = np.unique(rows * n + cols)
    r, c = key // n, key % n
    # scramble with a random symmetric permutation
    perm = rng.permutation(n)
    r2, c2 = perm[r], perm[c]
    from spmv_tpu.io.matrix_market import MatrixMarket
    vals = rng.standard_normal(r2.size)
    mm = MatrixMarket("matrix", "coordinate", "real", "general",
                      n, n, r2.size,
                      (r2 + 1).astype(np.int64), (c2 + 1).astype(np.int64),
                      vals)

    w_scrambled = WellMatrix.from_matrix_market(mm, window_rows=2)
    mm_rcm = mm.permute(find_new_order_rcm(mm))
    w_rcm = WellMatrix.from_matrix_market(mm_rcm, window_rows=2)
    assert w_rcm.spill_fraction < w_scrambled.spill_fraction / 2
    # and the reordered matrix still computes the permuted product
    x = rng.standard_normal(n)
    y = w_rcm.spmv(x)
    assert y.shape == (n,)


def test_sigma_sort_reduces_fill():
    """SELL-sigma ordering: skewed row lengths pad less after sorting."""
    from spmv_tpu.models.reorder import find_new_order_sigma

    rng = np.random.default_rng(13)
    n = 1024
    rows, cols = [], []
    for i in range(n):
        ln = 1 if i % 8 else 24   # one long row per 8 short ones
        c = rng.choice(64, size=min(ln, 64), replace=False)
        rows.extend([i] * c.size)
        cols.extend(c.tolist())
    from spmv_tpu.io.matrix_market import MatrixMarket
    rows = np.asarray(rows); cols = np.asarray(cols)
    mm = MatrixMarket("matrix", "coordinate", "real", "general",
                      n, 64, rows.size,
                      rows + 1, cols + 1,
                      np.ones(rows.size))
    w0 = WellMatrix.from_matrix_market(mm, window_rows=1)
    # row-only permutation (sigma-sort applies to rows; the matrix is
    # rectangular so the symmetric permute() does not apply)
    order = find_new_order_sigma(mm, sigma=n)
    mm_s = MatrixMarket(
        "matrix", "coordinate", "real", "general", n, 64, rows.size,
        order[mm.rows_1based - 1] + 1, mm.cols_1based, mm.values,
    )
    ws = WellMatrix.from_matrix_market(mm_s, window_rows=1)
    assert ws.value.size < w0.value.size  # fewer padded slots
    assert ws.num_entries == w0.num_entries


@pytest.mark.slow
def test_segmented_mode_matches_whole_x():
    """Segmented WELL (sliding x segment) vs whole-x mode and host."""
    import jax.numpy as jnp

    from spmv_tpu.ops import spmv as xla_spmv

    rng = np.random.default_rng(30)
    n, bw, per = 2000, 60, 5
    rows = np.repeat(np.arange(n), per)
    cols = np.clip(rows + rng.integers(-bw, bw + 1, rows.size), 0, n - 1)
    key = np.unique(rows * n + cols)
    r, c = key // n, key % n
    from spmv_tpu.io.matrix_market import MatrixMarket
    mm = MatrixMarket("matrix", "coordinate", "real", "general",
                      n, n, r.size, (r + 1), (c + 1),
                      rng.standard_normal(r.size))
    w = WellMatrix.from_matrix_market(mm, window_rows=2)
    x = rng.standard_normal(n)
    want = w.spmv(x)

    # small segments force several segment switches
    A = DeviceWell.from_host(w, segment_rows=4)
    assert A.segment_rows == 4
    xj = jnp.asarray(x)
    y_seg = np.asarray(well_spmv(A, xj, interpret=True))
    np.testing.assert_allclose(y_seg, want, rtol=1e-10, atol=1e-10)
    # XLA spec path with segment-relative windows agrees too
    y_xla = np.asarray(xla_spmv(A, xj))
    np.testing.assert_allclose(y_xla, want, rtol=1e-10, atol=1e-10)


def test_segmented_mode_spills_escaping_chunks():
    """A chunk whose windows straddle segments moves to the spill."""
    import jax.numpy as jnp

    # two far-apart column clusters in one row group
    rows = np.arange(128)
    from spmv_tpu.io.matrix_market import MatrixMarket
    r = np.concatenate([rows, rows])
    c = np.concatenate([rows, rows + 3000])   # near + far diagonal
    mm = MatrixMarket("matrix", "coordinate", "real", "general",
                      128, 4000, r.size, r + 1, c + 1,
                      np.ones(r.size))
    w = WellMatrix.from_matrix_market(mm, window_rows=1)
    A = DeviceWell.from_host(w, segment_rows=2)
    # the far cluster cannot share a 2-row segment with the near one
    assert A.spill is not None and A.spill.num_entries > 0
    x = np.random.default_rng(31).standard_normal(4000)
    y = np.asarray(well_spmv(A, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y, w.spmv(x), rtol=1e-10)


def test_auto_segmenting_for_large_x():
    """Device conversion flips to segment mode when x exceeds VMEM."""
    import jax.numpy as jnp

    w = WellMatrix.from_matrix_market(poisson2d(24, 24), window_rows=2)
    # pretend the column space is huge
    w.num_columns = 4_000_000
    A = DeviceWell.from_host(w, dtype=jnp.float32)
    assert A.segment_rows == 4096
    assert A.blocks_per_out == 4 and A.chunks_per_step == 32
    assert A.segment_of_step is not None


def test_segmented_spmm_xla_path():
    import jax.numpy as jnp

    from spmv_tpu.ops import spmm

    mm = poisson2d(24, 24)
    w = WellMatrix.from_matrix_market(mm, window_rows=2)
    A = DeviceWell.from_host(w, segment_rows=4)
    X = np.random.default_rng(40).standard_normal((w.num_columns, 3))
    Y = np.asarray(spmm(A, jnp.asarray(X)))
    want = np.stack([w.spmv(X[:, j]) for j in range(3)], axis=1)
    np.testing.assert_allclose(Y, want, rtol=1e-10)


@pytest.mark.parametrize("b_out", [2, 4])
@pytest.mark.slow
def test_blocks_per_out_folding(b_out):
    """Multiple 8-group blocks folded into one output tile."""
    import jax.numpy as jnp

    mm = poisson2d(40, 40)   # 1600 rows -> 13 groups
    w = WellMatrix.from_matrix_market(mm, window_rows=2)
    A = DeviceWell.from_host(w, dtype=jnp.float32,
                             blocks_per_out=b_out)
    x = np.random.default_rng(50).standard_normal(w.num_rows)
    y = np.asarray(well_spmv(A, jnp.asarray(x, jnp.float32),
                             interpret=True))
    np.testing.assert_allclose(y, w.spmv(x), rtol=1e-4, atol=1e-4)

    # and combined with segmented mode
    A2 = DeviceWell.from_host(w, dtype=jnp.float32,
                              blocks_per_out=b_out, segment_rows=8)
    y2 = np.asarray(well_spmv(A2, jnp.asarray(x, jnp.float32),
                              interpret=True))
    np.testing.assert_allclose(y2, w.spmv(x), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_pallas_spmm_interpret():
    from spmv_tpu.ops.pallas_kernels import well_spmm

    mm = poisson2d(20, 24)
    w = WellMatrix.from_matrix_market(mm, window_rows=2)
    A = DeviceWell.from_host(w, dtype=jnp.float32)
    X = np.random.default_rng(60).standard_normal(
        (w.num_columns, 3)
    ).astype(np.float32)
    Y = np.asarray(well_spmm(A, jnp.asarray(X), interpret=True))
    want = np.stack(
        [w.spmv(X[:, j].astype(np.float64)) for j in range(3)], axis=1
    )
    assert Y.shape == (w.num_rows, 3)
    np.testing.assert_allclose(Y, want, rtol=1e-4, atol=1e-4)

    # segmented devices run the sliding-segment spmm kernel
    A2 = DeviceWell.from_host(w, segment_rows=8, dtype=jnp.float32)
    Y2 = np.asarray(well_spmm(A2, jnp.asarray(X), interpret=True))
    np.testing.assert_allclose(Y2, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_pallas_spmm_segmented_folded_blocks():
    """Segmented SpMM with folded output blocks (blocks_per_out>1) and
    a spill remainder — the large-matrix configuration."""
    from spmv_tpu.ops.pallas_kernels import well_spmm

    mm = banded_random(1024, half_bandwidth=48, nnz_per_row=6, seed=7)
    w = WellMatrix.from_matrix_market(mm, window_rows=2)
    A = DeviceWell.from_host(w, dtype=jnp.float32, segment_rows=16,
                             blocks_per_out=2, chunks_per_step=8)
    assert A.segment_rows is not None
    X = np.random.default_rng(61).standard_normal(
        (w.num_columns, 4)
    ).astype(np.float32)
    Y = np.asarray(well_spmm(A, jnp.asarray(X), interpret=True))
    want = np.stack(
        [w.spmv(X[:, j].astype(np.float64)) for j in range(4)], axis=1
    )
    assert Y.shape == (w.num_rows, 4)
    np.testing.assert_allclose(Y, want, rtol=1e-4, atol=1e-4)


def test_segmented_empty_block_has_valid_segment():
    """Regression (review finding): a 1024-row run of empty rows used
    to produce a wrapped negative segment start (out-of-bounds DMA on
    hardware)."""
    import jax.numpy as jnp

    from spmv_tpu.io.matrix_market import MatrixMarket

    # rows 0..127 and 2176..2303 populated; the middle ~2048 rows
    # (two full 8-group output blocks) are empty
    r = np.concatenate([np.arange(128), np.arange(2176, 2304)])
    c = r.copy()
    mm = MatrixMarket("matrix", "coordinate", "real", "general",
                      2304, 2304, r.size, r + 1, c + 1,
                      np.ones(r.size))
    w = WellMatrix.from_matrix_market(mm, window_rows=1)
    A = DeviceWell.from_host(w, dtype=jnp.float32, segment_rows=4)
    segs = np.asarray(A.segment_of_step)
    assert (segs >= 0).all(), segs.min()
    x = np.random.default_rng(70).standard_normal(2304)
    y = np.asarray(well_spmv(A, jnp.asarray(x, jnp.float32),
                             interpret=True))
    np.testing.assert_allclose(y, w.spmv(x), rtol=1e-4, atol=1e-4)


def test_dia_spmm_fp64_interpret_after_upcast_fix():
    from spmv_tpu.ops.pallas_kernels import dia_spmm

    mm = poisson2d(10, 12)
    from spmv_tpu.models import DiaMatrix
    from spmv_tpu.models.device import DeviceDia

    dia = DiaMatrix.from_matrix_market(mm)
    A = DeviceDia.from_host(dia)  # fp64 under tests
    X = np.random.default_rng(71).standard_normal((mm.num_columns, 2))
    Y = np.asarray(dia_spmm(A, jnp.asarray(X), tile_rows=8,
                            interpret=True))
    want = np.stack([dia.spmv(X[:, j]) for j in range(2)], axis=1)
    np.testing.assert_allclose(Y, want, rtol=1e-12)


def test_group_of_chunk_nondecreasing_after_padding():
    # ADVICE r1: inert pad chunks must carry the run's LAST group so the
    # flattened group_of_chunk stays sorted for segment_sum's
    # indices_are_sorted=True fast path (whole-x packing only).
    mm = random_sparse(200, 200, 7, seed=11)
    w = WellMatrix.from_matrix_market(mm, window_rows=2)
    A = DeviceWell.from_host(w, chunks_per_step=8)
    grp = np.asarray(A.group_of_chunk).reshape(-1)
    assert (np.diff(grp) >= 0).all()
    x = np.random.default_rng(12).standard_normal(200)
    np.testing.assert_allclose(
        np.asarray(spmv(A, jnp.asarray(x))), w.spmv(x), rtol=1e-5
    )


def test_device_well_rejects_sub32bit_values():
    mm = poisson2d(10, 10)
    w = WellMatrix.from_matrix_market(mm, window_rows=8)
    with pytest.raises(MatrixError, match="32-bit"):
        DeviceWell.from_host(w, dtype=jnp.bfloat16)
