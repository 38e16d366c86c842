"""BSR format + MXU SpMM kernel tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from spmv_tpu.errors import MatrixError
from spmv_tpu.io.generate import poisson2d, random_sparse
from spmv_tpu.io.matrix_market import MatrixMarket
from spmv_tpu.models import BsrMatrix
from spmv_tpu.models.device import DeviceBsr, device_put_matrix
from spmv_tpu.ops import spmm, spmv
from spmv_tpu.ops.pallas_kernels import bsr_spmm


def _block_structured(nbr, ncb, blocks_per_row, seed=0):
    """Random block pattern with dense-ish 128x128 blocks."""
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for bi in range(nbr):
        bjs = rng.choice(ncb, size=min(blocks_per_row, ncb),
                         replace=False)
        for bj in bjs:
            # ~50% dense block
            r = rng.integers(0, 128, 8192)
            c = rng.integers(0, 128, 8192)
            rows.extend((bi * 128 + r).tolist())
            cols.extend((bj * 128 + c).tolist())
    rows = np.asarray(rows); cols = np.asarray(cols)
    key = np.unique(rows * (ncb * 128) + cols)
    rows, cols = key // (ncb * 128), key % (ncb * 128)
    vals = rng.standard_normal(rows.size)
    return MatrixMarket(
        "matrix", "coordinate", "real", "general",
        nbr * 128, ncb * 128, rows.size,
        rows + 1, cols + 1, vals,
    )


def _dense_of(mm):
    A = np.zeros((mm.num_rows, mm.num_columns))
    np.add.at(A, (mm.rows_1based - 1, mm.cols_1based - 1), mm.values)
    return A


def test_host_bsr_matches_dense():
    mm = _block_structured(3, 4, 2, seed=1)
    b = BsrMatrix.from_matrix_market(mm)
    dense = _dense_of(mm)
    X = np.random.default_rng(2).standard_normal((mm.num_columns, 5))
    np.testing.assert_allclose(b.spmm(X), dense @ X, atol=1e-10)
    np.testing.assert_allclose(b.spmv(X[:, 0]), dense @ X[:, 0],
                               atol=1e-10)
    assert b.fill_ratio < 3.5


def test_non_block_multiple_shapes():
    mm = random_sparse(300, 200, 4, seed=3)   # not multiples of 128
    b = BsrMatrix.from_matrix_market(mm)
    dense = _dense_of(mm)
    X = np.random.default_rng(4).standard_normal((200, 3))
    np.testing.assert_allclose(b.spmm(X), dense @ X, atol=1e-10)


def test_empty_block_rows_get_inert_blocks():
    # rows 128..255 entirely empty
    mm = MatrixMarket(
        "matrix", "coordinate", "real", "general", 384, 384, 2,
        np.array([1, 384]), np.array([1, 384]), np.array([2.0, 3.0]),
    )
    b = BsrMatrix.from_matrix_market(mm)
    assert b.num_block_rows == 3
    # every block row has at least one block
    assert (np.diff(b.block_rowptr) >= 1).all()
    x = np.ones(384)
    y = b.spmv(x)
    assert y[0] == 2.0 and y[383] == 3.0 and y[128] == 0.0


def test_max_fill_guard():
    mm = random_sparse(1024, 1024, 2, seed=5)  # scattered -> huge fill
    with pytest.raises(MatrixError):
        BsrMatrix.from_matrix_market(mm, max_fill=8.0)


def test_device_xla_matches_host():
    mm = _block_structured(2, 3, 2, seed=6)
    b = BsrMatrix.from_matrix_market(mm)
    A = device_put_matrix(b)
    assert isinstance(A, DeviceBsr)
    X = np.random.default_rng(7).standard_normal((mm.num_columns, 4))
    Y = np.asarray(spmm(A, jnp.asarray(X)))
    np.testing.assert_allclose(Y, b.spmm(X), rtol=1e-12)
    x = X[:, 0]
    np.testing.assert_allclose(
        np.asarray(spmv(A, jnp.asarray(x))), b.spmv(x), rtol=1e-12
    )


def test_pallas_interpret_matches_xla():
    mm = _block_structured(2, 3, 2, seed=8)
    b = BsrMatrix.from_matrix_market(mm)
    A = DeviceBsr.from_host(b, dtype=jnp.float32)
    X = np.random.default_rng(9).standard_normal(
        (mm.num_columns, 4)
    ).astype(np.float32)
    Y = np.asarray(bsr_spmm(A, jnp.asarray(X), interpret=True))
    np.testing.assert_allclose(Y, b.spmm(X.astype(np.float64)),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kb", [1, 3, 5])
def test_pallas_odd_blocks_per_step(kb):
    # The kernels pairwise tree-sum their kb dots (probe 57); odd kb
    # leaves a lone carry at some tree levels — cover that edge.
    mm = _block_structured(3, 4, 3, seed=11)
    b = BsrMatrix.from_matrix_market(mm)
    A = DeviceBsr.from_host(b, dtype=jnp.float32, blocks_per_step=kb)
    X = np.random.default_rng(12).standard_normal(
        (mm.num_columns, 4)
    ).astype(np.float32)
    Y = np.asarray(bsr_spmm(A, jnp.asarray(X), interpret=True))
    np.testing.assert_allclose(Y, b.spmm(X.astype(np.float64)),
                               rtol=1e-4, atol=1e-4)


def test_pallas_bf16_blocks_accumulate_f32():
    # bf16 halves the block stream and runs the MXU at its bf16 rate
    # (probe 54); partial sums must still be f32 — the kernel promotes
    # the accumulator and returns f32 Y.
    mm = _block_structured(2, 3, 2, seed=8)
    b = BsrMatrix.from_matrix_market(mm)
    A = DeviceBsr.from_host(b, dtype=jnp.bfloat16)
    X = np.random.default_rng(9).standard_normal(
        (mm.num_columns, 4)
    ).astype(np.float32)
    Y = bsr_spmm(A, jnp.asarray(X), interpret=True)
    assert Y.dtype == jnp.float32
    want = b.spmm(X.astype(np.float64))
    # inputs round to bf16 (~0.4% each), accumulation is exact f32
    scale = np.abs(want).max()
    np.testing.assert_allclose(np.asarray(Y) / scale, want / scale,
                               atol=3e-2)


def test_pallas_interpret_fp64_and_poisson():
    mm = poisson2d(16, 16)   # 256 rows: 2 block rows
    b = BsrMatrix.from_matrix_market(mm)
    A = DeviceBsr.from_host(b)
    X = np.random.default_rng(10).standard_normal((256, 2))
    Y = np.asarray(bsr_spmm(A, jnp.asarray(X), interpret=True))
    np.testing.assert_allclose(Y, b.spmm(X), rtol=1e-12)


def test_spmv_padded_returns_padded_block_rows():
    # spmv_padded's contract: padded length for sharded callers, tail
    # rows exact zeros (ADVICE r1).
    from spmv_tpu.ops.spmv import spmv_padded

    mm = random_sparse(200, 150, 5, seed=21)
    b = BsrMatrix.from_matrix_market(mm)
    A = DeviceBsr.from_host(b, dtype=jnp.float32)
    x = np.random.default_rng(22).standard_normal(150)
    y = np.asarray(spmv_padded(A, jnp.asarray(x, dtype=jnp.float32)))
    assert y.shape[0] == A.num_block_rows * 128
    np.testing.assert_allclose(y[A.num_rows:], 0.0)
    np.testing.assert_allclose(
        y[: A.num_rows], np.asarray(spmv(A, jnp.asarray(x))), rtol=1e-6
    )


@pytest.mark.parametrize("bh", [8, 32, 128])
def test_variable_block_rows_parity(bh):
    """Narrow block heights: host/XLA/Pallas agree and fill improves
    on fine-grained block structure."""
    from spmv_tpu.io.generate import random_sparse
    from spmv_tpu.models.bsr import BsrMatrix
    from spmv_tpu.models.device import DeviceBsr
    from spmv_tpu.ops import spmm

    # a matrix of dense 8x128 blocklets scattered randomly
    rng = np.random.default_rng(bh)
    n = 1024
    base = random_sparse(n // 8, n // 128, 2, seed=bh)
    rows = np.repeat((base.rows_1based - 1) * 8, 8 * 128) \
        + np.tile(np.repeat(np.arange(8), 128), base.num_entries)
    cols = np.repeat((base.cols_1based - 1) * 128, 8 * 128) \
        + np.tile(np.arange(128), 8 * base.num_entries)
    vals = rng.standard_normal(rows.size)

    m = BsrMatrix._build(n, n, rows, cols, vals, None, bh)
    assert m.block_rows == bh
    dense = np.zeros((n, n))
    np.add.at(dense, (rows, cols), vals)
    X = rng.standard_normal((n, 3))
    np.testing.assert_allclose(m.spmm(X), dense @ X, atol=1e-9)

    A = DeviceBsr.from_host(m, dtype=jnp.float32)
    got_x = np.asarray(spmm(A, jnp.asarray(X.astype(np.float32))))
    got_p = np.asarray(bsr_spmm(A, jnp.asarray(X.astype(np.float32)),
                                interpret=True))
    want = dense @ X
    scale = max(1.0, np.abs(want).max())
    np.testing.assert_allclose(got_x / scale, want / scale, atol=1e-4)
    np.testing.assert_allclose(got_p / scale, want / scale, atol=1e-4)


def test_block_rows_auto_picks_fine_height():
    from spmv_tpu.io.generate import random_sparse
    from spmv_tpu.models.bsr import BsrMatrix

    # 8-row blocklets: bh=8 has ~16x less fill than bh=128
    base = random_sparse(32, 4, 2, seed=3)
    rows = np.repeat((base.rows_1based - 1) * 8, 8 * 128) \
        + np.tile(np.repeat(np.arange(8), 128), base.num_entries)
    cols = np.repeat((base.cols_1based - 1) * 128, 8 * 128) \
        + np.tile(np.arange(128), 8 * base.num_entries)
    vals = np.ones(rows.size)
    m = BsrMatrix._build(256, 512, rows, cols, vals, None, "auto")
    assert m.block_rows == 8
    m128 = BsrMatrix._build(256, 512, rows, cols, vals, None, 128)
    assert m.fill_ratio < m128.fill_ratio

    with pytest.raises(Exception):
        BsrMatrix._build(256, 512, rows, cols, vals, None, 7)
