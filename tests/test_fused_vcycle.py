"""Fused (single-Pallas-kernel) multigrid V-cycle vs the unfused
block V-cycle it replaces (ops/fused_vcycle.py; interpret mode).

The contract under test: on a fused-aligned hierarchy, one
fused_vcycle application computes the SAME operator M^-1 r as
block_vcycle over the same BlockAmgHierarchy — smoothers, smoothed
prolongator composition, reshape transfers, and the dense coarse
solve all folded into the lane-chunked layout.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from spmv_tpu.errors import MatrixError
from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models.csr import CsrMatrix
from spmv_tpu.ops.amg import (
    block_aggregation_setup,
    block_amg_device,
    block_vcycle,
)
from spmv_tpu.ops.fused_vcycle import (
    fold_vector,
    fused_block_setup,
    fused_vcycle,
    fused_vcycle_device,
    fused_vcycle_folded,
    fused_vcycle_preconditioner,
    unfold_vector,
)


def _block_apply(hier, r_nat, n_orig, degree=3):
    """Reference: the unfused block V-cycle on the padded system."""
    dev = block_amg_device(hier, dtype=jnp.float32,
                           smoother_degree=degree)
    n_pad = hier.levels[0].n_pad
    rp = jnp.pad(jnp.asarray(r_nat, jnp.float32),
                 (0, n_pad - n_orig))
    return np.asarray(block_vcycle(dev, rp))[:n_orig]


@pytest.mark.parametrize("shape,smooth_levels", [
    ((16, 128), 1),   # 2048 rows, exactly aligned, 1 smoothed level
    ((16, 128), 0),   # plain-P0 hierarchy (no composition matvecs)
    # 16384 rows, 3 levels deep — the deep case compiles ~12 s, so it
    # rides with the slow suite (coverage moved, not deleted)
    pytest.param((32, 512), 1, marks=pytest.mark.slow),
])
def test_fused_matches_block_vcycle(shape, smooth_levels):
    mm = poisson2d(*shape)
    hier = fused_block_setup(CsrMatrix.from_matrix_market(mm),
                             smooth_levels=smooth_levels)
    n = mm.num_rows
    assert hier.levels[0].n_pad % (128 * 4) == 0
    fv = fused_vcycle_device(hier, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    r = rng.standard_normal(n).astype(np.float32)

    want = _block_apply(hier, r, n)
    got = np.asarray(fused_vcycle(fv, jnp.asarray(r), interpret=True))
    assert got.shape == (n,)
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 5e-6, err


def test_fused_handles_identity_padding():
    # 16*120 = 1920 rows -> padded to 2048 with identity rows
    mm = poisson2d(16, 120)
    hier = fused_block_setup(CsrMatrix.from_matrix_market(mm))
    assert hier.levels[0].n_pad == 2048
    fv = fused_vcycle_device(hier, dtype=jnp.float32)
    assert fv.num_rows == 1920
    rng = np.random.default_rng(5)
    r = rng.standard_normal(1920).astype(np.float32)
    want = _block_apply(hier, r, 1920)
    got = np.asarray(fused_vcycle(fv, jnp.asarray(r), interpret=True))
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 5e-6, err


def test_fold_unfold_roundtrip():
    mm = poisson2d(16, 128)
    hier = fused_block_setup(CsrMatrix.from_matrix_market(mm))
    fv = fused_vcycle_device(hier)
    v = np.arange(fv.num_rows, dtype=np.float32)
    folded = fold_vector(fv, jnp.asarray(v))
    assert folded.shape == (fv.chunk_rows[0], 128)
    # lane c holds the contiguous chunk c
    chunk = fv.chunk_rows[0]
    np.testing.assert_array_equal(np.asarray(folded)[:, 0],
                                  v[:chunk])
    back = np.asarray(unfold_vector(fv, folded))
    np.testing.assert_array_equal(back, v)


def test_fused_pcg_converges():
    from spmv_tpu.models.device import DeviceCsr
    from spmv_tpu.ops.solvers import preconditioned_conjugate_gradient
    from spmv_tpu.ops.spmv import spmv

    mm = poisson2d(16, 128)
    host = CsrMatrix.from_matrix_market(mm)
    n = mm.num_rows
    hier = fused_block_setup(host)
    fv = fused_vcycle_device(hier, dtype=jnp.float32)
    A = DeviceCsr.from_host(host, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)

    res = preconditioned_conjugate_gradient(
        lambda v: spmv(A, v), b,
        lambda r: fused_vcycle(fv, r, interpret=True),
        tol=1e-5, max_iterations=60)
    x = np.asarray(res.x, np.float64)
    rp, cols, vals = (np.asarray(host.row_ptr),
                      np.asarray(host.column_index),
                      np.asarray(host.value))
    y = np.zeros(n)
    for i in range(n):
        s, e = rp[i], rp[i + 1]
        y[i] = vals[s:e] @ x[cols[s:e]]
    rel = np.linalg.norm(np.asarray(b) - y) / np.linalg.norm(b)
    assert rel < 1e-4, rel
    assert int(res.iterations) < 40      # plain CG needs ~hundreds


def test_unaligned_hierarchy_rejected():
    mm = poisson2d(65, 63)   # 4095 rows: blocks pad internally
    hier = block_aggregation_setup(CsrMatrix.from_matrix_market(mm))
    with pytest.raises(MatrixError, match="fused-aligned"):
        fused_vcycle_device(hier)


def test_offset_span_guard():
    # 64x16 grid: vertical offset 64 > chunk 1024/128 = 8
    mm = poisson2d(64, 16)
    hier = fused_block_setup(CsrMatrix.from_matrix_market(mm))
    with pytest.raises(MatrixError, match="lane chunk"):
        fused_vcycle_device(hier)


def test_preconditioner_info():
    mm = poisson2d(16, 128)
    apply, info = fused_vcycle_preconditioner(
        CsrMatrix.from_matrix_market(mm), interpret=True)
    assert info["kind"] == "sa-amg-fused"
    assert info["levels"] >= 2
    assert info["level_rows"][0] == 2048
    out = apply(jnp.ones(mm.num_rows, jnp.float32))
    assert out.shape == (mm.num_rows,)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_folded_entry_shape_guard():
    mm = poisson2d(16, 128)
    hier = fused_block_setup(CsrMatrix.from_matrix_market(mm))
    fv = fused_vcycle_device(hier)
    with pytest.raises(MatrixError, match="expected"):
        fused_vcycle_folded(fv, jnp.zeros((4, 128), jnp.float32),
                            interpret=True)
