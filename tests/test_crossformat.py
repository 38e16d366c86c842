"""Randomized cross-format consistency sweep.

Every storage format must compute the same y = A @ x for the same
random matrix, on the host AND through its device (XLA) path — the
framework-wide safety net on top of the per-format unit tests.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spmv_tpu.io.generate import poisson2d, powerlaw, random_sparse
from spmv_tpu.models import (
    BsrMatrix,
    CooMatrix,
    CsrMatrix,
    DiaMatrix,
    EllMatrix,
    HybridMatrix,
    WellMatrix,
)
from spmv_tpu.models.device import device_put_matrix
from spmv_tpu.ops import fast_spmv, spmv

FORMATS = [
    CooMatrix.from_matrix_market,
    CsrMatrix.from_matrix_market,
    EllMatrix.from_matrix_market,
    HybridMatrix.from_matrix_market,
    DiaMatrix.from_matrix_market,
    WellMatrix.from_matrix_market,
    BsrMatrix.from_matrix_market,
]

CASES = [
    ("poisson", lambda: poisson2d(17, 23)),
    ("random-square", lambda: random_sparse(257, 257, 5, seed=7)),
    ("random-rect", lambda: random_sparse(300, 190, 4, seed=8)),
    ("powerlaw", lambda: powerlaw(220, 2200, seed=9)),
    ("single-row", lambda: random_sparse(1, 50, 20, seed=10)),
    ("single-col", lambda: random_sparse(60, 1, 1, seed=11)),
]


@pytest.mark.parametrize("name,gen", CASES, ids=[c[0] for c in CASES])
def test_all_formats_agree(name, gen):
    mm = gen()
    x = np.random.default_rng(1).standard_normal(mm.num_columns)
    xj = jnp.asarray(x)

    ys = {}
    for fmt in FORMATS:
        host = fmt(mm)
        y_host = host.spmv(x)
        A = device_put_matrix(host)
        y_dev = np.asarray(spmv(A, xj))
        np.testing.assert_allclose(
            y_dev, y_host, rtol=1e-10, atol=1e-10,
            err_msg=f"{host.format_name} device vs host on {name}",
        )
        ys[host.format_name] = y_host

    ref = ys["csr"]
    for fname, y in ys.items():
        np.testing.assert_allclose(
            y, ref, rtol=1e-10, atol=1e-10,
            err_msg=f"{fname} vs csr on {name}",
        )


@pytest.mark.slow
def test_fast_spmv_agrees_with_spec_paths():
    mm = poisson2d(19, 21)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal(mm.num_columns)
    )
    for fmt in (DiaMatrix, WellMatrix, CsrMatrix):
        A = device_put_matrix(fmt.from_matrix_market(mm))
        np.testing.assert_allclose(
            np.asarray(fast_spmv(A, x)), np.asarray(spmv(A, x)),
            rtol=1e-10,
        )
