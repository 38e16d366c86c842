"""Probe 51: level-scheduled IC(0) triangular solves on the chip.

Does the level-scan design actually pay on TPU, and how much does
multicolor reordering buy?  Times one M^-1 application (forward +
backward solve) for the natural and colored orders, levels vs sweeps,
against the SpMV cost they precondition, plus end-to-end PCG
iterations.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1200 python
     experiments/tpu_probe51_ic0_levels.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import CsrMatrix
from spmv_tpu.models.device import DeviceDia
from spmv_tpu.models.dia import DiaMatrix
from spmv_tpu.models.reorder import find_new_order_coloring
from spmv_tpu.ops import (
    conjugate_gradient,
    extract_diagonal,
    ic0_factor,
    ic0_preconditioner,
    jacobi_preconditioner,
    preconditioned_conjugate_gradient,
    spmv,
)
from spmv_tpu.ops.pallas_kernels import dia_spmv
from spmv_tpu.profile.harness import time_kernel

print("device:", jax.devices()[0])
NX = 512
mm = poisson2d(NX, NX)
n = mm.num_rows
out = {"nx": NX, "rows": n}

t0 = time.perf_counter()
order = find_new_order_coloring(mm)
out["coloring_seconds"] = time.perf_counter() - t0
mmc = mm.permute(order)

results = {}
for label, m in (("natural", CsrMatrix.from_matrix_market(mm)),
                 ("colored", CsrMatrix.from_matrix_market(mmc))):
    t0 = time.perf_counter()
    L = ic0_factor(m)
    tf = time.perf_counter() - t0
    for method, sweeps in (("levels", 0), ("sweeps", 6)):
        pre, info = ic0_preconditioner(L, method=method,
                                       sweeps=sweeps or 6,
                                       dtype=jnp.float32)
        r = jnp.ones((n,), jnp.float32)

        def step(v):
            z = pre(v)
            return z / jnp.maximum(jnp.abs(z).max(), 1e-30)

        t = time_kernel(step, (r,), runs=3)
        key = f"{label}_{method}"
        results[key] = {
            "factor_seconds": tf,
            "apply_seconds": t.seconds_per_iteration,
            "levels_fwd": info["levels_forward"],
            "levels_bwd": info["levels_backward"],
            "level_width": info["level_width"],
            "padding_factor": info["padding_factor"],
        }
        print(key, json.dumps(results[key]), flush=True)

# the SpMV being preconditioned (DIA fast path on the stencil)
dia = DiaMatrix.from_matrix_market(mm)
Ad = DeviceDia.from_host(dia, dtype=jnp.float32)
x0 = jnp.ones((n,), jnp.float32)
t_mv = time_kernel(lambda v: dia_spmv(Ad, v[: n])[: n], (x0,), runs=3)
out["spmv_seconds"] = t_mv.seconds_per_iteration
print("spmv", t_mv.seconds_per_iteration, flush=True)

# end-to-end iteration counts (CPU-verified semantics; run on chip)
from spmv_tpu.models.device import DeviceCsr

mcol = CsrMatrix.from_matrix_market(mmc)
Ac = DeviceCsr.from_host(mcol, dtype=jnp.float32)
rng = np.random.default_rng(0)
b = jnp.asarray(rng.standard_normal(n), jnp.float32)
Lc = ic0_factor(mcol)
pre_c, _ = ic0_preconditioner(Lc, dtype=jnp.float32)
jac = jacobi_preconditioner(jnp.asarray(extract_diagonal(mcol),
                                        jnp.float32))

iters = {}
for lbl, fn in (
    ("plain", lambda: conjugate_gradient(
        lambda v: spmv(Ac, v), b, tol=1e-5, max_iterations=4000)),
    ("jacobi", lambda: preconditioned_conjugate_gradient(
        lambda v: spmv(Ac, v), b, jac, tol=1e-5,
        max_iterations=4000)),
    ("ic0_colored", lambda: preconditioned_conjugate_gradient(
        lambda v: spmv(Ac, v), b, pre_c, tol=1e-5,
        max_iterations=4000)),
):
    res = jax.jit(fn)()
    iters[lbl] = int(res.iterations)
    print(lbl, "iters", iters[lbl], flush=True)
out["pcg_iterations"] = iters
out["apply"] = results

with open("experiments/probe51_ic0_levels.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote experiments/probe51_ic0_levels.json")
