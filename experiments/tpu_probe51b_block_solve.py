"""Probe 51b: block-level triangular solve vs the scatter-based scan.

Probe 51 measured the level-scan IC(0) apply at 22.7 ms (colored) on
262k rows against a 4.4 us DIA SpMV — XLA scatter/gather cost.  The
BlockTriSolve path replaces scatter with static slice updates and the
dep gather with rectangular DIA matvecs; this measures the same
matrix through it.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import CsrMatrix
from spmv_tpu.models.reorder import find_new_order_coloring
from spmv_tpu.ops import ic0_factor, ic0_preconditioner
from spmv_tpu.profile.harness import time_kernel

print("device:", jax.devices()[0])
NX = 512
mm = poisson2d(NX, NX)
n = mm.num_rows
mmc = mm.permute(find_new_order_coloring(mm))
m = CsrMatrix.from_matrix_market(mmc)
t0 = time.perf_counter()
L = ic0_factor(m)
tf = time.perf_counter() - t0
out = {"nx": NX, "rows": n, "factor_seconds": tf}

for method in ("blocks", "levels"):
    pre, info = ic0_preconditioner(L, method=method, dtype=jnp.float32)
    r = jnp.ones((n,), jnp.float32)

    def step(v):
        z = pre(v)
        return z / jnp.maximum(jnp.abs(z).max(), 1e-30)

    t = time_kernel(step, (r,), runs=3)
    out[method] = {"apply_seconds": t.seconds_per_iteration, **info}
    print(method, json.dumps(out[method]), flush=True)

with open("experiments/probe51b_block_solve.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote experiments/probe51b_block_solve.json")
