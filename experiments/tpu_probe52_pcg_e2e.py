"""Probe 52: end-to-end solve wall time — does IC(0)+coloring win?

Solves the 512^2 Laplacian (262k rows) to rel tol 1e-6 on the chip:
- plain CG through the DIA fast path (dia_conjugate_gradient),
- Jacobi PCG (no-op on a constant-diagonal Laplacian, baseline),
- colored IC(0) PCG: XLA DIA matvec (shifted slices) + BlockTriSolve.

The permutation changes the matrix's diagonal structure (colored
order scatters the band), so the PCG leg prices BOTH its own matvec
and the preconditioner honestly on the reordered operator.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import CsrMatrix
from spmv_tpu.models.device import DeviceDia, device_put_matrix
from spmv_tpu.models.dia import DiaMatrix
from spmv_tpu.models.reorder import find_new_order_coloring
from spmv_tpu.ops import (
    conjugate_gradient,
    dia_conjugate_gradient,
    ic0_factor,
    ic0_preconditioner,
    preconditioned_conjugate_gradient,
    spmv,
)

print("device:", jax.devices()[0])
NX = 512
TOL = 1e-6
mm = poisson2d(NX, NX)
n = mm.num_rows
rng = np.random.default_rng(0)
b_host = rng.standard_normal(n).astype(np.float32)
out = {"nx": NX, "rows": n, "tol": TOL}


def timed(label, fn, *args):
    r = fn(*args)           # compile + run
    float(r.residual_norm)
    t0 = time.perf_counter()
    r = fn(*args)
    float(r.residual_norm)
    dt = time.perf_counter() - t0
    out[label] = {"seconds": dt, "iterations": int(r.iterations),
                  "residual_norm": float(r.residual_norm)}
    print(label, json.dumps(out[label]), flush=True)
    return r


# 1) plain CG, DIA fast path (natural order)
dia = DiaMatrix.from_matrix_market(mm)
Ad = DeviceDia.from_host(dia, dtype=jnp.float32)
b = jnp.asarray(b_host)
interp = jax.default_backend() == "cpu"

@jax.jit
def solve_plain(b):
    return dia_conjugate_gradient(Ad, b, tol=TOL, max_iterations=4000,
                                  interpret=interp)

timed("plain_dia_cg", solve_plain, b)

# 2) colored IC(0) PCG with the XLA DIA matvec on the permuted matrix
t0 = time.perf_counter()
order = find_new_order_coloring(mm)
mmc = mm.permute(order)
mc = CsrMatrix.from_matrix_market(mmc)
L = ic0_factor(mc)
pre, info = ic0_preconditioner(L, dtype=jnp.float32)
out["setup"] = {
    "coloring_and_factor_seconds": time.perf_counter() - t0,
    **{k: v for k, v in info.items() if k != "block_formats"},
}
print("setup", json.dumps(out["setup"]), flush=True)

diac = DiaMatrix.from_matrix_market(mmc)
out["colored_diagonals"] = diac.offsets.size
Ac = DeviceDia.from_host(diac, dtype=jnp.float32)
bc = jnp.asarray(b_host[np.argsort(order)])  # permuted rhs

@jax.jit
def solve_ic(bv):
    return preconditioned_conjugate_gradient(
        lambda v: spmv(Ac, v), bv, pre, tol=TOL, max_iterations=4000)

timed("ic0_colored_pcg", solve_ic, bc)

# 3) same matvec without the preconditioner (isolates the M^-1 cost
#    and the permutation's effect on the matvec)
@jax.jit
def solve_plain_colored(bv):
    return conjugate_gradient(
        lambda v: spmv(Ac, v), bv, tol=TOL, max_iterations=4000)

timed("plain_colored_cg", solve_plain_colored, bc)

with open("experiments/probe52_pcg_e2e.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote experiments/probe52_pcg_e2e.json")
