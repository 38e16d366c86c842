"""Probe 52b: IC(0)+coloring on the anisotropic Laplacian (eps=100).

Probe 52 showed a wash on the well-conditioned Laplacian (iterations
halve, per-iteration doubles).  The preconditioner's case is the
ill-conditioned one: anisotropy inflates plain-CG iterations far more
than IC(0)-PCG's, so the 2x per-iteration cost is paid back many
times over.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.io.generate import anisotropic2d
from spmv_tpu.models import CsrMatrix
from spmv_tpu.models.device import DeviceDia
from spmv_tpu.models.dia import DiaMatrix
from spmv_tpu.models.reorder import find_new_order_coloring
from spmv_tpu.ops import (
    conjugate_gradient,
    ic0_factor,
    ic0_preconditioner,
    preconditioned_conjugate_gradient,
    spmv,
)

print("device:", jax.devices()[0])
NX, EPS, TOL = 512, 100.0, 1e-6
mm = anisotropic2d(NX, epsilon=EPS)
n = mm.num_rows
rng = np.random.default_rng(0)
b_host = rng.standard_normal(n).astype(np.float32)
out = {"nx": NX, "rows": n, "epsilon": EPS, "tol": TOL}

order = find_new_order_coloring(mm)
mmc = mm.permute(order)
mc = CsrMatrix.from_matrix_market(mmc)
t0 = time.perf_counter()
L = ic0_factor(mc)
out["factor_seconds"] = time.perf_counter() - t0
pre, info = ic0_preconditioner(L, dtype=jnp.float32)
out["levels"] = info["levels_forward"]

Ac = DeviceDia.from_host(DiaMatrix.from_matrix_market(mmc),
                         dtype=jnp.float32)
bc = jnp.asarray(b_host[np.argsort(order)])


def timed(label, fn):
    r = fn(bc)
    float(r.residual_norm)
    t0 = time.perf_counter()
    r = fn(bc)
    float(r.residual_norm)
    out[label] = {"seconds": time.perf_counter() - t0,
                  "iterations": int(r.iterations),
                  "residual_norm": float(r.residual_norm)}
    print(label, json.dumps(out[label]), flush=True)


timed("plain_cg", jax.jit(lambda bv: conjugate_gradient(
    lambda v: spmv(Ac, v), bv, tol=TOL, max_iterations=20000)))
timed("ic0_pcg", jax.jit(lambda bv: preconditioned_conjugate_gradient(
    lambda v: spmv(Ac, v), bv, pre, tol=TOL, max_iterations=20000)))

with open("experiments/probe52b_anisotropic.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote experiments/probe52b_anisotropic.json")
