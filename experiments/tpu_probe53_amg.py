"""Probe 53: SA-AMG preconditioning at bandwidth-bound scale.

Probe 52 showed IC(0) is a wash at 262k rows because the iteration is
loop-overhead-bound there, and plain CG's iteration count grows like
the mesh diameter.  AMG attacks the count itself: O(1) iterations
regardless of size, with an apply that is pure SpMV work (Chebyshev
smoothing + P/Pt hops + a dense coarse matmul).

Solves the NX^2 Laplacian to rel tol 1e-6 on the chip, f32:
- plain CG through the DIA fast path,
- SA-AMG(3-level) PCG with the same DIA matvec,
and reports setup cost separately (host numpy SpGEMM + native
aggregation).
"""

import json
import time

import jax
import numpy as np

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models.device import device_put_matrix
from spmv_tpu.models.dia import DiaMatrix
from spmv_tpu.ops import (
    amg_preconditioner,
    dia_conjugate_gradient,
    preconditioned_conjugate_gradient,
    smoothed_aggregation_setup,
    spmv,
)

print("device:", jax.devices()[0])
out = {}
for NX in (1024, 2048):
    TOL = 1e-6
    mm = poisson2d(NX, NX)
    n = mm.num_rows
    dia = DiaMatrix.from_matrix_market(mm)
    A = device_put_matrix(dia)
    rng = np.random.default_rng(0)
    b_host = rng.standard_normal(n).astype(np.float32)
    import jax.numpy as jnp

    b = jnp.asarray(b_host)
    rec = {"rows": n, "tol": TOL}

    def timed(fn, *args):
        r = fn(*args)
        float(r.residual_norm)
        t0 = time.perf_counter()
        r = fn(*args)
        float(r.residual_norm)
        return r, time.perf_counter() - t0

    plain = jax.jit(lambda bv: dia_conjugate_gradient(
        A, bv, tol=TOL, max_iterations=20000))
    r, dt = timed(plain, b)
    rec["plain_cg"] = {"iters": int(r.iterations), "seconds": dt}
    print(NX, "plain", rec["plain_cg"], flush=True)

    t0 = time.perf_counter()
    hier = smoothed_aggregation_setup(dia)
    setup_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    apply_m, info = amg_preconditioner(hierarchy=hier)
    build_s = time.perf_counter() - t0
    rec["amg_setup_seconds"] = setup_s
    rec["amg_device_build_seconds"] = build_s
    rec["amg_info"] = info
    print(NX, "setup", round(setup_s, 2), "s", info, flush=True)

    amg = jax.jit(lambda bv: preconditioned_conjugate_gradient(
        lambda v: spmv(A, v), bv, apply_m, tol=TOL,
        max_iterations=500))
    r2, dt2 = timed(amg, b)
    rec["amg_pcg"] = {"iters": int(r2.iterations), "seconds": dt2}
    rec["speedup_solve_only"] = dt / dt2
    rec["speedup_with_setup"] = dt / (dt2 + setup_s + build_s)
    print(NX, "amg", rec["amg_pcg"], "speedup",
          round(rec["speedup_solve_only"], 2), flush=True)
    out[f"nx_{NX}"] = rec

with open("experiments/probe53_amg.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
