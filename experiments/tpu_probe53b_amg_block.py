"""Probe 53b: the gather-free block-AMG fast path at scale.

Probe 53's generic SA V-cycle collapsed the iteration count (2399->9
at 1M rows) but lost the wall-clock war ~100x: gather-bound CSR
matvecs, closure-captured hierarchy, 19-minute setup.  This variant
aggregates fixed-size runs of consecutive rows (reshape transfers),
keeps every level in DIA (smooth_levels caps the Galerkin stencil
growth), and passes the hierarchy as a jit argument.

NX^2 Laplacian, f32, rel tol 1e-6; smooth_levels swept per size.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models.device import device_put_matrix
from spmv_tpu.models.dia import DiaMatrix
from spmv_tpu.ops import (
    amg_solve,
    block_aggregation_setup,
    dia_conjugate_gradient,
)

print("device:", jax.devices()[0])
out = {}
for NX in (1024, 2048, 4096):
    TOL = 1e-6
    mm = poisson2d(NX, NX)
    n = mm.num_rows
    dia = DiaMatrix.from_matrix_market(mm)
    A = device_put_matrix(dia)
    rng = np.random.default_rng(0)
    b_host = rng.standard_normal(n).astype(np.float32)
    b = jnp.asarray(b_host)
    rec = {"rows": n, "tol": TOL}

    def timed_solve(fn, *args):
        r = fn(*args)
        float(r.residual_norm)
        t0 = time.perf_counter()
        r = fn(*args)
        float(r.residual_norm)
        return r, time.perf_counter() - t0

    plain = jax.jit(lambda bv: dia_conjugate_gradient(
        A, bv, tol=TOL, max_iterations=40000))
    r, dt = timed_solve(plain, b)
    rec["plain_cg"] = {"iters": int(r.iterations), "seconds": dt}
    print(NX, "plain", rec["plain_cg"], flush=True)

    for sl in ((0, 1, 2) if NX <= 1024 else (0, 1)):
        t0 = time.perf_counter()
        hier = block_aggregation_setup(dia, smooth_levels=sl)
        setup_s = time.perf_counter() - t0

        r2, info = amg_solve(dia, b, tol=TOL, max_iterations=2000,
                             hierarchy=hier)
        float(r2.residual_norm)
        t0 = time.perf_counter()
        r2, info = amg_solve(dia, b, tol=TOL, max_iterations=2000,
                             hierarchy=hier)
        float(r2.residual_norm)
        dt2 = time.perf_counter() - t0
        x64 = np.asarray(r2.x, np.float64)
        rr = np.linalg.norm(b_host - np.asarray(
            dia.spmv(x64), np.float64)) / np.linalg.norm(b_host)
        rec[f"amg_sl{sl}"] = {
            "setup_seconds": setup_s,
            "iters": int(r2.iterations),
            "seconds": dt2,
            "speedup_solve_only": dt / dt2,
            "speedup_with_setup": dt / (dt2 + setup_s),
            "true_rel_residual": rr,
            "operator_complexity": info["operator_complexity"],
            "levels": info["levels"],
            "level_formats": info["level_formats"],
        }
        print(NX, f"amg sl={sl}", rec[f"amg_sl{sl}"], flush=True)
    out[f"nx_{NX}"] = rec
    with open("experiments/probe53b_amg_block.json", "w") as f:
        json.dump(out, f, indent=1)

print(json.dumps(out, indent=1))
