"""Probe 59: multi-RHS (batched) CG throughput on the bench matrix.

The claim behind batched_conjugate_gradient: the DIA SpMM at 0.92 of
its composite roofline means k right-hand sides cost far less than k
sequential solves (A-stream amortization).  Measure iterations/s for
the single-RHS dia_conjugate_gradient vs dia_batched at k=4 on the
16.8M-row poisson bench matrix (HBM-streaming regime), slope-timed
between two fixed iteration counts (tol=0 so the while_loop runs
exactly max_iterations) to cancel setup/dispatch.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import DiaMatrix
from spmv_tpu.models.device import DeviceDia
from spmv_tpu.ops import dia_batched_conjugate_gradient, dia_conjugate_gradient

N_GRID = 4096
K = 4
ITERS = (40, 120)

print("device:", jax.devices()[0], flush=True)
mm = poisson2d(N_GRID, N_GRID)
dia = DiaMatrix.from_matrix_market(mm)
A = DeviceDia.from_host(dia, dtype=jnp.float32)
n = dia.num_rows
rng = np.random.default_rng(0)
b1 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
Bk = jnp.asarray(rng.standard_normal((n, K)).astype(np.float32))
out = {}


def slope(fn, args_small, args_large, iters):
    # tol=0: exact iteration counts; wall-clock slope between the two
    # chain lengths cancels pad/extract/dispatch overheads.  One
    # warmup per length for compile.
    ts = []
    for it, args in zip(iters, (args_small, args_large)):
        r = fn(*args)
        float(jnp.sum(r.x))  # compile+run, fetch syncs the tunnel
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            r = fn(*args)
            float(jnp.sum(r.x))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (iters[1] - iters[0])


single = jax.jit(lambda A_, b, it: dia_conjugate_gradient(
    A_, b, tol=0.0, max_iterations=it, path="pallas"),
    static_argnums=2)
t1 = slope(single, (A, b1, ITERS[0]), (A, b1, ITERS[1]), ITERS)
out["single_rhs_s_per_iter"] = t1
print("single:", t1, flush=True)

batched = jax.jit(lambda A_, B, it: dia_batched_conjugate_gradient(
    A_, B, tol=0.0, max_iterations=it, path="pallas"),
    static_argnums=2)
tk = slope(batched, (A, Bk, ITERS[0]), (A, Bk, ITERS[1]), ITERS)
out["batched_k4_s_per_iter"] = tk
out["batched_k4_s_per_iter_per_rhs"] = tk / K
out["throughput_vs_sequential"] = K * t1 / tk
print("batched k=4:", tk, "->", out["throughput_vs_sequential"],
      "x sequential", flush=True)

with open("experiments/probe59_batched_cg.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))


# ---- resident regime: 1M rows (diagonals + vectors fit on-chip) ----
mm_r = poisson2d(1024, 1024)
dia_r = DiaMatrix.from_matrix_market(mm_r)
Ar = DeviceDia.from_host(dia_r, dtype=jnp.float32)
nr = dia_r.num_rows
b1r = jnp.asarray(rng.standard_normal(nr).astype(np.float32))
Bkr = jnp.asarray(rng.standard_normal((nr, K)).astype(np.float32))
IT_R = (200, 600)

single_r = jax.jit(lambda A_, b, it: dia_conjugate_gradient(
    A_, b, tol=0.0, max_iterations=it, path="xla"),
    static_argnums=2)
t1r = slope(single_r, (Ar, b1r, IT_R[0]), (Ar, b1r, IT_R[1]), IT_R)
out["resident_single_s_per_iter"] = t1r
print("resident single:", t1r, flush=True)

batched_r = jax.jit(lambda A_, B, it: dia_batched_conjugate_gradient(
    A_, B, tol=0.0, max_iterations=it, path="xla"),
    static_argnums=2)
tkr = slope(batched_r, (Ar, Bkr, IT_R[0]), (Ar, Bkr, IT_R[1]), IT_R)
out["resident_batched_k4_s_per_iter"] = tkr
out["resident_throughput_vs_sequential"] = K * t1r / tkr
print("resident batched k=4:", tkr, "->",
      out["resident_throughput_vs_sequential"], "x", flush=True)

with open("experiments/probe59_batched_cg.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
