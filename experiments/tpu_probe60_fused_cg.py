"""Probe 60: fuse CG's p.Ap dot into the DIA matvec kernel.

A streaming-regime CG iteration (16.8M-row poisson, Pallas path) is
~0.44 ms of matvec + ~0.9 ms of vector passes.  The alpha dot reads
p and Ap from HBM (~134 MB, ~0.16 ms) even though the kernel had p's
tile in VMEM while computing Ap's — dia_spmv_core(with_dot=True)
emits lane-wise partials instead.  Expected ~12%; measured below.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import DiaMatrix
from spmv_tpu.models.device import DeviceDia
from spmv_tpu.ops import dia_conjugate_gradient
from spmv_tpu.ops.pallas_kernels import (
    dia_extract_y,
    dia_prepare_x,
    dia_spmv_core,
)
from spmv_tpu.ops.solvers import CgResult

N_GRID = 4096
ITERS = (40, 120)

print("device:", jax.devices()[0], flush=True)
mm = poisson2d(N_GRID, N_GRID)
dia = DiaMatrix.from_matrix_market(mm)
A = DeviceDia.from_host(dia, dtype=jnp.float32)
n = dia.num_rows
rng = np.random.default_rng(0)
x_true = rng.standard_normal(n).astype(np.float32)
b = jnp.asarray(dia.spmv(x_true).astype(np.float32))
out = {}


def unfused_cg(A, b, max_iterations, tile_rows=256):
    """The pre-probe-60 loop: generic CG over the padded layout with
    a separate vdot for alpha."""
    b2 = dia_prepare_x(A, b, tile_rows)
    x0 = jnp.zeros_like(b2)

    def matvec(p2):
        return dia_spmv_core(A, p2, tile_rows, in_place=False)

    r0 = b2 - matvec(x0)
    rs0 = jnp.vdot(r0, r0)

    def cond(s):
        return s[4] < max_iterations

    def body(s):
        x, r, p, rs, k = s
        ap = matvec(p)
        alpha = rs / jnp.vdot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.vdot(r, r)
        p = r + (rs_new / rs) * p
        return (x, r, p, rs_new, k + 1)

    x, r, p, rs, k = jax.lax.while_loop(
        cond, body, (x0, r0, r0, rs0, jnp.array(0, jnp.int32)))
    return CgResult(x=dia_extract_y(A, x, tile_rows),
                    residual_norm=jnp.sqrt(rs), iterations=k)


def slope(make_fn, args):
    import time
    ts = []
    for it in ITERS:
        fn = jax.jit(lambda *a: make_fn(*a, it))
        r = fn(*args)
        float(jnp.sum(r.x))
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            r = fn(*args)
            float(jnp.sum(r.x))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (ITERS[1] - ITERS[0])


t_unfused = slope(lambda A_, b_, it: unfused_cg(A_, b_, it), (A, b))
out["unfused_s_per_iter"] = t_unfused
print("unfused:", t_unfused, flush=True)

t_fused = slope(lambda A_, b_, it: dia_conjugate_gradient(
    A_, b_, tol=0.0, max_iterations=it, path="pallas"), (A, b))
out["fused_s_per_iter"] = t_fused
out["speedup"] = t_unfused / t_fused
print("fused:", t_fused, "->", out["speedup"], "x", flush=True)

# correctness: fused solve reaches x_true
res = jax.jit(lambda A_, b_: dia_conjugate_gradient(
    A_, b_, tol=1e-5, max_iterations=2000, path="pallas"))(A, b)
rel = float(np.linalg.norm(np.asarray(res.x, np.float64) - x_true)
            / np.linalg.norm(x_true))
out["fused_solve_iterations"] = int(res.iterations)
out["fused_rel_x_err"] = rel
print("solve:", int(res.iterations), "iters, rel err", rel, flush=True)
assert rel < 1e-2

with open("experiments/probe60_fused_cg.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
