"""Probe 62c: CW SpMM — PARTIALLY unrolled chunk loop.

Probe 62b: full fori roll compiles in 36 s but runs 2.7x slower than
the unrolled layout (no cross-chunk overlap).  Middle ground: a
fori_loop whose body unrolls U chunks — compile ~U-proportional,
runtime should recover intra-body overlap.  Sweep U at k=4.

Original 62b header follows.

Probe 62's per-RHS-contiguous layout fixed the SpMM's per-nnz cost
(0.92/0.76 of single-RHS at k=2/4 vs 3.5-3.8x worse shipped), but
the kl*d*nvec-unrolled kernel costs ~6/18 minutes of Mosaic compile
at k=2/4 (kl=144) — unshippable as a first-call product experience
even with the AOT cache amortizing repeats.  This probe rolls the
chunk loop into TWO lax.fori_loops (level chunks then pool chunks —
the static kk<lvl_per split becomes the loop bounds) with the d*nvec
gather fan still unrolled.  Question: compile time (expect ~kl-fold
smaller program) and the runtime cost of losing cross-chunk
instruction overlap.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.io.generate import banded_random
from spmv_tpu.models.wellcw import WellCwMatrix
from spmv_tpu.models.device import DeviceWellCw
from spmv_tpu.ops import pallas_kernels as pk
from spmv_tpu.ops.pallas_kernels import LANE, SUBLANE
from spmv_tpu.profile.harness import time_kernel

N = 1 << 20
BW = 2048

print("device:", jax.devices()[0], flush=True)
mm = banded_random(N, half_bandwidth=BW, nnz_per_row=8, seed=1)
cw = WellCwMatrix.from_matrix_market(mm)
A = DeviceWellCw.from_host(cw, dtype=jnp.float32)
mg = A.merged
print("merged kl:", mg.kl, "d:", mg.d, "lvl_per:", mg.lvl_per_block,
      "cap:", mg.cap, flush=True)
rng = np.random.default_rng(0)


def cw_tables_v(mgrid, Xf, nvec):
    d, xr4 = mgrid.d, mgrid.xr4
    pad = xr4 * d * LANE - Xf.shape[0]
    x3d = jnp.pad(Xf, ((0, pad), (0, 0)))
    x3d = x3d.T.reshape(nvec, xr4 * d, LANE)
    return jnp.stack([x3d[:, p::d, :] for p in range(d)])


def _merged_spmm_fori(ws_ref, x_ref, v_ref, l_ref, y_ref, *, d, kl,
                      cap, lvl_per, nvec, dtype, unroll=8):
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (64, LANE), 0)

    def gathered(kk, v):
        a4 = ws_ref[0, 0, kk]
        locv = l_ref[kk]
        llane = locv & (LANE - 1)
        sel = (locv >> 7) & (d - 1)
        g = jnp.zeros((SUBLANE, LANE), dtype=dtype)
        for p in range(d):
            T = x_ref[p, v, pl.ds(a4, SUBLANE), :]
            gthr = jnp.take_along_axis(T, llane, axis=1)
            g = g + jnp.where(sel == p, gthr, jnp.zeros_like(gthr))
        return v_ref[kk] * g, locv

    def level_body(step, accs):
        out = list(accs)
        for u in range(unroll):
            kk = step * unroll + u
            for v in range(nvec):
                acc, _ = gathered(kk, v)
                strip = jnp.sum(acc, axis=0, keepdims=True)
                out[v] = out[v] + jnp.where(
                    row_iota == (kk // cap),
                    jnp.broadcast_to(strip, (64, LANE)),
                    jnp.zeros((64, LANE), dtype=dtype))
        return tuple(out)

    def pool_body(step, accs):
        out = list(accs)
        for u in range(unroll):
            kk = step * unroll + u
            for v in range(nvec):
                acc, locv = gathered(kk, v)
                rm = locv >> 14
                a = out[v]
                for s in range(SUBLANE):
                    a = a + jnp.where(
                        row_iota == rm[s][None, :],
                        jnp.broadcast_to(acc[s][None, :], (64, LANE)),
                        jnp.zeros((64, LANE), dtype=dtype))
                out[v] = a
        return tuple(out)

    # level chunks occupy [0, lvl_per), pool chunks [lvl_per, kl);
    # both regions are unroll-aligned for the shapes probed here
    # (asserted below); production code would pad or peel.
    assert lvl_per % unroll == 0 and (kl - lvl_per) % unroll == 0, (
        lvl_per, kl, unroll)
    accs = tuple(jnp.zeros((64, LANE), dtype=dtype)
                 for _ in range(nvec))
    accs = jax.lax.fori_loop(0, lvl_per // unroll, level_body, accs)

    def pool_body_shifted(step, accs):
        return pool_body(step + lvl_per // unroll, accs)

    accs = jax.lax.fori_loop(0, (kl - lvl_per) // unroll,
                             pool_body_shifted, accs)
    for v in range(nvec):
        y_ref[:, v, :] = accs[v]


def call_fori(mgrid, xt, nvec, unroll=8, interpret=False):
    kl = mgrid.kl
    kernel = functools.partial(
        _merged_spmm_fori, d=mgrid.d, kl=kl, cap=mgrid.cap,
        lvl_per=mgrid.lvl_per_block, nvec=nvec,
        dtype=mgrid.value.dtype, unroll=unroll,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(mgrid.num_blocks,),
            in_specs=[
                pl.BlockSpec((1, 1, kl), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((kl, SUBLANE, LANE),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kl, SUBLANE, LANE),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (64, nvec, LANE), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (mgrid.num_blocks * 64, nvec, LANE), mgrid.value.dtype
        ),
        interpret=interpret,
    )(mg.anchor4, xt, mg.value, mg.local_index)


# reference output through the host spmv restricted comparison: use
# the shipped spmv as ground truth per column
x1 = jnp.asarray(rng.standard_normal(N).astype(np.float32))
t1 = time_kernel(
    jax.jit(lambda x: pk._cw_merged_call(
        mg, pk._cw_tables(mg, x), False).reshape(-1)[:N]),
    (x1,), k_small=4, k_large=48, runs=6).seconds_per_iteration
out = {"kl": int(mg.kl), "k1_merged_seconds": t1}
print("k1 merged", t1, flush=True)

k = 4
X = jnp.asarray(rng.standard_normal((N, k)).astype(np.float32))
yrefs = [pk._cw_merged_call(
    mg, pk._cw_tables(mg, X[:, j]), False).reshape(-1)[:N]
    for j in range(k)]
for U in (4, 8, 16, 24):
    if mg.lvl_per_block % U or (mg.kl - mg.lvl_per_block) % U:
        out[f"U{U}"] = {"skipped": "not unroll-aligned"}
        print(f"U{U} skipped", flush=True)
        continue

    def fori_full(Xv, U=U):
        Y = call_fori(mg, cw_tables_v(mg, Xv, k), k, unroll=U)
        return Y.transpose(0, 2, 1).reshape(-1, k)[:N]

    fori_full = jax.jit(fori_full)
    tc0 = time.perf_counter()
    Yf = fori_full(X)
    Yf.block_until_ready()
    compile_s = time.perf_counter() - tc0
    errs = [float(jnp.abs(Yf[:, j] - yrefs[j]).max()
                  / jnp.maximum(jnp.abs(yrefs[j]).max(), 1e-30))
            for j in range(k)]
    tk = time_kernel(fori_full, (X,), k_small=4, k_large=24,
                     runs=6).seconds_per_iteration
    out[f"U{U}"] = {
        "compile_seconds": compile_s,
        "max_col_rel_err": max(errs),
        "seconds": tk,
        "per_nnz_vs_k1": (tk / k) / t1,
    }
    print(f"U{U}", json.dumps(out[f"U{U}"]), flush=True)

print(json.dumps(out))
