"""Probe 62: WELL-CW SpMM X-table layout — kill the strided-slice tax.

Probe 61 measured the shipped `wellcw_spmm` at 2.2-3.8x WORSE per-nnz
than the single-RHS kernel at the cliff case (k2 3.75x, k4 2.44x,
k8 2.20x): its X tables are (xr4, nvec, LANE) and the kernel slices
`T[:, v, :]` — a stride-nvec sublane view Mosaic must relayout before
every gather.  This probe re-formulates the merged-grid SpMM with
PER-RHS-CONTIGUOUS tables (d, nvec, xr4, LANE): the inner loop per
RHS is then byte-identical to the proven SpMV gather
(`take_along_axis` on a contiguous (SUBLANE, LANE) tile), with the
chunk's index decode (llane/sel/rowmap) and A-value loads shared
across the k RHS.

Expectation set honestly: the VALU gather work itself scales with
k * nnz (each RHS gathers its own x values — nothing to share), so
the structural ceiling is per-nnz parity with k separate SpMVs plus
the shared index-decode margin, NOT a DIA-style stream amortization.
The question is whether that margin lands above or below 1.0x.
"""

import functools
import json

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
assert mg is not None
print("merged kl:", mg.kl, "d:", mg.d, "blocks:", mg.num_blocks,
      flush=True)
rng = np.random.default_rng(0)


def cw_tables_v(mgrid, Xf, nvec):
    """(d, nvec, xr4, LANE) per-RHS-contiguous stride tables."""
    d, xr4 = mgrid.d, mgrid.xr4
    pad = xr4 * d * LANE - Xf.shape[0]
    x3d = jnp.pad(Xf, ((0, pad), (0, 0)))            # (xr4*d*LANE, nvec)
    x3d = x3d.T.reshape(nvec, xr4 * d, LANE)          # (nvec, xr4*d, L)
    return jnp.stack(
        [x3d[:, p::d, :] for p in range(d)])          # (d, nvec, xr4, L)


def _merged_spmm_kernel_v(ws_ref, x_ref, v_ref, l_ref, y_ref, *, d,
                          kl, cap, lvl_per, nvec, dtype):
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (64, LANE), 0)
    accs = [jnp.zeros((64, LANE), dtype=dtype) for _ in range(nvec)]
    for kk in range(kl):
        a4 = ws_ref[0, 0, kk]
        locv = l_ref[kk]
        llane = locv & (LANE - 1)
        sel = (locv >> 7) & (d - 1)
        val = v_ref[kk]
        rm = locv >> 14
        for v in range(nvec):
            g = jnp.zeros((SUBLANE, LANE), dtype=dtype)
            for p in range(d):
                T = x_ref[p, v, pl.ds(a4, SUBLANE), :]
                gthr = jnp.take_along_axis(T, llane, axis=1)
                g = g + jnp.where(sel == p, gthr, jnp.zeros_like(gthr))
            acc = val * g
            if kk < lvl_per:
                strip = jnp.sum(acc, axis=0, keepdims=True)
                accs[v] = accs[v] + jnp.where(
                    row_iota == (kk // cap),
                    jnp.broadcast_to(strip, (64, LANE)),
                    jnp.zeros((64, LANE), dtype=dtype),
                )
            else:
                for s in range(SUBLANE):
                    accs[v] = accs[v] + jnp.where(
                        row_iota == rm[s][None, :],
                        jnp.broadcast_to(acc[s][None, :], (64, LANE)),
                        jnp.zeros((64, LANE), dtype=dtype),
                    )
    for v in range(nvec):
        y_ref[:, v, :] = accs[v]


def merged_spmm_call_v(mgrid, xt, nvec, interpret=False):
    kl = mgrid.kl
    kernel = functools.partial(
        _merged_spmm_kernel_v, d=mgrid.d, kl=kl, cap=mgrid.cap,
        lvl_per=mgrid.lvl_per_block, nvec=nvec,
        dtype=mgrid.value.dtype,
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


out = {"kl": int(mg.kl), "d": int(mg.d)}

# single-RHS merged baseline: full vector -> vector (table build
# included, exactly like wellcw_spmv / probe 61's measurement)
@jax.jit
def merged_spmv_full(x):
    y = pk._cw_merged_call(mg, pk._cw_tables(mg, x), False)
    return y.reshape(-1)[:N]


x1 = jnp.asarray(rng.standard_normal(N).astype(np.float32))
t1 = time_kernel(merged_spmv_full, (x1,), k_small=4, k_large=48,
                 runs=6).seconds_per_iteration
out["k1_merged_seconds"] = t1
print("k1 merged", t1, flush=True)

for k in (2, 4, 8):
    X = jnp.asarray(rng.standard_normal((N, k)).astype(np.float32))

    def new_full(Xv, k=k):
        Y = merged_spmm_call_v(mg, cw_tables_v(mg, Xv, k), k)
        return Y.transpose(0, 2, 1).reshape(-1, k)[:N]

    def old_full(Xv, k=k):
        Y = pk._cw_merged_spmm_call(mg, pk._cw_tables3(mg, Xv, k), k,
                                    False)
        return Y.transpose(0, 2, 1).reshape(-1, k)[:N]

    new_full = jax.jit(new_full)
    old_full = jax.jit(old_full)
    y_old = old_full(X)
    y_new = new_full(X)
    rel = float(jnp.abs(y_new - y_old).max()
                / jnp.maximum(jnp.abs(y_old).max(), 1e-30))
    tk = time_kernel(new_full, (X,), k_small=4, k_large=24,
                     runs=6).seconds_per_iteration
    t_old = time_kernel(old_full, (X,), k_small=4, k_large=24,
                        runs=6).seconds_per_iteration
    out[f"k{k}"] = {
        "rel_vs_old": rel,
        "new_seconds": tk,
        "old_seconds": t_old,
        "new_per_nnz_vs_k1": (tk / k) / t1,
        "old_per_nnz_vs_k1": (t_old / k) / t1,
    }
    print(f"k{k}", json.dumps(out[f"k{k}"]), flush=True)

print(json.dumps(out))
