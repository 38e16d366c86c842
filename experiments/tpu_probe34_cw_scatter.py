"""Probe 34: WELL-CW output-scatter strategies (honest timing).

Bench config (random banded n=1M hb=2048 nnz/row=8): the CW kernel
runs at ~1.50 ms (where-scatter) / 1.73 ms (MXU one-hot scatter — the
strip concatenate relayouts eat the matmul win).  Ablate:

  where    — per-chunk (out_rows, LANE) masked add (round-1 shape)
  mxu      — one-hot matmul per step (needs k strips concatenated)
  dynrow   — per-chunk dynamic single-row read-modify-write of y_ref
  grouprun — running strip sum, flushed on group change via dynrow
             (groups are non-decreasing: ~8 flushes per 64 chunks)
  floor    — strips accumulated into row 0 (wrong result, no scatter):
             the gather-only floor
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.io.generate import banded_random
from spmv_tpu.models.device import DeviceWellCw
from spmv_tpu.models.wellcw import WellCwMatrix
from spmv_tpu.ops.pallas_kernels import LANE, SUBLANE, round_up

print("building...", flush=True)
cw_n = 1 << 20
mm = banded_random(cw_n, half_bandwidth=2048, nnz_per_row=8, seed=1)
cw = WellCwMatrix.from_matrix_market(mm)
A = DeviceWellCw.from_host(cw, dtype=jnp.float32)
x = np.random.default_rng(0).standard_normal(
    cw.num_columns).astype(np.float32)
xd = jnp.asarray(x)
for lvl in A.levels:
    print(f"level d={lvl.d}: chunks={lvl.num_chunks} K="
          f"{lvl.chunks_per_step}", flush=True)
print(f"B={A.blocks_per_out} groups={A.num_groups} "
      f"nnz={cw.num_entries}", flush=True)


def cw_kernel(blk_ref, ws_ref, grp_ref, x_ref, v_ref, l_ref, y_ref,
              *, d, k, out_rows, dtype, mode):
    i = pl.program_id(0)
    first = jnp.logical_or(
        i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)]
    )

    if mode in ("dynrow", "grouprun", "floor"):
        @pl.when(first)
        def _():
            y_ref[:] = jnp.zeros((out_rows, LANE), dtype)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (out_rows, LANE), 0)
    out_iota = jax.lax.broadcasted_iota(jnp.int32, (1, out_rows), 1)
    acc_blk = jnp.zeros((out_rows, LANE), dtype=dtype)
    strips = [None] * k
    onehot = [None] * k
    run = None
    run_grow = None
    for kk in range(k):
        a4 = ws_ref[0, 0, kk]
        locv = l_ref[kk]
        llane = locv & (LANE - 1)
        sel = (locv >> 7) & (d - 1)
        val = v_ref[kk]
        acc = jnp.zeros((SUBLANE, LANE), dtype=dtype)
        for p in range(d):
            T = x_ref[p, pl.ds(a4, SUBLANE), :]
            gthr = jnp.take_along_axis(T, llane, axis=1)
            acc = acc + jnp.where(sel == p, val * gthr,
                                  jnp.zeros_like(val))
        strip = jnp.sum(acc, axis=0, keepdims=True)
        grow = grp_ref[0, 0, kk] % out_rows
        if mode == "where":
            acc_blk = acc_blk + jnp.where(
                row_iota == grow,
                jnp.broadcast_to(strip, (out_rows, LANE)),
                jnp.zeros((out_rows, LANE), dtype=dtype),
            )
        elif mode == "mxu":
            strips[kk] = strip
            onehot[kk] = (out_iota == grow).astype(dtype)
        elif mode == "dynrow":
            y_ref[pl.ds(grow, 1), :] += strip
        elif mode == "floor":
            y_ref[pl.ds(0, 1), :] += strip
        elif mode == "grouprun":
            if kk == 0:
                run, run_grow = strip, grow
            else:
                same = run_grow == grow

                @pl.when(jnp.logical_not(same))
                def _(rg=run_grow, r=run):
                    y_ref[pl.ds(rg, 1), :] += r

                run = jnp.where(same, run + strip, strip)
                run_grow = grow
    if mode == "grouprun":
        y_ref[pl.ds(run_grow, 1), :] += run
    if mode == "mxu":
        S = jnp.concatenate(strips, axis=0)
        P = jnp.concatenate(onehot, axis=0)
        acc_blk = jax.lax.dot_general(
            P, S, (((0,), (0,)), ((), ())),
            preferred_element_type=dtype)
    if mode in ("where", "mxu"):
        @pl.when(first)
        def _():
            y_ref[:] = acc_blk

        @pl.when(jnp.logical_not(first))
        def _():
            y_ref[:] += acc_blk


def level_call(lvl, xt, padded_groups, out_rows, mode):
    k = lvl.chunks_per_step
    steps = lvl.num_chunks // k
    kernel = functools.partial(
        cw_kernel, d=lvl.d, k=k, out_rows=out_rows,
        dtype=lvl.value.dtype, mode=mode)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((1, 1, k), lambda i, blk: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, k), lambda i, blk: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((k, SUBLANE, LANE),
                             lambda i, blk: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, SUBLANE, LANE),
                             lambda i, blk: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (out_rows, LANE), lambda i, blk: (blk[i], 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (padded_groups, LANE), lvl.value.dtype),
    )(lvl.block_of_step, lvl.anchor4, lvl.group_of_chunk,
      xt, lvl.value, lvl.local_index)


def tables(lvl, xf):
    d, xr4 = lvl.d, lvl.xr4
    x2d = jnp.pad(xf, (0, xr4 * d * LANE - xf.shape[0])).reshape(
        xr4 * d, LANE)
    return jnp.stack([x2d[p::d] for p in range(d)])


def spmv(xv, A, mode):
    out_rows = SUBLANE * A.blocks_per_out
    padded_groups = round_up(A.num_groups, out_rows)
    xf = xv.astype(A.levels[0].value.dtype)
    y = None
    for lvl in A.levels:
        y2d = level_call(lvl, tables(lvl, xf), padded_groups,
                         out_rows, mode)
        y = y2d if y is None else y + y2d
    return y.reshape(-1)[:cw_n]


def marginal(step, args, k1=4, k2=52, runs=4):
    def mk(kc):
        @jax.jit
        def f(v, A):
            def body(_, v2):
                out = step(v2, A)
                return out[: v2.shape[0]]
            return jnp.sum(jax.lax.fori_loop(0, kc, body, v)) * 1e-9
        return f
    f1, f2 = mk(k1), mk(k2)
    for f in (f1, f2):
        float(f(*args))
    best = []
    for f in (f1, f2):
        ts = [None] * runs
        for r in range(runs):
            t0 = time.perf_counter()
            float(f(*args))
            ts[r] = time.perf_counter() - t0
        best.append(min(ts))
    return (best[1] - best[0]) / (k2 - k1)


want = cw.spmv(x.astype(np.float64))
for mode in ("where", "mxu", "dynrow", "grouprun", "floor"):
    y = np.asarray(spmv(xd, A, mode))
    rel = np.abs(y - want).max() / np.abs(want).max()
    per = marginal(functools.partial(spmv, mode=mode), (xd, A))
    ok = "OK " if rel < 1e-5 else ("(floor)" if mode == "floor"
                                   else "BAD")
    print(f"{mode:9s}: {per*1e6:7.1f} us  "
          f"{cw.num_entries/per/1e9:5.2f} Gnnz/s  rel={rel:.1e} {ok}",
          flush=True)
