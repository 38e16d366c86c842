"""Probe 32: per-stream ablation of the in-place DIA SpMV.

The honest long-chain timing of the in-place DIA SpMV is ~490 us/iter
(probe 30, linear fit over K=4..128).  Modeled traffic is 470 MB
(336 d + ~86 window reads + 67 y writes) -> 959 GB/s apparent, above
both the 745 GB/s measured read peak (probe 31b/c) and the 819 GB/s
v5e spec.  Something in the model double-counts, or read/write streams
overlap on separate paths.  Ablate each stream on the REAL kernel
shapes:

  full     — the production kernel (d + window-x + y, in-place)
  no_x     — window DMAs skipped, window buffer unread (d + y)
  no_d     — d block replaced by an (d,8,LANE) stub (x + y)
  tiny_y   — output block (8,LANE) fixed at 0 (d + x)

All timed as long-chain marginals with scalar fetch.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import DiaMatrix
from spmv_tpu.models.device import DeviceDia
from spmv_tpu.ops.pallas_kernels import (
    LANE,
    dia_prepare_x,
    make_plan,
)

TR = 256

print("building matrix...", flush=True)
mm = poisson2d(4096, 4096)
dia = DiaMatrix.from_matrix_market(mm)
A = DeviceDia.from_host(dia, dtype=jnp.float32)
plan = make_plan(A, TR)
n = dia.num_rows
d = len(A.offsets)
w = plan.tile_rows
fb, nb, wr = plan.front_blocks, plan.num_tiles, plan.window_rows
print(f"n={n} d={d} w={w} fb={fb} nb={nb} wr={wr} grid={plan.grid} "
      f"total_rows={plan.total_rows}", flush=True)

d_mb = d * nb * w * LANE * 4 / 1e6
x_mb = plan.grid * wr * LANE * 4 / 1e6
y_mb = plan.total_rows * LANE * 4 / 1e6
print(f"streams: d={d_mb:.0f} MB  x-windows={x_mb:.0f} MB  "
      f"y={y_mb:.0f} MB", flush=True)

data = A.data
nbw = nb * w
if nbw != data.shape[1]:
    data = jnp.pad(data, ((0, 0), (0, nbw - data.shape[1]), (0, 0)))

offsets = A.offsets


def kernel(x_hbm, d_ref, y_ref, win, sems, *, use_x, use_d, tiny_y):
    j = pl.program_id(0)
    active = jnp.logical_and(j >= fb, j < fb + nb)

    def window_dma(slot, jj):
        start = jj * w + plan.smin_row
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, wr), :], win.at[slot], sems.at[slot])

    if use_x:
        @pl.when(j == fb)
        def _():
            window_dma(fb % 3, fb).start()
            if nb > 1:
                window_dma((fb + 1) % 3, fb + 1).start()

        @pl.when(jnp.logical_and(active, j + 2 < fb + nb))
        def _():
            window_dma((j + 2) % 3, j + 2).start()

        @pl.when(j == fb)
        def _():
            window_dma(fb % 3, fb).wait()

        @pl.when(jnp.logical_and(active, j + 1 < fb + nb))
        def _():
            window_dma((j + 1) % 3, j + 1).wait()

    slot = j % 3
    yshape = (8, LANE) if tiny_y else (w, LANE)

    @pl.when(active)
    def _():
        acc = jnp.zeros(yshape, jnp.float32)
        for k in range(d):
            dk = d_ref[k, :yshape[0]] if use_d else jnp.float32(1.0)
            xs = (win[slot, pl.ds(k * 8, yshape[0]), :] if use_x
                  else jnp.float32(1.0))
            acc = acc + dk * xs
        y_ref[:] = acc

    @pl.when(jnp.logical_not(active))
    def _():
        y_ref[:] = jnp.zeros(yshape, jnp.float32)


def build(use_x, use_d, tiny_y, in_place):
    kfn = functools.partial(kernel, use_x=use_x, use_d=use_d,
                            tiny_y=tiny_y)
    d_block = (d, w, LANE) if use_d else (d, 8, LANE)
    d_arr = data if use_d else data[:, :8]
    if tiny_y:
        out_spec = pl.BlockSpec((8, LANE), lambda j: (0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((8, LANE), jnp.float32)
        ioa = {}
    else:
        out_spec = pl.BlockSpec((w, LANE), lambda j: (j, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(
            (plan.total_rows, LANE), jnp.float32)
        ioa = {0: 0} if in_place else {}

    def call(x2d, d_arr):
        return pl.pallas_call(
            kfn, grid=(plan.grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    d_block,
                    lambda j: (0, jnp.clip(j - fb, 0, nb - 1) if use_d
                               else 0, 0),
                    memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((3, wr, LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
            input_output_aliases=ioa,
        )(x2d, d_arr)

    return call, d_arr


def marginal(call, x2d, d_arr, chainable, k1=8, k2=72, runs=4):
    def mk(k):
        @jax.jit
        def f(v, d_arr):
            def body(_, v2):
                out = call(v2, d_arr)
                if chainable:
                    return out
                # tiny_y: fold the small output back into the carry
                return jax.lax.dynamic_update_slice(
                    v2, out * 1e-20, (0, 0))
            return jnp.sum(jax.lax.fori_loop(0, k, body, v)[0]) * 1e-12
        return f

    f1, f2 = mk(k1), mk(k2)
    for f in (f1, f2):
        float(f(x2d, d_arr))
    best = []
    for f in (f1, f2):
        ts = [None] * runs
        for i in range(runs):
            t0 = time.perf_counter()
            float(f(x2d, d_arr))
            ts[i] = time.perf_counter() - t0
        best.append(min(ts))
    return (best[1] - best[0]) / (k2 - k1)


x = np.random.default_rng(0).standard_normal(n).astype(np.float32)
x2d = dia_prepare_x(A, jnp.asarray(x), TR)

cases = [
    ("full_ip", dict(use_x=True, use_d=True, tiny_y=False, in_place=True)),
    ("full_oop", dict(use_x=True, use_d=True, tiny_y=False,
                      in_place=False)),
    ("no_x", dict(use_x=False, use_d=True, tiny_y=False, in_place=True)),
    ("no_d", dict(use_x=True, use_d=False, tiny_y=False, in_place=True)),
    ("tiny_y", dict(use_x=True, use_d=True, tiny_y=True, in_place=False)),
]

mb = dict(
    full_ip=d_mb + x_mb + y_mb,
    full_oop=d_mb + x_mb + y_mb,
    no_x=d_mb + y_mb,
    no_d=x_mb + y_mb,
    tiny_y=d_mb + x_mb,
)

for name, kw in cases:
    call, d_arr = build(**kw)
    chainable = not kw["tiny_y"]
    per = marginal(call, x2d, d_arr, chainable)
    print(f"{name:9s}: {per*1e6:7.1f} us/iter  modeled {mb[name]:5.0f} MB"
          f"  -> {mb[name]*1e6/per/1e9:7.1f} GB/s", flush=True)
