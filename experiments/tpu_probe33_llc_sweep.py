"""Probe 33: is there a large on-chip cache between HBM and the core?

Probe 32's ablation only reconciles with the v5e pin bandwidth if the
67 MB x/y buffer never leaves the chip: x-window reads + y writes ran
at 2.7 TB/s (no_d), and the full kernel's time equals the d-stream
alone at the measured streaming peak (336 MB / 463 us = 726 GB/s).
Hypothesis: an LLC of order 100 MB caches HBM traffic, so working
sets that fit get cache bandwidth, and the 512 MB buffers used by the
round-1 bandwidth probes never saw it.

Sweep an in-place Pallas copy (read+write same buffer, the no_d
pattern: manual DMA in, pipelined write out) across buffer sizes and
look for the bandwidth cliff.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
BLK = 2048   # rows per block: 1 MB blocks


def build(m_rows):
    grid = m_rows // BLK

    def kernel(x_hbm, y_ref, win, sems):
        j = pl.program_id(0)

        def dma(slot, jj):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(jj * BLK, BLK), :], win.at[slot],
                sems.at[slot])

        @pl.when(j == 0)
        def _():
            dma(0, 0).start()

        @pl.when(j + 1 < grid)
        def _():
            dma((j + 1) % 2, j + 1).start()

        dma(j % 2, j).wait()
        y_ref[:] = win[j % 2] + 1.0

    def call(x):
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((BLK, LANE), lambda j: (j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_rows, LANE), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, BLK, LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            input_output_aliases={0: 0},
        )(x)

    return call


def marginal(call, x, k1=8, k2=72, runs=4):
    def mk(k):
        @jax.jit
        def f(v):
            out = jax.lax.fori_loop(0, k, lambda _, v2: call(v2), v)
            return jnp.sum(out[0]) * 1e-12
        return f

    f1, f2 = mk(k1), mk(k2)
    for f in (f1, f2):
        float(f(x))
    best = []
    for f in (f1, f2):
        ts = [None] * runs
        for i in range(runs):
            t0 = time.perf_counter()
            float(f(x))
            ts[i] = time.perf_counter() - t0
        best.append(min(ts))
    return (best[1] - best[0]) / (k2 - k1)


for mb in (16, 32, 64, 96, 128, 160, 224, 320, 448):
    m_rows = mb * 1024 * 1024 // (LANE * 4)
    m_rows = (m_rows // BLK) * BLK
    if m_rows == 0:
        continue
    x = jnp.zeros((m_rows, LANE), jnp.float32)
    call = build(m_rows)
    per = marginal(call, x)
    nbytes = 2 * m_rows * LANE * 4
    print(f"{mb:4d} MB buffer: {per*1e6:8.1f} us/iter  "
          f"{nbytes/per/1e9:7.1f} GB/s r+w", flush=True)
