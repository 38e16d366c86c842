"""Probe 17: ablate the DIA SpMM kernel at large n to find the 0.46x gap.

Variants: (a) full kernel, (b) DMA window + write zeros (memory floor),
(c) no window DMA, compute from stale scratch (compute floor).
"""

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import DiaMatrix
from spmv_tpu.models.device import DeviceDia, LANE
from spmv_tpu.ops.pallas_kernels import make_plan, dia_prepare_X
from spmv_tpu.profile.harness import time_kernel

N = 4096
K = 4
TR = 256
mm = poisson2d(N, N)
dia = DiaMatrix.from_matrix_market(mm)
n, D = dia.num_rows, dia.num_diagonals
A = DeviceDia.from_host(dia, dtype=jnp.float32)
plan = make_plan(A, TR)
rng = np.random.default_rng(0)
x3d = dia_prepare_X(A, jnp.asarray(rng.standard_normal((n, K)).astype(np.float32)), TR)


def build(mode):
    w, fb, nb, wr = plan.tile_rows, plan.front_blocks, plan.num_tiles, plan.window_rows
    offsets = A.offsets

    def kernel(x_hbm, d_ref, y_ref, win, sems):
        j = pl.program_id(0)
        active = jnp.logical_and(j >= fb, j < fb + nb)

        def dma(slot, jj):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(jj * w + plan.smin_row, wr)],
                win.at[slot], sems.at[slot])

        if mode != "compute_only":
            @pl.when(j == fb)
            def _():
                dma(fb % 2, fb).start()

            @pl.when(jnp.logical_and(active, j + 1 < fb + nb))
            def _():
                dma((j + 1) % 2, j + 1).start()

        @pl.when(active)
        def _():
            if mode != "compute_only":
                dma(j % 2, j).wait()
            slot = j % 2
            if mode == "dma_only":
                y_ref[:] = jnp.zeros((w, K, LANE), jnp.float32)
                return
            lane = jax.lax.broadcasted_iota(jnp.int32, (w, K, LANE), 2)
            acc = jnp.zeros((w, K, LANE), jnp.float32)
            for kd, off in enumerate(offsets):
                s, t = divmod(off, LANE)
                lo = s - plan.smin_row
                if t == 0:
                    shifted = win[slot, pl.ds(lo, w)]
                else:
                    rows = win[slot, pl.ds(lo, w + 1)]
                    rolled = pltpu.roll(rows, LANE - t, axis=2)
                    shifted = jnp.where(
                        lane < LANE - t,
                        jax.lax.slice_in_dim(rolled, 0, w, axis=0),
                        jax.lax.slice_in_dim(rolled, 1, w + 1, axis=0),
                    )
                acc = acc + d_ref[kd][:, None, :] * shifted
            y_ref[:] = acc

        @pl.when(jnp.logical_not(active))
        def _():
            y_ref[:] = jnp.zeros((w, K, LANE), jnp.float32)

    d_, r0, _ = A.data.shape
    data = A.data
    nbw = plan.num_tiles * plan.tile_rows
    if nbw != r0:
        data = jnp.pad(data, ((0, 0), (0, nbw - r0), (0, 0)))

    @jax.jit
    def run(x3d, data):
        return pl.pallas_call(
            kernel,
            grid=(plan.grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((d_, plan.tile_rows, LANE),
                             lambda j: (0, jnp.clip(j - fb, 0, nb - 1), 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((plan.tile_rows, K, LANE),
                                   lambda j: (j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (plan.total_rows, K, LANE), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, plan.window_rows, K, LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(x3d, data)

    fb, nb = plan.front_blocks, plan.num_tiles
    return run, data


bytes_total = D * 4 * n + 2 * K * n * 4
for mode in ("full", "dma_only", "compute_only"):
    run, data = build(mode)
    def step(x3d, data):
        return run(x3d, data)
    t = time_kernel(step, (x3d, data), k_small=2, k_large=8, runs=4).seconds_per_iteration
    print(f"{mode:13s}: {t*1e6:8.1f} us  (roofline {bytes_total/819e9*1e6:.0f} us)",
          flush=True)
