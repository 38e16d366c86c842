"""Probe 22: is the SpMM gap the T(4,128) tiling of (rows, K, LANE)?

Variants at TR=512, K=4, 16.8M rows:
  c3d   — compute-only, 3-D ops on the (wr, K, LANE) window (probe-17)
  c2d   — compute-only, rolls on the flattened ((wr)*K, LANE) view
  full2d— window DMA + 2-D compute (the candidate production kernel)

In the padded (total_rows, K, LANE) layout, logical row i of column k
lives at [(i), k, :]; flattening the leading two dims gives a dense
(8,128)-tiled 2-D array where "next logical row" = K sublanes down —
rolls/selects become plain 2-D ops and the VPU works on full
registers.
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
TR = 512
mm = poisson2d(N, N)
dia = DiaMatrix.from_matrix_market(mm)
n, D = dia.num_rows, dia.num_diagonals
A = DeviceDia.from_host(dia, dtype=jnp.float32)
plan = make_plan(A, TR)
rng = np.random.default_rng(0)
X = rng.standard_normal((n, K)).astype(np.float32)
x3d = dia_prepare_X(A, jnp.asarray(X), TR)
# flattened HBM layout: ((total_rows*K), LANE), row i*K + k
x2f = x3d.reshape(plan.total_rows * K, LANE)


def build(mode):
    w, fb, nb, wr = (plan.tile_rows, plan.front_blocks, plan.num_tiles,
                     plan.window_rows)
    offsets = A.offsets
    flat = mode in ("c2d", "full2d")

    def kernel(x_hbm, d_ref, y_ref, win, sems):
        j = pl.program_id(0)
        active = jnp.logical_and(j >= fb, j < fb + nb)

        def dma(slot, jj):
            if flat:
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds((jj * w + plan.smin_row) * K, wr * K)],
                    win.at[slot], sems.at[slot])
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(jj * w + plan.smin_row, wr)],
                win.at[slot], sems.at[slot])

        if mode.startswith("full"):
            @pl.when(j == fb)
            def _():
                dma(fb % 2, fb).start()

            @pl.when(jnp.logical_and(active, j + 1 < fb + nb))
            def _():
                dma((j + 1) % 2, j + 1).start()

        @pl.when(active)
        def _():
            if mode.startswith("full"):
                dma(j % 2, j).wait()
            slot = j % 2
            if flat:
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (w * K, LANE), 1)
                acc = jnp.zeros((w * K, LANE), jnp.float32)
                # d row for flattened row r is r // K: precompute the
                # K-replicated diagonal block by sublane repeat.
                for kd, off in enumerate(offsets):
                    s, t = divmod(off, LANE)
                    lo = (s - plan.smin_row) * K
                    dk = jnp.repeat(d_ref[kd], K, axis=0)
                    if t == 0:
                        shifted = win[slot, pl.ds(lo, w * K)]
                    else:
                        rows = win[slot, pl.ds(lo, (w + 1) * K)]
                        rolled = pltpu.roll(rows, LANE - t, axis=1)
                        shifted = jnp.where(
                            lane < LANE - t,
                            jax.lax.slice_in_dim(rolled, 0, w * K,
                                                 axis=0),
                            jax.lax.slice_in_dim(rolled, K,
                                                 (w + 1) * K, axis=0),
                        )
                    acc = acc + dk * shifted
                y_ref[:] = acc
            else:
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (w, K, LANE), 2)
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
                            jax.lax.slice_in_dim(rolled, 1, w + 1,
                                                 axis=0),
                        )
                    acc = acc + d_ref[kd][:, None, :] * shifted
                y_ref[:] = acc

        @pl.when(jnp.logical_not(active))
        def _():
            if flat:
                y_ref[:] = jnp.zeros((w * K, LANE), jnp.float32)
            else:
                y_ref[:] = jnp.zeros((w, K, LANE), jnp.float32)

    d_, r0, _ = A.data.shape
    data = A.data
    nbw = plan.num_tiles * plan.tile_rows
    if nbw != r0:
        data = jnp.pad(data, ((0, 0), (0, nbw - r0), (0, 0)))

    if flat:
        out_spec = pl.BlockSpec((w * K, LANE), lambda j: (j, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(
            (plan.total_rows * K, LANE), jnp.float32)
        scratch = pltpu.VMEM((2, wr * K, LANE), jnp.float32)
        xin = x2f
    else:
        out_spec = pl.BlockSpec((w, K, LANE), lambda j: (j, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(
            (plan.total_rows, K, LANE), jnp.float32)
        scratch = pltpu.VMEM((2, wr, K, LANE), jnp.float32)
        xin = x3d

    @jax.jit
    def run(xv, data):
        return pl.pallas_call(
            kernel,
            grid=(plan.grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((d_, w, LANE),
                             lambda j: (0, jnp.clip(j - fb, 0, nb - 1), 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=[scratch, pltpu.SemaphoreType.DMA((2,))],
        )(xv, data)

    fb, nb = plan.front_blocks, plan.num_tiles
    return run, data, xin


bytes_total = D * 4 * n + 2 * K * n * 4
if __name__ == "__main__":
    import sys
    modes = sys.argv[1:] or ["c3d", "c2d", "full2d"]
    for mode in modes:
        try:
            run, data, xin = build(mode)
            t = time_kernel(lambda v, d: run(v, d), (xin, data),
                            k_small=2, k_large=8,
                            runs=4).seconds_per_iteration
            print(f"{mode:8s}: {t*1e6:8.1f} us  "
                  f"{bytes_total/t/1e9:6.1f} GB/s  "
                  f"frac={bytes_total/819e9/t:.3f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{mode:8s}: FAILED {type(e).__name__}: {str(e)[:100]}",
                  flush=True)
