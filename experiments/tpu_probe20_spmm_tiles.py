"""Probe 20 (round 2): close the large-n SpMM gap (VERDICT #1).

Sweeps tile_rows and K for the production dia_spmm_core at 16.8M rows,
plus: (a) a per-k-plane x layout (k, total_rows, LANE) with one
contiguous window DMA per column plane (PLAN item 1's 'split the
window DMA' hypothesis), (b) bf16 diagonal storage (halves the
dominant data stream).
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
from spmv_tpu.ops.pallas_kernels import (
    dia_prepare_X,
    dia_spmm_core,
    make_plan,
)
from spmv_tpu.profile.harness import time_kernel

N = 4096
mm = poisson2d(N, N)
dia = DiaMatrix.from_matrix_market(mm)
n, D = dia.num_rows, dia.num_diagonals
A = DeviceDia.from_host(dia, dtype=jnp.float32)
Ab = DeviceDia.from_host(dia, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)


def bench_production(A_, K, TR, label):
    X = rng.standard_normal((n, K)).astype(np.float32)
    x3d = dia_prepare_X(A_, jnp.asarray(X), TR).astype(A_.data.dtype)

    def step(x3d, A_):
        return dia_spmm_core(A_, x3d, tile_rows=TR)

    try:
        t = time_kernel(step, (x3d, A_), k_small=2, k_large=8,
                        runs=4).seconds_per_iteration
    except Exception as e:  # noqa: BLE001
        print(f"{label:34s}: FAILED {type(e).__name__}: {str(e)[:90]}",
              flush=True)
        return
    by = D * 4 * n + 2 * K * n * 4
    print(f"{label:34s}: {t*1e6:8.1f} us  {by/t/1e9:6.1f} GB/s  "
          f"frac(819)={by/819e9/t:.3f}  {K*dia.num_entries/t/1e9:6.1f} Gnnz/s",
          flush=True)


# ---- per-k-plane layout variant -------------------------------------------

def build_plane_kernel(K, TR):
    plan = make_plan(A, TR)
    w, fb, nb, wr = (plan.tile_rows, plan.front_blocks, plan.num_tiles,
                     plan.window_rows)
    offsets = A.offsets

    def kernel(x_hbm, d_ref, y_ref, win, sems):
        j = pl.program_id(0)
        active = jnp.logical_and(j >= fb, j < fb + nb)

        def dma(slot, jj, kk):
            return pltpu.make_async_copy(
                x_hbm.at[kk, pl.ds(jj * w + plan.smin_row, wr)],
                win.at[slot, kk], sems.at[slot, kk])

        @pl.when(j == fb)
        def _():
            for kk in range(K):
                dma(fb % 2, fb, kk).start()

        @pl.when(jnp.logical_and(active, j + 1 < fb + nb))
        def _():
            for kk in range(K):
                dma((j + 1) % 2, j + 1, kk).start()

        @pl.when(active)
        def _():
            slot = j % 2
            for kk in range(K):
                dma(slot, j, kk).wait()
            lane = jax.lax.broadcasted_iota(jnp.int32, (K, w, LANE), 2)
            acc = jnp.zeros((K, w, LANE), jnp.float32)
            for kd, off in enumerate(offsets):
                s, t = divmod(off, LANE)
                lo = s - plan.smin_row
                if t == 0:
                    shifted = win[slot, :, pl.ds(lo, w)]
                else:
                    rows = win[slot, :, pl.ds(lo, w + 1)]
                    rolled = pltpu.roll(rows, LANE - t, axis=2)
                    shifted = jnp.where(
                        lane < LANE - t,
                        jax.lax.slice_in_dim(rolled, 0, w, axis=1),
                        jax.lax.slice_in_dim(rolled, 1, w + 1, axis=1),
                    )
                acc = acc + d_ref[kd][None, :, :] * shifted
            y_ref[:] = acc

        @pl.when(jnp.logical_not(active))
        def _():
            y_ref[:] = jnp.zeros((K, w, LANE), jnp.float32)

    d_, r0, _ = A.data.shape
    data = A.data
    nbw = plan.num_tiles * plan.tile_rows
    if nbw != r0:
        data = jnp.pad(data, ((0, 0), (0, nbw - r0), (0, 0)))

    @jax.jit
    def run(xk, data):
        return pl.pallas_call(
            kernel,
            grid=(plan.grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((d_, w, LANE),
                             lambda j: (0, jnp.clip(j - fb, 0, nb - 1), 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((K, w, LANE), lambda j: (0, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (K, plan.total_rows, LANE), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, K, wr, LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((2, K)),
            ],
        )(xk, data)

    return run, data, plan


def bench_planes(K, TR):
    try:
        run, data, plan = build_plane_kernel(K, TR)
        X = rng.standard_normal((n, K)).astype(np.float32)
        x3d = dia_prepare_X(A, jnp.asarray(X), TR)
        xk = jnp.asarray(np.ascontiguousarray(
            np.asarray(x3d).transpose(1, 0, 2)))

        def step(xk, data):
            return run(xk, data)

        t = time_kernel(step, (xk, data), k_small=2, k_large=8,
                        runs=4).seconds_per_iteration
    except Exception as e:  # noqa: BLE001
        print(f"planes K={K} TR={TR}: FAILED {type(e).__name__}: "
              f"{str(e)[:90]}", flush=True)
        return
    by = D * 4 * n + 2 * K * n * 4
    print(f"{'planes K=%d TR=%d' % (K, TR):34s}: {t*1e6:8.1f} us  "
          f"{by/t/1e9:6.1f} GB/s  frac(819)={by/819e9/t:.3f}",
          flush=True)


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"n={n} D={D} nnz={dia.num_entries}", flush=True)
    if which in ("all", "base"):
        bench_production(A, 4, 256, "prod f32 K=4 TR=256 (baseline)")
        bench_production(A, 4, 512, "prod f32 K=4 TR=512")
    if which in ("all", "new"):
        bench_production(Ab, 4, 256, "prod bf16 K=4 TR=256")
        bench_production(Ab, 4, 512, "prod bf16 K=4 TR=512")
        bench_planes(4, 512)
        bench_planes(4, 256)
