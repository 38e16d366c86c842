"""Probe 49: bf16 DIA — is the cast-up the 0.74-of-roofline gap?

Round-2: bf16 DIA at 291 us vs f32 450 us (1.53x; the stream model
predicts ~2x).  PLAN item 3 blames the post-load cast-up (bf16
(16,128) vreg packing -> 2x f32 relayout per operand).

Ablations on the production kernel path (4096^2 poisson, chained
in-place timing exactly like bench.py):
  A. production bf16 (cast-up to f32 accumulate)   [baseline ~291]
  B. one whole-window cast per tile instead of one cast per
     overlapping diagonal slice (5x (256,128) converts -> 1.25x),
     f32 rolls/selects/FMA after — a directly productionizable
     variant if it wins.
  C. f32 reference                                  [~450]
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import DiaMatrix
from spmv_tpu.models.device import DeviceDia, LANE
from spmv_tpu.ops import pallas_kernels as PK
from spmv_tpu.ops.pallas_kernels import (
    dia_prepare_x, dia_spmv_core, make_plan, _dia_window_schedule)
from spmv_tpu.profile.harness import time_kernel

TILE = 256


def report(tag, t, nnz):
    print(f"{tag:44s} {t*1e6:9.1f} us  {nnz/t/1e9:7.2f} Gnnz/s",
          flush=True)


def _dia_kernel_nocast(x_hbm, d_ref, y_ref, win, sems, wf_ref, *,
                       offsets, plan, dtype, in_place=False):
    w = plan.tile_rows
    fb, nb, wr = plan.front_blocks, plan.num_tiles, plan.window_rows
    j = pl.program_id(0)
    active = jnp.logical_and(j >= fb, j < fb + nb)

    def window_dma(slot, jj):
        start = jj * w + plan.smin_row
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, wr), :], win.at[slot],
            sems.at[slot])

    slot = _dia_window_schedule(j, active, fb, nb, window_dma,
                                in_place)

    @pl.when(active)
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, (w, LANE), 1)
        # ONE cast of the whole window per tile, instead of one per
        # overlapping diagonal slice (5x (w,128) converts -> 1.25x);
        # staged through an f32 scratch so slices stay ref-based
        wf_ref[:] = win[slot].astype(jnp.float32)
        acc = jnp.zeros((w, LANE), dtype=jnp.float32)
        for k, off in enumerate(offsets):
            s, t = divmod(off, LANE)
            lo = s - plan.smin_row
            if t == 0:
                shifted = wf_ref[pl.ds(lo, w), :]
            else:
                rows = wf_ref[pl.ds(lo, w + 1), :]
                rolled = pltpu.roll(rows, LANE - t, axis=1)
                shifted = jnp.where(
                    lane < LANE - t,
                    jax.lax.slice_in_dim(rolled, 0, w, axis=0),
                    jax.lax.slice_in_dim(rolled, 1, w + 1, axis=0))
            acc = acc + d_ref[k].astype(jnp.float32) * shifted
        y_ref[:] = acc.astype(dtype)

    @pl.when(jnp.logical_not(active))
    def _():
        y_ref[:] = jnp.zeros((w, LANE), dtype=dtype)


def core_nocast(A, x2d, tile_rows):
    plan = make_plan(A, tile_rows)
    w = plan.tile_rows
    d, r0, _ = A.data.shape
    nbw = plan.num_tiles * w
    data = A.data
    if nbw != r0:
        data = jnp.pad(data, ((0, 0), (0, nbw - r0), (0, 0)))
    kernel = functools.partial(
        _dia_kernel_nocast, offsets=A.offsets, plan=plan,
        dtype=data.dtype, in_place=True)
    fb, nb = plan.front_blocks, plan.num_tiles
    return pl.pallas_call(
        kernel,
        grid=(plan.grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((d, w, LANE),
                         lambda j: (0, jnp.clip(j - fb, 0, nb - 1), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((w, LANE), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((plan.total_rows, LANE),
                                       data.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, plan.window_rows, LANE), data.dtype),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.VMEM((plan.window_rows, LANE), jnp.float32),
        ],
        input_output_aliases={0: 0},
    )(x2d.astype(data.dtype), data)


def main():
    mm = poisson2d(4096, 4096)
    dia = DiaMatrix.from_matrix_market(mm)
    n, nnz = dia.num_rows, dia.num_entries
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)

    A32 = DeviceDia.from_host(dia, dtype=jnp.float32)
    x32 = dia_prepare_x(A32, jnp.asarray(x), TILE)
    t32 = time_kernel(lambda xv, A: dia_spmv_core(A, xv,
                                                  tile_rows=TILE),
                      (x32, A32), k_small=8, k_large=136,
                      runs=6).seconds_per_iteration
    report("C. f32 production", t32, nnz)

    Ab = DeviceDia.from_host(dia, dtype=jnp.bfloat16)
    xb = dia_prepare_x(Ab, jnp.asarray(x).astype(jnp.bfloat16), TILE)
    tb = time_kernel(lambda xv, A: dia_spmv_core(A, xv,
                                                 tile_rows=TILE),
                     (xb, Ab), k_small=8, k_large=136,
                     runs=6).seconds_per_iteration
    report("A. bf16 production (cast-up)", tb, nnz)

    try:
        tn = time_kernel(lambda xv, A: core_nocast(A, xv, TILE),
                         (xb, Ab), k_small=8, k_large=136,
                         runs=6).seconds_per_iteration
        report("B. bf16 single window cast", tn, nnz)
    except Exception as e:
        print(f"B failed: {type(e).__name__}: {str(e)[:200]}")

    print(f"speedup A vs C: {t32/tb:.2f}; B vs C: "
          f"{t32/tn:.2f}" if 'tn' in dir() else "")


if __name__ == "__main__":
    main()
