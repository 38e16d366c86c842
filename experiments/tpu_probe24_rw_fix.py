"""Probe 24: why does a Pallas r+w copy run at ~315 GB/s aggregate when
an XLA fused copy sustains ~640 GB/s (probe 9) and one-directional
Pallas streams hit ~670 GB/s (probe 23)?

Variants, all moving 512 MB in + 512 MB out:

  base1m     — blockspec copy, 1 MB blocks (probe-21 baseline repeat)
  base4m     — blockspec copy, 4 MB blocks (fewer, larger transfers)
  arb        — 1 MB blocks + dimension_semantics=("arbitrary",)
  cond       — 1 MB blocks, y written under an opaque pl.when
               (detects conditional-write fetch-on-write penalty)
  manual4    — fully manual in+out DMA relay, 4 slots, prefetch depth 2
  xla2d      — XLA x*2 on the same (M,128) array (layout control)

Run serially on the chip; direct chained timing (these are ms-scale).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.profile.harness import time_kernel

LANE = 128
M = 1 << 20          # rows of 128 f32 = 512 MB


def timeit(step, x):
    return time_kernel(step, (x,), k_small=2, k_large=8,
                       runs=4).seconds_per_iteration


def alias_copy(blk_rows=2048):
    """Blockspec copy whose output aliases the (donated) input buffer."""
    grid = M // blk_rows

    def kernel(x_ref, y_ref):
        y_ref[:] = x_ref[:] * 2.0

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[pl.BlockSpec((blk_rows, LANE), lambda j: (j, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((blk_rows, LANE), lambda j: (j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, LANE), jnp.float32),
            input_output_aliases={0: 0},
        )(x)

    return run


def alias_offset_copy(blk_rows=2048, off_blocks=2):
    """In-place streaming shift: block j of the output (aliased onto the
    input buffer) is computed from input block j+off_blocks.  Reads and
    writes hit the SAME buffer but DIFFERENT regions — the SpMM
    window/y overlap pattern."""
    grid = M // blk_rows - off_blocks

    def kernel(x_ref, y_ref):
        y_ref[:] = x_ref[:] * 2.0

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[pl.BlockSpec((blk_rows, LANE),
                                   lambda j: (j + off_blocks, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((blk_rows, LANE), lambda j: (j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, LANE), jnp.float32),
            input_output_aliases={0: 0},
        )(x)

    return run


def xla_roll():
    """XLA copy that cannot be done in place (overlapping shift):
    forces a distinct-buffer read+write stream pair inside the chain."""

    @jax.jit
    def run(x):
        return jnp.roll(x, 1, axis=0)

    return run


def blockspec_copy(blk_rows, arbitrary=False, cond=False):
    grid = M // blk_rows

    def kernel(x_ref, y_ref):
        if cond:
            @pl.when(pl.program_id(0) < grid)
            def _():
                y_ref[:] = x_ref[:] * 2.0
        else:
            y_ref[:] = x_ref[:] * 2.0

    params = {}
    if arbitrary:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[pl.BlockSpec((blk_rows, LANE), lambda j: (j, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((blk_rows, LANE), lambda j: (j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, LANE), jnp.float32),
            **params,
        )(x)

    return run


def manual_copy(n_slots=4, depth=2, blk_rows=2048):
    """Pure DMA relay HBM->VMEM->HBM with n_slots rotating buffers.

    Schedule at step j (slot(b) = b % n_slots):
      wait in(j); start out(j)
      if j+depth < grid: wait out(j+depth-n_slots) [if >=0];
                         start in(j+depth)
    Prologue starts in(0..depth-1); epilogue drains the last
    n_slots-depth outs.  depth < n_slots so a slot's out has
    n_slots-depth steps to drain before its buffer is refilled.
    """
    grid = M // blk_rows
    assert depth < n_slots

    def kernel(x_hbm, y_hbm, buf, insem, outsem):
        j = pl.program_id(0)

        def in_dma(b):
            s = jax.lax.rem(b, n_slots)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(b * blk_rows, blk_rows)],
                buf.at[s], insem.at[s])

        def out_dma(b):
            s = jax.lax.rem(b, n_slots)
            return pltpu.make_async_copy(
                buf.at[s],
                y_hbm.at[pl.ds(b * blk_rows, blk_rows)],
                outsem.at[s])

        @pl.when(j == 0)
        def _():
            for b in range(depth):
                in_dma(jnp.int32(b)).start()

        in_dma(j).wait()
        out_dma(j).start()

        nxt = j + depth
        @pl.when(nxt < grid)
        def _():
            @pl.when(nxt - n_slots >= 0)
            def _():
                out_dma(nxt - n_slots).wait()
            in_dma(nxt).start()

        # Outs b are recycle-waited at j = b + n_slots - depth, but only
        # when that step's nxt < grid — the last n_slots outs are never
        # recycle-waited and must drain here.
        @pl.when(j == grid - 1)
        def _():
            for back in range(n_slots):
                out_dma(j - jnp.int32(back)).wait()

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((M, LANE), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((n_slots, blk_rows, LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((n_slots,)),
                pltpu.SemaphoreType.DMA((n_slots,)),
            ],
        )(x)

    return run


def xla_copy():
    q = jnp.float32(1.0000001)

    @jax.jit
    def run(x):
        return x * q

    return run


if __name__ == "__main__":
    x = jnp.ones((M, LANE), jnp.float32)
    by = 2 * M * LANE * 4

    import sys
    only = set(sys.argv[1:])
    cases = [
        ("base1m", blockspec_copy(2048)),
        ("base4m", blockspec_copy(8192)),
        ("arb", blockspec_copy(2048, arbitrary=True)),
        ("cond", blockspec_copy(2048, cond=True)),
        ("manual4", manual_copy(4, 2, 2048)),
        ("manual8", manual_copy(8, 4, 2048)),
        ("alias", alias_copy(2048)),
        ("aliasoff", alias_offset_copy(2048, 2)),
        ("xla2d", xla_copy()),
        ("xlaroll", xla_roll()),
    ]
    if only:
        cases = [c for c in cases if c[0] in only]

    # correctness gate for the manual relay (pure copy: y must equal x)
    if any(n.startswith("manual") for n, _ in cases):
        r = manual_copy(4, 2, 2048)
        err = float(jnp.max(jnp.abs(r(x) - x)))
        print(f"manual relay max |y-x| = {err}", flush=True)
    # correctness gate for alias: the *2.0 must actually land in HBM
    if any(n.startswith("alias") for n, _ in cases):
        s = float(jnp.sum(alias_copy(2048)(x)))
        print(f"alias sum = {s} (expect {2.0 * M * LANE})", flush=True)
    for name, run in cases:
        try:
            t = timeit(run, x)
            print(f"{name:8s}: {t*1e6:8.1f} us  {by/t/1e9:6.1f} GB/s"
                  f" aggregate", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:8s}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
