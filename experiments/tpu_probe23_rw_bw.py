"""Probe 23: separate HBM read vs write bandwidth on this chip.

read_only  — stream 512 MB in via blockspec, write one (8,128) block/step
write_only — write 512 MB out via blockspec, read one (8,128) block/step
rw_copy    — read+write 512 MB each (the probe-21 copy)
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.profile.harness import time_kernel

LANE = 128
M = 1 << 20          # rows of 128 f32 = 512 MB
BLK = 2048


def build(mode):
    grid = M // BLK

    if mode == "read_only":
        def kernel(x_ref, y_ref):
            # touch the whole block, emit one tile
            y_ref[:] = jnp.sum(x_ref[:], axis=0, keepdims=True
                               ) * jnp.ones((8, LANE), jnp.float32)
        in_spec = pl.BlockSpec((BLK, LANE), lambda j: (j, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((8, LANE), lambda j: (j, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((8 * grid, LANE), jnp.float32)
        by = M * LANE * 4
    elif mode == "write_only":
        def kernel(x_ref, y_ref):
            y_ref[:] = jnp.broadcast_to(x_ref[:1], (BLK, LANE)) * 2.0
        in_spec = pl.BlockSpec((8, LANE), lambda j: (j, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((BLK, LANE), lambda j: (j, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((M, LANE), jnp.float32)
        by = M * LANE * 4
    else:  # rw_copy
        def kernel(x_ref, y_ref):
            y_ref[:] = x_ref[:] * 2.0
        in_spec = pl.BlockSpec((BLK, LANE), lambda j: (j, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((BLK, LANE), lambda j: (j, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((M, LANE), jnp.float32)
        by = 2 * M * LANE * 4

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[in_spec], out_specs=out_spec,
            out_shape=out_shape,
        )(x)

    if mode == "write_only":
        x = jnp.zeros((8 * grid, LANE), jnp.float32)
    else:
        x = jnp.zeros((M, LANE), jnp.float32)
    return run, x, by


if __name__ == "__main__":
    import jax.lax as lax

    for mode in ("read_only", "write_only", "rw_copy"):
        run, x, by = build(mode)

        if mode == "read_only":
            def step(v, _run=run):
                out = _run(v)
                # cheap dependency: fold the small output back in
                return lax.dynamic_update_slice(v, out * 0.5, (0, 0))
        elif mode == "write_only":
            def step(v, _run=run):
                out = _run(v)
                return out[: v.shape[0]] * 0.5
        else:
            def step(v, _run=run):
                return _run(v)

        try:
            t = time_kernel(step, (x,), k_small=2,
                            k_large=8, runs=4).seconds_per_iteration
            print(f"{mode:10s}: {t*1e6:8.1f} us  {by/t/1e9:6.1f} GB/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{mode:10s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:90]}", flush=True)
