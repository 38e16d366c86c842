"""Probe 21: does the (rows, K, LANE) layout halve streaming bandwidth?

Pure copy kernels (read block + write block, no compute) over the same
512 MB in different shapes, plus device memory-stats deltas to detect
physical padding of the K=4 sublane dimension.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.profile.harness import time_kernel

LANE = 128
TOTAL = 1 << 27  # 128M f32 = 512 MB


def stream_bench(shape, block, label):
    n_elem = int(np.prod(shape))
    assert n_elem == TOTAL, (shape, n_elem)
    grid = shape[0] // block[0]

    def kernel(x_ref, y_ref):
        y_ref[:] = x_ref[:] * 2.0

    ndim = len(shape)

    def imap(j):
        return (j,) + (0,) * (ndim - 1)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec(block, imap,
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(block, imap,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        )(x)

    x = jnp.zeros(shape, jnp.float32)
    try:
        t = time_kernel(lambda v: run(v), (x,), k_small=2, k_large=8,
                        runs=4).seconds_per_iteration
    except Exception as e:  # noqa: BLE001
        print(f"{label:28s}: FAILED {type(e).__name__}: {str(e)[:80]}",
              flush=True)
        return
    by = 2 * TOTAL * 4
    print(f"{label:28s}: {t*1e6:8.1f} us  {by/t/1e9:6.1f} GB/s "
          f"(r+w)", flush=True)


def memory_footprint(shape):
    dev = jax.devices()[0]
    try:
        before = dev.memory_stats()["bytes_in_use"]
        x = jax.device_put(np.zeros(shape, np.float32))
        x.block_until_ready()
        after = dev.memory_stats()["bytes_in_use"]
        del x
        return after - before
    except Exception as e:  # noqa: BLE001
        return f"n/a ({type(e).__name__})"


if __name__ == "__main__":
    M = TOTAL // LANE           # 1M rows of 128 lanes
    print("memory footprints (logical 512 MB):", flush=True)
    for shape in ((M, LANE), (M // 4, 4, LANE), (M // 8, 8, LANE),
                  (M // 4, 4 * LANE)):
        print(f"  {str(shape):22s}: {memory_footprint(shape)}",
              flush=True)

    stream_bench((M, LANE), (2048, LANE), "2d (M,128) blk2048")
    stream_bench((M // 4, 4, LANE), (512, 4, LANE),
                 "3d (M/4,4,128) blk512")
    stream_bench((M // 8, 8, LANE), (256, 8, LANE),
                 "3d (M/8,8,128) blk256")
    stream_bench((M // 4, 4 * LANE), (512, 4 * LANE),
                 "2d (M/4,512) blk512")
