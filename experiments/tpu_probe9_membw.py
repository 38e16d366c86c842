"""Probe 9: ground-truth HBM bandwidth via pure streaming ops.

Validates the timing harness: if a plain copy/triad reports > spec
bandwidth, the harness (chained-K slope) is broken; if it reports a
plausible fraction of 819 GB/s, the DIA kernel numbers are real.
"""

import numpy as np
import jax
import jax.numpy as jnp

from spmv_tpu.profile.harness import time_kernel

for mb in (64, 256, 512):
    n = mb * 1024 * 1024 // 4
    x = jnp.ones((n,), jnp.float32)
    q = jnp.float32(1.0000001)

    def step(x):
        return x * q  # read n*4 + write n*4 bytes

    t = time_kernel(step, (x,), k_small=4, k_large=20, runs=3).seconds_per_iteration
    bw = 2 * n * 4 / t / 1e9
    print(f"scale {mb:4d} MB: {t*1e6:8.1f} us  {bw:7.1f} GB/s")

# triad: a = b + q*c, 3 arrays touched
n = 128 * 1024 * 1024 // 4
b = jnp.ones((n,), jnp.float32)
c = jnp.ones((n,), jnp.float32)

def striad(b, c):
    return b + jnp.float32(3.0) * c

t = time_kernel(striad, (b, c), k_small=4, k_large=20, runs=3).seconds_per_iteration
print(f"triad 3x128 MB: {t*1e6:8.1f} us  {3*n*4/t/1e9:7.1f} GB/s")
