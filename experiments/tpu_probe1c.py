"""Probe 1c: calibrate the axon execution path.

- chained matmul (known speed-of-light ~100 TFLOP/s fp32->bf16 on v5e)
- per-call overhead: K=1 vs K=8 vs K=64 chained triads
- device-to-host transfer cost
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=3):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


# --- matmul chain ---
N = 4096
a = jnp.ones((N, N), jnp.bfloat16)
b = jnp.eye(N, dtype=jnp.bfloat16)

for K in (1, 8):
    @jax.jit
    def mm_chain(a, b, K=K):
        def body(i, x):
            return jnp.dot(x, b, preferred_element_type=jnp.bfloat16)
        return jax.lax.fori_loop(0, K, body, a)

    t = timed(mm_chain, a, b)
    tf = K * 2 * N**3 / t / 1e12
    print(f"matmul chain K={K}: {t*1e3:.2f} ms -> {tf:.1f} TFLOP/s")

# --- triad chains, smaller n ---
n = 1 << 24  # 16M fp32 = 64MB/array
x = jnp.ones(n, jnp.float32)
c = jnp.ones(n, jnp.float32)
for K in (1, 8, 64):
    @jax.jit
    def triad_chain(x, c, K=K):
        def body(i, v):
            return v + 2.0 * c
        return jax.lax.fori_loop(0, K, body, x)

    t = timed(triad_chain, x, c)
    bw = K * 3 * 4 * n / t / 1e9
    print(f"triad chain n=16M K={K}: {t*1e3:.2f} ms -> {bw:.1f} GB/s")

# --- transfer ---
t0 = time.perf_counter()
h = np.asarray(x)
print(f"D2H 64MB: {(time.perf_counter()-t0)*1e3:.1f} ms")

# --- single small op dispatch latency ---
s = jnp.ones((8, 128), jnp.float32)
f = jax.jit(lambda s: s + 1.0)
t = timed(f, s, reps=10)
print(f"tiny op dispatch: {t*1e6:.0f} us")
