"""Probe 31c: does multi-stream reading beat the single-stream peak?

Probe 31b (long-chain, fetch-synced): single-stream read = 744 GB/s.
But the in-place DIA SpMV moves ~480 MB in 483 us = ~970 GB/s
aggregate, reading two HBM buffers concurrently (diagonal blockspec
stream + manual x-window DMAs).  If concurrent streams genuinely
aggregate past 819 GB/s (the v5e paper spec), the tunneled chip is
faster than its label and the machine model's roofline denominator
must come from measurement, not the spec sheet.

  read2 — two 512 MB buffers via two blockspec streams, summed
  read3 — three 512 MB buffers
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
M = 1 << 20          # 512 MB per buffer (f32)
BLK = 2048
GRID = M // BLK


def build_readN(nbuf):
    def kernel(*refs):
        xs, y_ref = refs[:-1], refs[-1]
        acc = jnp.zeros((1, LANE), jnp.float32)
        for x_ref in xs:
            acc = acc + jnp.sum(x_ref[:], axis=0, keepdims=True)
        y_ref[:] = acc * jnp.ones((8, LANE), jnp.float32)

    in_specs = [
        pl.BlockSpec((BLK, LANE), lambda j: (j, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(nbuf)
    ]
    out_spec = pl.BlockSpec((8, LANE), lambda j: (j, 0),
                            memory_space=pltpu.VMEM)

    def call(*xs):
        return pl.pallas_call(
            kernel, grid=(GRID,),
            in_specs=in_specs, out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((8 * GRID, LANE), jnp.float32),
        )(*xs)

    return call


def marginal(make_fn, args, k1=8, k2=48, runs=4):
    f1, f2 = make_fn(k1), make_fn(k2)
    for f in (f1, f2):
        float(f(*args))
    best = []
    for f in (f1, f2):
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        best.append(min(ts))
    return (best[1] - best[0]) / (k2 - k1), best


rng = np.random.default_rng(0)
bufs = [
    jnp.asarray(rng.standard_normal((M, LANE)).astype(np.float32))
    for _ in range(3)
]

for nbuf in (1, 2, 3):
    call = build_readN(nbuf)

    def mk(k, _call=call, _n=nbuf):
        @jax.jit
        def f(*xs):
            def body(_, v):
                out = _call(v, *xs[1:_n])
                return jax.lax.dynamic_update_slice(v, out * 0.5, (0, 0))
            return jnp.sum(jax.lax.fori_loop(0, k, body, xs[0])[0]) * 1e-12
        return f

    per, raw = marginal(mk, tuple(bufs[:nbuf]))
    nbytes = nbuf * M * LANE * 4
    print(f"read{nbuf}: {per*1e6:8.1f} us/iter  "
          f"{nbytes/per/1e9:7.1f} GB/s aggregate  "
          f"(chains {raw[0]*1e3:.1f} / {raw[1]*1e3:.1f} ms)", flush=True)
