"""Probe 31b: re-measure HBM bandwidth with long-chain marginals.

Probe 23/24 (the round-1 "mixing law": 672 read / 325 cross-buffer rw /
640 in-place) timed with time_kernel at K=2 vs 8 — probe 30 showed that
regime is corrupted by ~30 ms of tunnel dispatch-overhead variance.
This probe reruns the same opaque Pallas streaming kernels (XLA cannot
DCE or hoist them — probe 31's pure-XLA bodies were all eliminated)
with the marginal of two LONG fori chains, where per-chain device time
dominates overhead.

Patterns: read-only, write-only, copy (cross-buffer), copy in-place
(input_output_aliases same buffer).
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
M = 1 << 20          # rows of 128 f32 = 512 MB
BLK = 2048
GRID = M // BLK


def _read_kernel(x_ref, y_ref):
    y_ref[:] = jnp.sum(x_ref[:], axis=0, keepdims=True
                       ) * jnp.ones((8, LANE), jnp.float32)


def _write_kernel(x_ref, y_ref):
    y_ref[:] = jnp.broadcast_to(x_ref[:1], (BLK, LANE)) * 2.0


def _copy_kernel(x_ref, y_ref):
    y_ref[:] = x_ref[:] * 2.0


def pallas_read(x):
    return pl.pallas_call(
        _read_kernel, grid=(GRID,),
        in_specs=[pl.BlockSpec((BLK, LANE), lambda j: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, LANE), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8 * GRID, LANE), jnp.float32),
    )(x)


def pallas_write(small):
    return pl.pallas_call(
        _write_kernel, grid=(GRID,),
        in_specs=[pl.BlockSpec((8, LANE), lambda j: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLK, LANE), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, LANE), jnp.float32),
    )(small)


def pallas_copy(x, in_place):
    return pl.pallas_call(
        _copy_kernel, grid=(GRID,),
        in_specs=[pl.BlockSpec((BLK, LANE), lambda j: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLK, LANE), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, LANE), jnp.float32),
        input_output_aliases={0: 0} if in_place else {},
    )(x)


def marginal(make_fn, args, k1=16, k2=96, runs=4):
    # NB: block_until_ready does NOT block on the tunneled backend —
    # only fetching a value to host synchronizes.  Always float().
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


def report(name, per_iter, nbytes, raw):
    print(f"{name:12s}: {per_iter*1e6:8.1f} us/iter  "
          f"{nbytes/per_iter/1e9:7.1f} GB/s   "
          f"(chain totals {raw[0]*1e3:.1f} / {raw[1]*1e3:.1f} ms)",
          flush=True)


x0 = jnp.asarray(
    np.random.default_rng(0).standard_normal((M, LANE)).astype(np.float32))
small0 = jnp.zeros((8 * GRID, LANE), jnp.float32)


def mk_read(k):
    @jax.jit
    def f(v):
        def body(_, v):
            out = pallas_read(v)
            return jax.lax.dynamic_update_slice(v, out * 0.5, (0, 0))
        return jnp.sum(jax.lax.fori_loop(0, k, body, v)[0]) * 1e-12
    return f


def mk_write(k):
    @jax.jit
    def f(s):
        def body(_, s):
            out = pallas_write(s)
            return out[: s.shape[0]] * 0.5
        return jnp.sum(jax.lax.fori_loop(0, k, body, s)[0]) * 1e-12
    return f


def mk_copy(k, in_place):
    @jax.jit
    def f(v):
        def body(_, v):
            return pallas_copy(v, in_place)
        return jnp.sum(jax.lax.fori_loop(0, k, body, v)[0]) * 1e-12
    return f


per, raw = marginal(mk_read, (x0,))
report("read", per, M * LANE * 4, raw)
per, raw = marginal(mk_write, (small0,))
report("write", per, M * LANE * 4, raw)
per, raw = marginal(functools.partial(mk_copy, in_place=False), (x0,))
report("copy_xbuf", per, 2 * M * LANE * 4, raw)
per, raw = marginal(functools.partial(mk_copy, in_place=True), (x0,))
report("copy_inplace", per, 2 * M * LANE * 4, raw)
