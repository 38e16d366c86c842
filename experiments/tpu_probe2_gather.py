"""Probe 2: which gather forms Mosaic/Pallas supports on this TPU.

The crux of a Pallas SpMV (SURVEY.md section 7 "hard parts (i)"):
gathering x[j] inside a kernel.  Tries several lowerings.
"""

import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 2048          # x length
M, L = 8, 128     # one index tile


def run(name, make):
    try:
        out = make()
        ok = np.asarray(out)
        print(f"[OK]   {name}: out[0,:4]={ok[0,:4]}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")


x = jnp.arange(N, dtype=jnp.float32)
x2d = x.reshape(N // 128, 128)
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, N, (M, L)), jnp.int32)
expected = np.asarray(x)[np.asarray(idx)]


def check(out):
    np.testing.assert_allclose(np.asarray(out), expected)
    return out


# 1. jnp.take of a 1-D x with 2-D indices
def v1():
    def kernel(x_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0)

    return check(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, L), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx))


# 2. advanced indexing x_ref[idx]
def v2():
    def kernel(x_ref, idx_ref, out_ref):
        out_ref[:] = x_ref[:][idx_ref[:]]

    return check(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, L), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx))


# 3. take_along_axis within lanes: x broadcast (M, N), idx (M, L)
def v3():
    def kernel(x_ref, idx_ref, out_ref):
        xb = jnp.broadcast_to(x_ref[:].reshape(1, N), (M, N))
        out_ref[:] = jnp.take_along_axis(xb, idx_ref[:], axis=1)

    return check(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, L), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx))


# 4. row gather from 2-D x (sublane gather): take(x2d, row_idx, axis=0)
def v4():
    ridx = jnp.asarray(rng.integers(0, N // 128, (8,)), jnp.int32)

    def kernel(x_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x2d, ridx)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(x2d)[np.asarray(ridx)]
    )
    return out


# 5. loop of dynamic scalar loads (scalar gather via fori)
def v5():
    def kernel(x_ref, idx_ref, out_ref):
        def body(i, _):
            def inner(j, _):
                out_ref[i, j] = x_ref[idx_ref[i, j]]
                return 0
            return jax.lax.fori_loop(0, L, inner, 0)
        jax.lax.fori_loop(0, M, body, 0)

    return check(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, L), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx))


print("jax", jax.__version__, jax.devices())
for name, fn in [
    ("take(1d x, 2d idx)", v1),
    ("x[idx] advanced", v2),
    ("take_along_axis lanes", v3),
    ("row (sublane) gather", v4),
    ("scalar loop gather", v5),
]:
    run(name, fn)
