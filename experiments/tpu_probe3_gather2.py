"""Probe 3: pin down the supported Mosaic gather forms."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 2048
S, LANES = N // 128, 128
M, L = 8, 128

x = jnp.arange(N, dtype=jnp.float32)
x2d = x.reshape(S, LANES)
rng = np.random.default_rng(0)
flat = rng.integers(0, N, (M, L))
q = jnp.asarray(flat // 128, jnp.int32)   # sublane coord
r = jnp.asarray(flat % 128, jnp.int32)    # lane coord


def pcall(kernel, n_in):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def vA():
    def kernel(x_ref, q_ref, r_ref, out_ref):
        out_ref[:] = x_ref[:][q_ref[:], r_ref[:]]
    out = pcall(kernel, 3)(x2d, q, r)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x)[flat])


def vB():
    def kernel(x_ref, q_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(x_ref[:], q_ref[:], axis=0)
    out = pcall(kernel, 2)(x2d, q)
    want = np.asarray(x2d)[np.asarray(q), np.arange(128)[None, :]]
    np.testing.assert_allclose(np.asarray(out), want)


def vC():
    src = jnp.asarray(rng.standard_normal((M, 128)), jnp.float32)
    sidx = jnp.asarray(rng.integers(0, 128, (M, 128)), jnp.int32)

    def kernel(s_ref, i_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=1)

    out = pcall(kernel, 2)(src, sidx)
    want = np.take_along_axis(np.asarray(src), np.asarray(sidx), axis=1)
    np.testing.assert_allclose(np.asarray(out), want)


def vD():
    def kernel(x_ref, q_ref, r_ref, out_ref):
        a = jnp.take_along_axis(x_ref[:], q_ref[:], axis=0)   # (M,128)
        out_ref[:] = jnp.take_along_axis(a, r_ref[:], axis=1)

    out = pcall(kernel, 3)(x2d, q, r)
    a = np.asarray(x2d)[np.asarray(q), np.arange(128)[None, :]]
    want = np.take_along_axis(a, np.asarray(r), axis=1)
    np.testing.assert_allclose(np.asarray(out), want)


def vE():
    # big sublane gather: x2d (4096, 128) -> (256, 128) tile
    big = jnp.arange(4096 * 128, dtype=jnp.float32).reshape(4096, 128)
    bidx = jnp.asarray(rng.integers(0, 4096, (256, 128)), jnp.int32)

    def kernel(x_ref, i_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(big, bidx)
    want = np.asarray(big)[np.asarray(bidx), np.arange(128)[None, :]]
    np.testing.assert_allclose(np.asarray(out), want)


print("jax", jax.__version__, jax.devices())
for name, fn in [
    ("A x2d[q,r] full 2D", vA),
    ("B take_along_axis axis=0 (sublane)", vB),
    ("C take_along_axis axis=1 (lane shuffle)", vC),
    ("D composed axis0 then axis1", vD),
    ("E big sublane gather 4096->256", vE),
]:
    try:
        fn()
        print(f"[OK]   {name}")
    except AssertionError:
        print(f"[WRONG] {name}: compiled but wrong values")
    except Exception as e:
        msg = str(e).split("\n")[0][:180]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
