"""Probe 4: deduce actual semantics of the compiled-but-wrong gathers."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, LANES = 8, 128
x2d = jnp.arange(S * LANES, dtype=jnp.float32).reshape(S, LANES)
xnp = np.asarray(x2d)

rng = np.random.default_rng(1)
qnp = rng.integers(0, S, (S, LANES))
q = jnp.asarray(qnp, jnp.int32)


def pcall(kernel, out_shape, *args):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*args)


def kernel_b(x_ref, q_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(x_ref[:], q_ref[:], axis=0)


out = pcall(kernel_b, jax.ShapeDtypeStruct((S, LANES), jnp.float32), x2d, q)
out = np.asarray(out)

want_gather0 = xnp[qnp, np.arange(LANES)[None, :]]     # expected
want_transpose = xnp[qnp.T, np.arange(LANES)[None, :]]  # idx transposed?
alt_scatter = None

print("match expected axis0:", np.array_equal(out, want_gather0))
print("match idx-transposed:", np.array_equal(out, want_transpose))

# Where does out[i, l] come from?  out = x2d[f(i,l), g(i,l)] — recover f, g.
f = (out // LANES).astype(int)
g = (out % LANES).astype(int)
print("g == lane broadcast:", np.array_equal(g, np.tile(np.arange(LANES), (S, 1))))
# How does f relate to q?
print("f == q:", np.array_equal(f, qnp))
print("f == q.T:", np.array_equal(f, qnp.T))
# maybe f[i,l] == q[l? ...] sample a few
print("sample (i,l,q,f):")
for i, l in [(0, 0), (0, 1), (1, 0), (2, 5), (7, 127)]:
    print(" ", i, l, qnp[i, l], f[i, l], g[i, l])
