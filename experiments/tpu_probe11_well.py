"""Probe 11: primitives for the windowed-ELL (shuffle-gather) kernel.

a) take_along_axis axis=1 from a broadcast (8,128) table — per-lane
   arbitrary pick within a 128-wide window.
b) dynamic window slice of a VMEM x2d by a scalar-prefetched per-tile
   row start (PrefetchScalarGridSpec).
c) out-block accumulation across consecutive grid steps mapping to the
   same output block (index_map driven by a prefetched array).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)


def check(name, got, want, atol=1e-6):
    ok = np.allclose(got, want, atol=atol)
    print(("[OK]  " if ok else "[BAD] ") + name,
          "" if ok else f"maxerr={np.abs(np.asarray(got)-want).max()}")


# --- a) broadcast-table lane shuffle ---------------------------------
table = jnp.asarray(rng.standard_normal((1, 128)), jnp.float32)
idx = jnp.asarray(rng.integers(0, 128, (8, 128)), jnp.int32)

def k_a(t_ref, i_ref, o_ref):
    bt = jnp.broadcast_to(t_ref[0:1, :], (8, 128))
    o_ref[:] = jnp.take_along_axis(bt, i_ref[:], axis=1)

out = pl.pallas_call(
    k_a,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(table, idx)
check("a broadcast-table shuffle", out, np.asarray(table)[0][np.asarray(idx)])

# --- b) dynamic window slice by prefetched scalar --------------------
X = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
starts = jnp.asarray([0, 8, 24, 48], jnp.int32)   # per-tile window row

def k_b(s_ref, x_ref, o_ref):
    t = pl.program_id(0)
    w = x_ref[pl.ds(s_ref[t], 8), :]
    o_ref[:] = w * 2.0

out = pl.pallas_call(
    k_b,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda t, s: (t, 0),
                               memory_space=pltpu.VMEM),
    ),
    out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
)(starts, X)
want = np.concatenate([np.asarray(X)[s:s+8] * 2 for s in [0, 8, 24, 48]])
check("b prefetched dynamic window", out, want)

# --- c) out-block accumulation over revisited blocks -----------------
# 6 grid steps -> 3 output blocks via prefetch map [0,0,1,1,2,2]
vals = jnp.asarray(rng.standard_normal((6, 8, 128)), jnp.float32)
omap = jnp.asarray([0, 0, 1, 1, 2, 2], jnp.int32)

def k_c(m_ref, v_ref, o_ref):
    t = pl.program_id(0)
    first = jnp.logical_or(t == 0, m_ref[t] != m_ref[jnp.maximum(t - 1, 0)])

    @pl.when(first)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += v_ref[0]

out = pl.pallas_call(
    k_c,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(6,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda t, m: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda t, m: (m[t], 0),
                               memory_space=pltpu.VMEM),
    ),
    out_shape=jax.ShapeDtypeStruct((24, 128), jnp.float32),
)(omap, vals)
v = np.asarray(vals)
want = np.concatenate([v[0] + v[1], v[2] + v[3], v[4] + v[5]])
check("c revisited-block accumulation", out, want)

# --- combined: minimal windowed-ELL SpMV tile ------------------------
# y[r] = sum_s val[r,s] * x[wstart*128 + loc[r,s]], loc in [0, 256)
n = 64 * 128
x = rng.standard_normal(n).astype(np.float32)
x2d = jnp.asarray(x.reshape(64, 128))
val = rng.standard_normal((8, 128)).astype(np.float32)
wstart = 16
loc = rng.integers(0, 256, (8, 128)).astype(np.int32)

def k_d(s_ref, x_ref, v_ref, l_ref, o_ref):
    w0 = s_ref[0]
    acc = jnp.zeros((8, 128), jnp.float32)
    lrow = l_ref[:] >> 7
    llane = l_ref[:] & 127
    for m in range(2):
        bt = jnp.broadcast_to(x_ref[pl.ds(w0 + m, 1), :], (8, 128))
        g = jnp.take_along_axis(bt, llane, axis=1)
        acc += jnp.where(lrow == m, v_ref[:] * g, 0.0)
    o_ref[:] = jnp.sum(acc, axis=1, keepdims=True) * jnp.ones((8, 128))

out = pl.pallas_call(
    k_d,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((8, 128), lambda t, s: (0, 0),
                               memory_space=pltpu.VMEM),
    ),
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
)(jnp.asarray([wstart], jnp.int32), x2d, jnp.asarray(val), jnp.asarray(loc))
want_y = (val * x[wstart * 128 + loc]).sum(axis=1)
check("d windowed-ELL tile", np.asarray(out)[:, 0], want_y, atol=1e-4)
