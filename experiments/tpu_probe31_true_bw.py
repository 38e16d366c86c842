"""Probe 31: the chip's true HBM bandwidth, hoist-proof + long chains.

Probe 30 showed (a) the chained-slope harness at small K is corrupted
by ~30 ms dispatch-overhead variance through the tunnel, and (b) the
honest long-chain marginal for the in-place DIA SpMV implies ~970 GB/s
aggregate — above the v5e paper spec (819) and way above the round-1
probe-23/24 numbers (672 read-only, 325 cross-buffer).  Those earlier
numbers are now suspect.

Here every pattern is timed as the marginal between two LONG fori
chains (device time only, overhead cancels at worst once), and every
loop body depends on the carry so XLA cannot hoist the traffic out of
the loop:

  read   : s <- sum(a + s)        (reads a fully each iter)
  rw_same: v <- v + 1             (donated carry, in-place r+w)
  copy   : v <- a + v[0,0]        (reads a fully, writes v fully)
  write  : v <- broadcast(f(v[0,0]))  (writes v fully, reads 1 elem)
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

GB = 1024**3
NBYTES = 512 * 1024 * 1024          # 512 MB per buffer
SHAPE = (NBYTES // 4 // 128, 128)   # f32

a = jnp.asarray(
    np.random.default_rng(0).standard_normal(SHAPE).astype(np.float32))
v0 = jnp.zeros(SHAPE, dtype=jnp.float32)


def marginal(make_fn, args, k1=8, k2=40, runs=4):
    f1, f2 = make_fn(k1), make_fn(k2)
    for f in (f1, f2):
        jax.block_until_ready(f(*args))
    t = []
    for f in (f1, f2):
        best = min(
            _wall(f, args) for _ in range(runs)
        )
        t.append(best)
    return (t[1] - t[0]) / (k2 - k1)


def _wall(f, args):
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    return time.perf_counter() - t0


def report(name, per_iter, nbytes):
    print(f"{name:10s}: {per_iter*1e6:8.1f} us/iter  "
          f"{nbytes/per_iter/1e9:7.1f} GB/s", flush=True)


# read-only: s = sum(a + s) — depends on carry, full read each iter
def mk_read(k):
    @jax.jit
    def f(a):
        def body(_, s):
            return jnp.sum(a + s) * 1e-12
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))
    return f

report("read", marginal(mk_read, (a,)), NBYTES)

# r+w same buffer: v = v + 1 (carry donated in the loop)
def mk_rw(k):
    @jax.jit
    def f(v):
        def body(_, v):
            return v + 1.0
        return jnp.sum(jax.lax.fori_loop(0, k, body, v)) * 1e-12
    return f

report("rw_same", marginal(mk_rw, (v0,)), 2 * NBYTES)

# copy cross-buffer: v = a + v[0,0] (reads a, writes v, tiny feedback)
def mk_copy(k):
    @jax.jit
    def f(a, v):
        def body(_, v):
            return a + v[0, 0]
        return jnp.sum(jax.lax.fori_loop(0, k, body, v)) * 1e-12
    return f

report("copy_x", marginal(mk_copy, (a, v0)), 2 * NBYTES)

# write-only: v = broadcast(g(v[0,0])) — writes all, reads 1 element
def mk_write(k):
    @jax.jit
    def f(v):
        def body(_, v):
            return jnp.full(SHAPE, v[0, 0] + 1.0, dtype=jnp.float32)
        return jnp.sum(jax.lax.fori_loop(0, k, body, v)) * 1e-12
    return f

report("write", marginal(mk_write, (v0,)), NBYTES)
