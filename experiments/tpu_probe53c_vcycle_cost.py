"""Probe 53c: where does the block V-cycle's time go?

Probe 53b measured ~9 ms per AMG-PCG iteration at 1M rows (sl=0,
all-DIA) where the plain-CG iteration costs 25 us.  Times each piece
in isolation with the chained-slope method (profile/harness rules:
fetch-to-host sync, >=60 ms of signal).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models.dia import DiaMatrix
from spmv_tpu.ops.amg import (
    block_aggregation_setup,
    block_amg_device,
    block_vcycle,
)
from spmv_tpu.ops.spmv import spmv

print("device:", jax.devices()[0])
NX = 1024
mm = poisson2d(NX, NX)
dia = DiaMatrix.from_matrix_market(mm)
hier_h = block_aggregation_setup(dia, smooth_levels=0)
hier = block_amg_device(hier_h, dtype=jnp.float32)
print("levels", [(lv.n_pad, type(lv.a).__name__,
                  len(lv.a.offsets) if hasattr(lv.a, "offsets")
                  else -1) for lv in hier.levels])


def chain_time(fn, x0, k=64):
    """Time k chained applications (out feeds in), minus dispatch."""
    @jax.jit
    def chained(x):
        for _ in range(k):
            x = 1e-6 * fn(x)   # keep magnitudes bounded
        return x

    r = chained(x0)
    np.asarray(r[:1])
    t0 = time.perf_counter()
    r = chained(x0)
    np.asarray(r[:1])
    dt = time.perf_counter() - t0
    return dt / k


rng = np.random.default_rng(0)
# per-level matvec cost
for i, lv in enumerate(hier.levels):
    x = jnp.asarray(rng.standard_normal(lv.n_pad), jnp.float32)
    t = chain_time(lambda v, a=lv.a: spmv(a, v), x, k=64)
    nd = len(lv.a.offsets) if hasattr(lv.a, "offsets") else -1
    print(f"level {i}: n={lv.n_pad} ndiag={nd} "
          f"matvec={t*1e6:.1f} us", flush=True)

# whole V-cycle
r0 = jnp.asarray(rng.standard_normal(hier.levels[0].n_pad),
                 jnp.float32)
t = chain_time(lambda r: block_vcycle(hier, r), r0, k=16)
print(f"vcycle: {t*1e3:.3f} ms", flush=True)

# vcycle truncated at depth d: rebuild hierarchy with fewer levels
import dataclasses as _dc

for d in range(1, len(hier.levels)):
    sub = _dc.replace(
        hier, levels=hier.levels[:d],
        coarse_inv=jnp.eye(hier.levels[d - 1].n_coarse,
                           dtype=jnp.float32))
    t = chain_time(lambda r: block_vcycle(sub, r), r0, k=16)
    print(f"vcycle depth {d}: {t*1e3:.3f} ms", flush=True)
