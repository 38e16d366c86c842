"""Probe 58: the fused single-kernel V-cycle vs the unfused block
V-cycle on the real chip.

Baseline (probe 53c / RESULTS.md): one unfused block V-cycle costs
~4.3 ms at 1M rows — ~40 sequential ops each paying a ~0.4-0.7 ms
dispatch/DMA floor — while a plain CG iteration costs 25 us.  PLAN
item 11's prediction: fusing the whole cycle into one Pallas kernel
(ops/fused_vcycle.py) removes the floor and leaves only the streaming
cost of the hierarchy's data (~44 MB at 1M rows, all VMEM-resident).

Measures, at 512x512 and 1024x1024 Poisson (f32, smooth_levels=1,
Chebyshev degree 3):
- fused_vcycle_folded chained (the kernel alone, folded layout)
- block_vcycle chained (the unfused reference, padded layout)
- on-device agreement between the two
- AMG-PCG iteration cost with the fused preconditioner
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models.csr import CsrMatrix
from spmv_tpu.ops.amg import block_amg_device, block_vcycle
from spmv_tpu.ops.fused_vcycle import (
    fold_vector,
    fused_block_setup,
    fused_vcycle_device,
    fused_vcycle_folded,
    unfold_vector,
)
from spmv_tpu.profile.harness import time_kernel

print("device:", jax.devices()[0], flush=True)
out = {}

for nx in (512, 1024):
    tag = f"poisson_{nx}x{nx}"
    mm = poisson2d(nx, nx)
    host = CsrMatrix.from_matrix_market(mm)
    n = mm.num_rows
    import time as _t

    t0 = _t.perf_counter()
    hier = fused_block_setup(host, smooth_levels=1)
    setup_s = _t.perf_counter() - t0
    fv = fused_vcycle_device(hier, dtype=jnp.float32)
    dev = block_amg_device(hier, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.standard_normal(n), jnp.float32)
    n_pad = hier.levels[0].n_pad
    rp = jnp.pad(r, (0, n_pad - n))

    # on-device agreement
    got_f = np.asarray(unfold_vector(
        fv, fused_vcycle_folded(fv, fold_vector(fv, r))))
    got_b = np.asarray(block_vcycle(dev, rp))[:n]
    agree = float(np.linalg.norm(got_f - got_b)
                  / np.linalg.norm(got_b))

    tf = time_kernel(
        lambda b2d, fv_: fused_vcycle_folded(fv_, b2d),
        (fold_vector(fv, r), fv), k_small=2, k_large=10, runs=5,
    ).seconds_per_iteration
    tb = time_kernel(
        lambda b_, dev_: block_vcycle(dev_, b_),
        (rp, dev), k_small=2, k_large=6, runs=4,
    ).seconds_per_iteration

    out[tag] = {
        "rows": n,
        "levels": [c * 128 for c in fv.chunk_rows]
        + [int(fv.coarse.shape[0]) * 128],
        "num_diagonals": [len(o) for o in fv.offsets],
        "setup_seconds": setup_s,
        "agreement_rel_err": agree,
        "fused_vcycle_seconds": tf,
        "block_vcycle_seconds": tb,
        "speedup": tb / tf,
    }
    print(tag, out[tag], flush=True)

with open("experiments/probe58_fused_vcycle.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
