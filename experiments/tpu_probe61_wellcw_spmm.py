"""Probe 61: WELL-CW SpMM at the scattered cliff case (VERDICT r4 #3).

The single-RHS WELL-CW SpMV is VALU-bound at 0.42 of the stored-bytes
roofline on the cliff case (1M rows, bw 2048, 8 nnz/row) — every
lever measured dead (probes 36/56, PLAN dead-end list).  The escape
hatch is the WORKLOAD: `wellcw_spmm` re-uses each gathered X window
across k right-hand sides, so if the per-nnz VALU cost is ~flat in k
(the way DIA's SpMM amortizes its window DMAs), multi-RHS throughput
clears the >= 0.8 roofline bar even though single-RHS cannot.

Measured here: seconds/iteration and per-k effective Gnnz/s for
k in {2, 4, 8}, plus the stored-byte roofline fraction with
resident r+w priced for k vectors.  The whole-x VMEM guard caps
k * x_padded at 8 MB; at 1M columns that allows k=2 natively — the
probe also monkeypatches the budget up to see whether larger k
compiles and how it performs (informing whether the guard can be
raised for SpMM or a column-chunked wrapper is needed).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.io.generate import banded_random
from spmv_tpu.models.wellcw import WellCwMatrix
from spmv_tpu.models.device import DeviceWellCw
from spmv_tpu.ops import pallas_kernels as pk
from spmv_tpu.profile.harness import time_kernel
from spmv_tpu.perfmodel.tiling import TPU_V5E, roofline_time

N = 1 << 20
BW = 2048
NNZ_PER_ROW = 8

print("device:", jax.devices()[0], flush=True)
mm = banded_random(N, half_bandwidth=BW, nnz_per_row=NNZ_PER_ROW,
                   seed=1)
cw = WellCwMatrix.from_matrix_market(mm)
A = DeviceWellCw.from_host(cw, dtype=jnp.float32)
rng = np.random.default_rng(0)

stored = sum(
    int(lvl.value.size) * (lvl.value.dtype.itemsize + 4)
    for lvl in A.levels
)
if A.merged is not None:
    stored += int(A.merged.value.size) * (
        A.merged.value.dtype.itemsize + 4)
for _p in ([A.pool] if A.pool is not None else []) + list(
        A.tail_pools):
    stored += int(_p.value.size) * (_p.value.dtype.itemsize + 8)

out = {"n": N, "bw": BW, "nnz": cw.num_entries,
       "stored_bytes": stored}

# single-RHS baseline (the 0.42 number)
x1 = jnp.asarray(rng.standard_normal(N).astype(np.float32))
t1 = time_kernel(lambda x: pk.wellcw_spmv(A, x), (x1,), k_small=4,
                 k_large=48, runs=6).seconds_per_iteration
roof1 = roofline_time(stored, 2 * cw.num_entries, machine=TPU_V5E,
                      dtype="float32", resident_rw_bytes=2 * 4 * N)
out["k1"] = {"seconds": t1,
             "gnnz_per_s": cw.num_entries / t1 / 1e9,
             "roofline_fraction": roof1["time_roofline_s"] / t1}
print("k=1", json.dumps(out["k1"]), flush=True)

# raise the whole-x VMEM budget for the probe (16 MB x tables at k=4
# leave >100 MB of v5e VMEM for tiles) — if Mosaic rejects it, the
# entry records the failure instead.
_orig_guard = pk._cw_vmem_guard
pk._cw_vmem_guard = lambda A, nvec=1: None

for k in (2, 4, 8):
    Xk = jnp.asarray(
        rng.standard_normal((N, k)).astype(np.float32))
    label = f"k{k}"
    try:
        Y = pk.wellcw_spmm(A, Xk)
        got = float(jnp.abs(Y).sum())
        want = float(
            np.abs(cw.spmm(np.asarray(Xk, np.float64))).sum())
        rel = abs(got - want) / want
        tk = time_kernel(lambda X: pk.wellcw_spmm(A, X), (Xk,),
                         k_small=4, k_large=24,
                         runs=6).seconds_per_iteration
        roofk = roofline_time(
            stored, 2 * cw.num_entries * k, machine=TPU_V5E,
            dtype="float32", resident_rw_bytes=2 * 4 * N * k)
        out[label] = {
            "seconds": tk,
            "checksum_rel_err": rel,
            "eff_gnnz_per_s": cw.num_entries * k / tk / 1e9,
            "per_nnz_cost_vs_k1": (tk / k) / (t1 / 1),
            "roofline_fraction": roofk["time_roofline_s"] / tk,
        }
    except Exception as e:  # noqa: BLE001 — record the failure
        out[label] = {"error": f"{type(e).__name__}: {e}"[:300]}
    print(label, json.dumps(out[label]), flush=True)

pk._cw_vmem_guard = _orig_guard
print(json.dumps(out))
