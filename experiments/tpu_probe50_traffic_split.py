"""Probe 50: on-device traffic-isolation measurement (VERDICT r2
missing #3).

Times the full / stream-only / gather-only SpMV triple
(ops.traffic) for a streaming-scale CSR and WELL matrix on the real
chip and compares the measured time split against the analytic
traffic_split the roofline uses.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 900 python
     experiments/tpu_probe50_traffic_split.py
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.io.generate import banded_random, random_sparse
from spmv_tpu.models import CsrMatrix
from spmv_tpu.models.device import DeviceCsr, DeviceWell
from spmv_tpu.models.well import WellMatrix
from spmv_tpu.perfmodel.tiling import TPU_V5E
from spmv_tpu.profile.traffic import measure_traffic_split

print("device:", jax.devices()[0])

out = {}

# Streaming-scale CSR: 2M rows x 2M, ~16 nnz/row => ~32M entries,
# values 128 MB + idx 128 MB >> 96 MB residency.
print("building csr ...", flush=True)
mm = random_sparse(2_000_000, 2_000_000, 16, seed=1)
A = DeviceCsr.from_host(CsrMatrix.from_matrix_market(mm),
                        dtype=jnp.float32)
print(f"csr stored={A.padded_entries}", flush=True)
r = measure_traffic_split(A, machine=TPU_V5E)
out["csr"] = r
print(json.dumps({k: v for k, v in r.items() if k != "analytic"},
                 indent=1), flush=True)

# Banded WELL at streaming scale (halfband 8 -> ~17 nnz/row).
print("building well ...", flush=True)
mmw = banded_random(2_000_000, 2048, 16, seed=2)
W = DeviceWell.from_host(WellMatrix.from_matrix_market(mmw),
                         dtype=jnp.float32)
rw = measure_traffic_split(W, machine=TPU_V5E)
out["well"] = rw
print(json.dumps({k: v for k, v in rw.items() if k != "analytic"},
                 indent=1), flush=True)

with open("experiments/probe50_traffic_split.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote experiments/probe50_traffic_split.json")
