"""Probe 54: bf16 block storage for BSR SpMM (PLAN item 13).

Round-2/3 BENCH detail has the f32 BSR SpMM leg at 21.7 TFLOPs = 0.44
of the f32 MXU peak (131k rows, 8 dense 128x128 blocks per block-row,
k=128, whole-X resident).  The block stream is 537 MB f32 -> 656 us
HBM floor; f32 MXU peak prices 700 us.  bf16 blocks halve the stream
(328 us floor) and run the MXU at its bf16 rate (197 TF -> 175 us), so
the bf16 roofline is the 328 us stream: if the kernel holds its
achieved fraction, ~2x.

Measures: f32 path, bf16-blocks path (f32 accumulation), both
checksummed against the fp64 host product; plus kb (blocks-per-step)
sensitivity for the bf16 variant.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.io.generate import block_random
from spmv_tpu.models.bsr import BsrMatrix
from spmv_tpu.models.device import DeviceBsr
from spmv_tpu.ops.pallas_kernels import bsr_spmm
from spmv_tpu.profile.harness import time_kernel

N = 1 << 17
K = 128

mm = block_random(N, N, 8, seed=2)
host = BsrMatrix.from_matrix_market(mm)
rng = np.random.default_rng(0)
X = rng.standard_normal((N, K)).astype(np.float32)
want = np.abs(host.spmm(X.astype(np.float64))).sum()

out = {}
for tag, dtype, kbs in (("f32", jnp.float32, (8,)),
                        ("bf16", jnp.bfloat16, (8, 4, 16))):
    for kb in kbs:
        A = DeviceBsr.from_host(host, dtype=dtype, blocks_per_step=kb)
        Xd = jnp.asarray(X)

        def step(Xd, A):
            return bsr_spmm(A, Xd)

        got = float(jnp.abs(step(Xd, A)).sum())
        rel = abs(got - want) / want
        t = time_kernel(step, (Xd, A), k_small=4, k_large=24,
                        runs=6).seconds_per_iteration
        # Useful flops from the UNPADDED host block count; the device
        # array pads to a multiple of kb (larger kb pads more), so
        # padded-flop TFLOPs would be inflated inconsistently across
        # kb values (ADVICE r3).  The padded stream is what actually
        # crosses HBM; report both plus the pad fraction.
        nb_useful = int(host.blocks.shape[0])
        nb_padded = int(A.blocks.shape[0])
        flops = 2 * nb_useful * A.block_rows * 128 * K
        stream = (nb_padded * A.block_rows * 128
                  * A.blocks.dtype.itemsize)
        out[f"{tag}_kb{kb}"] = {
            "seconds": t,
            "tflops": flops / t / 1e12,
            "padded_stream_gbps": stream / t / 1e9,
            "pad_fraction": (nb_padded - nb_useful) / nb_padded,
            "checksum_rel_err": rel,
        }
        print(tag, kb, out[f"{tag}_kb{kb}"], flush=True)

with open("experiments/probe54_bsr_bf16.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
