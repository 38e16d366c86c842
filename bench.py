"""Headline benchmark: CSR SpMV on one TPU chip vs the HBM roofline.

Mirrors the reference's profiling mode (src/profile-kernel.cpp:197-313:
warmup + n timed runs + statistics) on the reference's primary kernel,
CSR SpMV (src/kernels/csr-spmv.cpp), at a matrix size where the kernel
is HBM-bandwidth-bound.  The driver contract: print ONE JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
where value is the achieved fraction of the memory-bandwidth roofline
(BASELINE.json target: >= 0.80) and vs_baseline = value / 0.80.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    import jax
    import jax.numpy as jnp

    from spmv_tpu.io.generate import poisson2d
    from spmv_tpu.models import CsrMatrix
    from spmv_tpu.models.device import DeviceCsr
    from spmv_tpu.ops import spmv_padded
    from spmv_tpu.perfmodel.tiling import (
        TPU_V5E,
        roofline_time,
        spmv_traffic_model,
    )
    from spmv_tpu.profile.harness import time_kernel

    dev = jax.devices()[0]
    on_tpu = dev.platform not in ("cpu",)
    machine = TPU_V5E

    # ~1M rows / ~5.2M nnz: far larger than VMEM, firmly HBM-bound.
    n = 1024 if on_tpu else 128
    mm = poisson2d(n, n)
    host = CsrMatrix.from_matrix_market(mm)
    A = DeviceCsr.from_host(host, dtype=jnp.float32)
    x = jnp.ones((A.num_columns,), dtype=jnp.float32)

    def step(x, A):
        # Chain y back into x (same length for the square poisson
        # matrix) so iterations cannot be collapsed by the compiler.
        y = spmv_padded(A, x)
        return y[: A.num_columns]

    timing = time_kernel(step, (x, A), k_small=4, k_large=24, runs=5)
    t = timing.seconds_per_iteration

    traffic = spmv_traffic_model(host, value_bytes=4, index_bytes=4,
                                 machine=machine)
    roof = roofline_time(traffic.total_tiled, traffic.flops,
                         machine=machine, dtype="float32")

    nnz_per_s = host.num_entries / t
    gflops = traffic.flops / t / 1e9
    achieved_gbps = traffic.total_tiled / t / 1e9
    frac = roof["time_roofline_s"] / t

    result = {
        "metric": "csr_spmv_roofline_fraction",
        "value": round(frac, 4),
        "unit": "fraction_of_hbm_roofline",
        "vs_baseline": round(frac / 0.80, 4),
        "detail": {
            "device": str(dev),
            "matrix": f"poisson2d_{n}x{n}",
            "rows": host.num_rows,
            "nnz": host.num_entries,
            "dtype": "float32",
            "seconds_per_spmv": t,
            "nnz_per_s": nnz_per_s,
            "gflop_per_s": gflops,
            "achieved_gb_per_s": achieved_gbps,
            "modeled_bytes": traffic.total_tiled,
            "roofline_s": roof["time_roofline_s"],
            "machine_model": machine.name,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
