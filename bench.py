"""Headline benchmark: Pallas DIA SpMV on one TPU chip vs the HBM roofline.

Mirrors the reference's profiling mode (src/profile-kernel.cpp:197-313:
warmup + timed runs + statistics) on a large 5-point-stencil matrix in
the HBM-streaming regime (working set ~400 MB >> VMEM).  The kernel is
the TPU-native DIA stencil kernel (spmv_tpu/ops/pallas_kernels.py) in
its chained zero-copy form — the configuration an iterative solver
(CG) actually runs.

Driver contract: print ONE JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
where value is the achieved fraction of the memory-bandwidth roofline
(BASELINE.json target: >= 0.80) and vs_baseline = value / 0.80.

Correctness is gated in-line: an on-device |y| checksum must match the
fp64 host reference to CHECKSUM_RTOL before any timing is reported.
"""

from __future__ import annotations

import json
import sys
import time

# In-place (aliased x/y, probe 24/25) prefers 256-row tiles for SpMV;
# SpMM prefers 512 (bigger DMAs against its fatter window).
TILE_ROWS = 256
SPMM_TILE_ROWS = 512
BASELINE_FRACTION = 0.80
# fp32 |y| checksum over ~84M entries vs the fp64 host reference
CHECKSUM_RTOL = 1e-4


def main() -> None:
    # The tunneled chip occasionally wedges and self-heals in a few
    # minutes; one retry keeps the round's benchmark from recording a
    # transient failure.
    try:
        _run()
    except Exception as e:  # noqa: BLE001 — report, wait, retry once
        print(f"bench: first attempt failed ({e!r}); retrying in 180s",
              file=sys.stderr)
        time.sleep(180)
        _run()


def _run() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spmv_tpu.io.generate import poisson2d
    from spmv_tpu.models import DiaMatrix
    from spmv_tpu.models.device import DeviceDia
    from spmv_tpu.ops.pallas_kernels import (
        dia_extract_y,
        dia_prepare_x,
        dia_spmv_core,
    )
    from spmv_tpu.perfmodel.tiling import TPU_V5E, roofline_time
    from spmv_tpu.profile.harness import time_kernel

    dev = jax.devices()[0]
    on_tpu = dev.platform not in ("cpu",)
    interpret = not on_tpu
    machine = TPU_V5E

    # ~16.8M rows / ~84M nnz: diagonals alone are 336 MB, far beyond
    # VMEM — the honest HBM-streaming regime.  (Tiny on CPU.)
    n_grid = 4096 if on_tpu else 64
    mm = poisson2d(n_grid, n_grid)
    dia = DiaMatrix.from_matrix_market(mm)
    n, nnz = dia.num_rows, dia.num_entries
    A = DeviceDia.from_host(dia, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)
    x2d = dia_prepare_x(A, jnp.asarray(x), TILE_ROWS)

    def step(x2d, A):
        return dia_spmv_core(A, x2d, tile_rows=TILE_ROWS,
                             interpret=interpret)

    # Correctness gate: on-device |y| checksum vs fp64 host reference.
    @jax.jit
    def checksum(x2d, A):
        y = dia_extract_y(A, step(x2d, A), TILE_ROWS)
        return jnp.abs(y).sum(dtype=jnp.float32)

    want = float(np.abs(dia.spmv(x.astype(np.float64))).sum())
    got = float(checksum(x2d, A))
    rel = abs(got - want) / want
    if rel > CHECKSUM_RTOL:
        print(json.dumps({
            "metric": "dia_spmv_roofline_fraction",
            "value": 0.0,
            "unit": "fraction_of_hbm_roofline",
            "vs_baseline": 0.0,
            "error": f"correctness gate failed: checksum rel err {rel}",
        }))
        return

    # Two independent timing blocks, keep the faster: chip/tunnel
    # state varies +-10% between minutes and the kernel's true floor
    # is what the roofline comparison is about.
    t = min(
        time_kernel(step, (x2d, A), k_small=4, k_large=24,
                    runs=8).seconds_per_iteration
        for _ in range(2)
    )

    # Secondary: multi-vector SpMM (k=4) through the Pallas kernel.
    from spmv_tpu.ops.pallas_kernels import dia_prepare_X, dia_spmm_core

    k = 4
    X = rng.standard_normal((n, k)).astype(np.float32)
    x3d = dia_prepare_X(A, jnp.asarray(X), SPMM_TILE_ROWS)

    def spmm_step(x3d, A):
        return dia_spmm_core(A, x3d, tile_rows=SPMM_TILE_ROWS,
                             interpret=interpret)

    t_spmm = min(
        time_kernel(spmm_step, (x3d, A), k_small=4, k_large=16,
                    runs=6).seconds_per_iteration
        for _ in range(2)
    )
    spmm_bytes = dia.num_diagonals * 4 * n + 2 * k * n * 4

    # Secondary: bf16 storage (halves the dominant diagonal stream;
    # f32 accumulation in-kernel).
    Ab = DeviceDia.from_host(dia, dtype=jnp.bfloat16)
    xb2d = dia_prepare_x(Ab, jnp.asarray(x).astype(jnp.bfloat16),
                         TILE_ROWS)

    def bstep(x2d, A):
        return dia_spmv_core(A, x2d, tile_rows=TILE_ROWS,
                             interpret=interpret)

    t_bf16 = time_kernel(
        bstep, (xb2d, Ab), k_small=8, k_large=64, runs=6
    ).seconds_per_iteration

    # Tertiary: general scattered matrix through WELL-CW (the
    # irregular-matrix path auto_format selects when per-slot WELL
    # would spill — probes 26-28).  Random-banded 1M rows / bandwidth
    # 4096, ~8 nnz/row: no exploitable stencil structure.
    from spmv_tpu.io.generate import banded_random
    from spmv_tpu.models.device import DeviceWellCw
    from spmv_tpu.models.wellcw import WellCwMatrix
    from spmv_tpu.ops.pallas_kernels import wellcw_spmv

    cw_n = (1 << 20) if on_tpu else (1 << 12)
    cw_mm = banded_random(cw_n, half_bandwidth=2048 if on_tpu else 128,
                          nnz_per_row=8, seed=1)
    cw = WellCwMatrix.from_matrix_market(cw_mm)
    Acw = DeviceWellCw.from_host(cw, dtype=jnp.float32)
    xw = rng.standard_normal(cw.num_columns).astype(np.float32)
    xwd = jnp.asarray(xw)

    def cw_step(xwd, Acw):
        return wellcw_spmv(Acw, xwd, interpret=interpret)

    cw_want = float(np.abs(cw.spmv(xw.astype(np.float64))).sum())
    cw_got = float(jnp.abs(cw_step(xwd, Acw)).sum())
    cw_rel = abs(cw_got - cw_want) / cw_want
    cw_ok = cw_rel <= CHECKSUM_RTOL
    t_cw = min(
        time_kernel(cw_step, (xwd, Acw), k_small=4, k_large=16,
                    runs=6).seconds_per_iteration
        for _ in range(2)
    ) if cw_ok else float("inf")
    # Stored stream: every level's value+index tiles move once per
    # SpMV, plus x read and y written once.
    cw_bytes = sum(
        int(lvl.value.size) * (lvl.value.dtype.itemsize + 4)
        for lvl in Acw.levels
    ) + 2 * 4 * cw_n
    cw_frac = cw_bytes / machine.hbm_gbps / 1e9 / t_cw

    # Minimum HBM traffic: diagonals streamed once, x read once,
    # y written once.
    bytes_min = (dia.num_diagonals + 2) * 4 * n
    roof = roofline_time(bytes_min, 2 * nnz, machine=machine,
                         dtype="float32")
    frac = roof["time_roofline_s"] / t

    result = {
        "metric": "dia_spmv_roofline_fraction",
        "value": round(frac, 4),
        "unit": "fraction_of_hbm_roofline",
        "vs_baseline": round(frac / BASELINE_FRACTION, 4),
        "detail": {
            "device": str(dev),
            "kernel": "pallas_dia_chained",
            "matrix": f"poisson2d_{n_grid}x{n_grid}",
            "rows": n,
            "nnz": nnz,
            "num_diagonals": dia.num_diagonals,
            "dtype": "float32",
            "tile_rows": TILE_ROWS,
            "seconds_per_spmv": t,
            "gnnz_per_s": nnz / t / 1e9,
            "gflop_per_s": 2 * nnz / t / 1e9,
            "achieved_gb_per_s": bytes_min / t / 1e9,
            "modeled_min_bytes": bytes_min,
            "roofline_s": roof["time_roofline_s"],
            "machine_model": machine.name,
            "checksum_rel_err": rel,
            "spmm_k": k,
            "spmm_seconds": t_spmm,
            "spmm_gnnz_per_s": k * nnz / t_spmm / 1e9,
            "spmm_roofline_fraction": spmm_bytes / machine.hbm_gbps
            / 1e9 / t_spmm,
            "bf16_seconds_per_spmv": t_bf16,
            "bf16_gnnz_per_s": nnz / t_bf16 / 1e9,
            "bf16_speedup_vs_f32": t / t_bf16,
            "wellcw_matrix": f"banded_random_{cw_n}x{cw_n}",
            "wellcw_nnz": cw.num_entries,
            "wellcw_fill_ratio": cw.fill_ratio,
            "wellcw_remainder_fraction": cw.remainder_fraction,
            "wellcw_checksum_rel_err": cw_rel,
            "wellcw_seconds_per_spmv": t_cw,
            "wellcw_gnnz_per_s": cw.num_entries / t_cw / 1e9,
            "wellcw_stored_bytes": cw_bytes,
            "wellcw_roofline_fraction": cw_frac,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
