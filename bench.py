"""Headline benchmark: Pallas DIA SpMV on one TPU chip vs the HBM roofline.

Mirrors the reference's profiling mode (src/profile-kernel.cpp:197-313:
warmup + timed runs + statistics) on a large 5-point-stencil matrix in
the HBM-streaming regime (diagonal data ~336 MB >> on-chip memory).
The kernel is the TPU-native DIA stencil kernel
(spmv_tpu/ops/pallas_kernels.py) in its chained in-place form — the
configuration an iterative solver (CG) actually runs.

Driver contract: print ONE JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
where value is the achieved fraction of the memory-bandwidth roofline
(BASELINE.json target: >= 0.80) and vs_baseline = value / 0.80.

Fault isolation (round-4, after BENCH_r03 lost four working numbers to
one new leg's compile error): every leg beyond the headline runs in
its own try/except; a failing leg contributes "<leg>_error" to the
detail instead of killing the artifact.  The WELL-CW floor stays a
FAILING gate (VERDICT r2 item 2) — but only when its leg actually ran;
a crash there reports the error rather than silently passing.

Preflight: `python bench.py --compile-only` AOT-compiles every leg's
kernel at the exact driver shapes (jit(...).lower(args).compile())
without timing anything, so a scoped-VMEM or lowering regression is
caught by a test/CI run before the driver does.  Exit code is
non-zero if any leg fails to compile.

Methodology (probes 30-33 in experiments/RESULTS.md):

- Timing is the slope between two LONG chained-iteration programs.
  Dispatch through the tunneled backend costs ~30 ms with multi-ms
  variance, so the harness (time_kernel) extends the long chain until
  the timing signal dominates that variance.  Short-chain slopes can
  misread a 480 us kernel as anywhere from 270 to 570 us.
- The roofline is residency-aware: the chained in-place kernel keeps
  its x/y buffer (67 MB) on-chip across iterations (measured: working
  sets <= 96 MB sustain ~6.4 TB/s r+w and never cross the HBM pins),
  so the speed-of-light time prices only the diagonal stream at HBM
  bandwidth plus the resident r+w at the measured resident bandwidth.
  The naive single-pass fraction (all bytes at HBM speed) is also
  reported; it exceeds 1 for this kernel precisely because of the
  residency effect.

Correctness is gated in-line: an on-device |y| checksum must match the
fp64 host reference to CHECKSUM_RTOL before any timing is reported.
"""

from __future__ import annotations

import json
import sys
import time
import traceback


def _tune_malloc() -> None:
    """Keep freed large buffers reusable instead of munmapping them.

    On this host, first-touch page faults cost ~5 ms/MB — an order of
    magnitude above normal — so every fresh mmap'd numpy temporary
    (glibc mmaps allocations over the default 128 KB threshold and
    returns them to the OS on free) pays the fault cost again.  The
    big host-side setups (block_random + format conversion allocate
    multi-GB of short-lived arrays) sped up ~2x with malloc told to
    serve large blocks from the reusable heap.  Benchmark-process
    policy only; the library never touches global malloc state.
    """
    import ctypes

    try:
        libc = ctypes.CDLL(None, use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:  # noqa: BLE001 — non-glibc hosts: keep defaults
        pass


_tune_malloc()

# In-place (aliased x/y, probe 24/25) prefers 256-row tiles for SpMV;
# SpMM prefers 512 (bigger DMAs against its fatter window).  bf16
# needs 1024: its bytes-per-tile halve, so the fixed per-tile costs
# (rolls, window sync) stop amortizing at 256 — the whole round-2
# "bf16 at 0.74 of its roofline" gap was tile size, not the cast-up
# (probe 49: 287 us at 256 -> 223 us at 1024 = 0.96 of the bf16
# roofline, the predicted 2x over f32).
TILE_ROWS = 256
SPMM_TILE_ROWS = 512
BF16_TILE_ROWS = 1024
BASELINE_FRACTION = 0.80
# fp32 |y| checksum over ~84M entries vs the fp64 host reference
CHECKSUM_RTOL = 1e-4
# Scattered-matrix gate (VERDICT r2 item 2): the WELL-CW fraction is a
# FAILING gate, not a rider — regressing the scattered path must turn
# the bench red.  Round 5's cross-source table reuse lifted the
# merged grid to ~0.46 (437 us / 19.2 Gnnz/s); the floor sits under
# the pre-reuse noise band (0.414-0.425) so a tunnel-slow run of the
# old level still passes while a kernel or packing break (which
# lands well below 0.38) fails.
WELLCW_FLOOR = 0.38


def main() -> int:
    compile_only = "--compile-only" in sys.argv[1:]
    if compile_only:
        return _preflight()
    # The tunneled chip occasionally wedges and self-heals in a few
    # minutes; one retry keeps the round's benchmark from recording a
    # transient failure.  If the headline leg fails twice, emit a
    # zero-value artifact (valid JSON with the error) instead of a
    # bare traceback, so the round still records *something*.
    try:
        _run()
    except Exception as e:  # noqa: BLE001 — report, wait, retry once
        print(f"bench: first attempt failed ({e!r}); retrying in 180s",
              file=sys.stderr)
        time.sleep(180)
        try:
            _run()
        except Exception as e2:  # noqa: BLE001 — emit zero artifact
            traceback.print_exc(file=sys.stderr)
            print(json.dumps({
                "metric": "dia_spmv_roofline_fraction",
                "value": 0.0,
                "unit": "fraction_of_hbm_roofline",
                "vs_baseline": 0.0,
                "error": f"{type(e2).__name__}: {e2}"[:2000],
            }))
            return 1
    return 0


_FD_CHILD = r"""
import ctypes, json, os, sys, time
sys.path.insert(0, os.environ["SPMV_BENCH_REPO"])
try:  # same malloc policy as the parent bench (_tune_malloc)
    _libc = ctypes.CDLL(None, use_errno=True)
    _libc.mallopt(-3, 1 << 30)
    _libc.mallopt(-1, 1 << 30)
except Exception:
    pass
import jax
from spmv_tpu.utils.compilecache import enable_persistent_cache
enable_persistent_cache()
import jax.numpy as jnp
import numpy as np
from spmv_tpu.io.matrix_market import load_matrix
from spmv_tpu.models.wellcw import WellCwMatrix
from spmv_tpu.models.device import DeviceWellCw
from spmv_tpu.ops.pallas_kernels import wellcw_spmv
tgz = sys.argv[1]
interpret = len(sys.argv) > 2 and sys.argv[2] == "interpret"
t0 = time.perf_counter()
mm = load_matrix(tgz)
t1 = time.perf_counter()
cw = WellCwMatrix.from_matrix_market(mm)
t2 = time.perf_counter()
A = DeviceWellCw.from_host(cw, dtype=jnp.float32)
x = jnp.ones((cw.num_columns,), jnp.float32)
y = wellcw_spmv(A, x, interpret=interpret)
checksum = float(jnp.abs(y).sum())
t3 = time.perf_counter()
print(json.dumps({
    "ingest_seconds": t1 - t0,
    "convert_seconds": t2 - t1,
    "device_and_first_spmv_seconds": t3 - t2,
    "time_to_solution_seconds": t3 - t0,
    "checksum": checksum,
}))
"""


def _fd_cold_warm(tgz: str, td: str, interpret: bool = False) -> dict:
    """Cold/warm fresh-process time-to-solution for the file workflow.

    Spawns the full file->device->first-SpMV pipeline in a child
    process twice against a fresh persistent compilation cache: run 1
    compiles everything and populates the cache (cold), run 2 reads it
    back (warm).  The axon tunnel multiplexes the chip, so children
    run while the bench process holds its own client (verified).
    Errors degrade to a ``fdchild_error`` field instead of failing
    the leg.
    """
    import os as _os
    import subprocess

    cache = _os.path.join(td, "fdcache")
    env = dict(_os.environ)
    env["SPMV_TPU_CACHE_DIR"] = cache
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env["SPMV_BENCH_REPO"] = _os.path.dirname(_os.path.abspath(__file__))
    out: dict = {}
    try:
        for tag in ("cold", "warm"):
            argv = [sys.executable, "-c", _FD_CHILD, tgz]
            if interpret:
                argv.append("interpret")
            r = subprocess.run(argv, capture_output=True, text=True,
                               timeout=600, env=env)
            if r.returncode != 0:
                out["fdchild_error"] = (
                    f"{tag} child rc={r.returncode}: "
                    + r.stderr.strip()[-500:])
                return out
            doc = json.loads(r.stdout.strip().splitlines()[-1])
            out[f"time_to_solution_{tag}_seconds"] = (
                doc["time_to_solution_seconds"])
            out[f"device_and_first_spmv_{tag}_seconds"] = (
                doc["device_and_first_spmv_seconds"])
    except Exception as e:  # noqa: BLE001 — report, don't fail the leg
        out["fdchild_error"] = f"{type(e).__name__}: {e}"[:500]
    return out


def _setup():
    """Shared device/flag context for the run and preflight modes."""
    from spmv_tpu.utils.compilecache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    from spmv_tpu.perfmodel.tiling import TPU_V5E

    dev = jax.devices()[0]
    on_tpu = dev.platform not in ("cpu",)
    return dev, on_tpu, not on_tpu, TPU_V5E


def _legs(on_tpu: bool, interpret: bool):
    """Yield (name, build) pairs.

    ``build()`` returns (step, args, finish) where ``step(*args)`` is
    the jittable kernel iteration at the driver shape and ``finish``
    runs the leg's checksum + timing and returns a detail dict.  The
    preflight calls only step-compilation; the bench calls finish.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spmv_tpu.io.generate import banded_random, block_random, poisson2d
    from spmv_tpu.models import DiaMatrix, auto_format
    from spmv_tpu.models.device import DeviceBsr, DeviceDia, DeviceWellCw
    from spmv_tpu.models.wellcw import WellCwMatrix
    from spmv_tpu.ops.pallas_kernels import (
        bsr_spmm,
        dia_extract_y,
        dia_prepare_X,
        dia_prepare_x,
        dia_spmm_core,
        dia_spmv_core,
        wellcw_spmv,
    )
    from spmv_tpu.perfmodel.tiling import TPU_V5E, roofline_time
    from spmv_tpu.profile.harness import time_kernel

    machine = TPU_V5E
    rng = np.random.default_rng(0)

    # ---- headline: DIA SpMV --------------------------------------
    # ~16.8M rows / ~84M nnz: diagonals alone are 336 MB, far beyond
    # on-chip memory — the honest HBM-streaming regime.  (Tiny on CPU.)
    n_grid = 4096 if on_tpu else 64
    mm = poisson2d(n_grid, n_grid)
    dia = DiaMatrix.from_matrix_market(mm)
    n, nnz = dia.num_rows, dia.num_entries
    A = DeviceDia.from_host(dia, dtype=jnp.float32)
    x = rng.standard_normal(n).astype(np.float32)

    def build_dia():
        x2d = dia_prepare_x(A, jnp.asarray(x), TILE_ROWS)

        def step(x2d, A):
            return dia_spmv_core(A, x2d, tile_rows=TILE_ROWS,
                                 interpret=interpret)

        def finish():
            @jax.jit
            def checksum(x2d, A):
                y = dia_extract_y(A, step(x2d, A), TILE_ROWS)
                return jnp.abs(y).sum(dtype=jnp.float32)

            want = float(np.abs(dia.spmv(x.astype(np.float64))).sum())
            got = float(checksum(x2d, A))
            rel = abs(got - want) / want
            if rel > CHECKSUM_RTOL:
                raise RuntimeError(
                    f"correctness gate failed: checksum rel err {rel}")
            ks, kl = (8, 136) if on_tpu else (2, 6)
            timing = time_kernel(step, (x2d, A), k_small=ks, k_large=kl,
                                 runs=6)
            t = timing.seconds_per_iteration
            stream_bytes = dia.num_diagonals * 4 * n
            resident_rw = 2 * n * 4
            roof = roofline_time(stream_bytes, 2 * nnz, machine=machine,
                                 dtype="float32",
                                 resident_rw_bytes=resident_rw)
            frac = roof["time_roofline_s"] / t
            naive_roof = roofline_time(stream_bytes + resident_rw,
                                       2 * nnz, machine=machine,
                                       dtype="float32")
            return {
                "kernel": "pallas_dia_chained",
                "matrix": f"poisson2d_{n_grid}x{n_grid}",
                "rows": n,
                "nnz": nnz,
                "num_diagonals": dia.num_diagonals,
                "dtype": "float32",
                "tile_rows": TILE_ROWS,
                "seconds_per_spmv": t,
                "timing_chain_lengths": [timing.k_small, timing.k_large],
                "gnnz_per_s": nnz / t / 1e9,
                "gflop_per_s": 2 * nnz / t / 1e9,
                "hbm_stream_bytes": stream_bytes,
                "resident_rw_bytes": resident_rw,
                "achieved_stream_gb_per_s": stream_bytes / t / 1e9,
                "roofline_s": roof["time_roofline_s"],
                "roofline_fraction": frac,
                "naive_single_pass_fraction":
                    naive_roof["time_roofline_s"] / t,
                "machine_model": machine.name,
                "checksum_rel_err": rel,
            }

        return step, (x2d, A), finish

    yield "dia", build_dia

    # ---- secondary: multi-vector SpMM (k=4) ----------------------
    def build_spmm():
        k = 4
        X = rng.standard_normal((n, k)).astype(np.float32)
        x3d = dia_prepare_X(A, jnp.asarray(X), SPMM_TILE_ROWS)

        def step(x3d, A):
            return dia_spmm_core(A, x3d, tile_rows=SPMM_TILE_ROWS,
                                 interpret=interpret)

        def finish():
            ks, kl = (4, 40) if on_tpu else (2, 4)
            t_spmm = time_kernel(
                step, (x3d, A), k_small=ks, k_large=kl, runs=6
            ).seconds_per_iteration
            # X/Y footprint at this size (k*n*4 ~ 268 MB) exceeds the
            # residency budget: roofline folds it into the HBM stream.
            spmm_roof = roofline_time(
                dia.num_diagonals * 4 * n, 2 * k * nnz, machine=machine,
                dtype="float32", resident_rw_bytes=2 * k * n * 4,
            )
            return {
                "spmm_k": k,
                "spmm_seconds": t_spmm,
                "spmm_gnnz_per_s": k * nnz / t_spmm / 1e9,
                "spmm_roofline_fraction":
                    spmm_roof["time_roofline_s"] / t_spmm,
            }

        return step, (x3d, A), finish

    yield "spmm", build_spmm

    # ---- secondary: bf16 storage ---------------------------------
    def build_bf16():
        Ab = DeviceDia.from_host(dia, dtype=jnp.bfloat16)
        bf16_tile = BF16_TILE_ROWS if on_tpu else TILE_ROWS
        xb2d = dia_prepare_x(Ab, jnp.asarray(x).astype(jnp.bfloat16),
                             bf16_tile)

        def step(x2d, A):
            return dia_spmv_core(A, x2d, tile_rows=bf16_tile,
                                 interpret=interpret)

        def finish():
            ks, kl = (8, 136) if on_tpu else (2, 6)
            t_bf16 = time_kernel(
                step, (xb2d, Ab), k_small=ks, k_large=kl, runs=6
            ).seconds_per_iteration
            return {
                "bf16_seconds_per_spmv": t_bf16,
                "bf16_gnnz_per_s": nnz / t_bf16 / 1e9,
            }

        return step, (xb2d, Ab), finish

    yield "bf16", build_bf16

    # ---- tertiary: scattered matrix through WELL-CW ---------------
    def build_wellcw():
        cw_n = (1 << 20) if on_tpu else (1 << 12)
        cw_mm = banded_random(cw_n,
                              half_bandwidth=2048 if on_tpu else 128,
                              nnz_per_row=8, seed=1)
        cw = WellCwMatrix.from_matrix_market(cw_mm)
        Acw = DeviceWellCw.from_host(cw, dtype=jnp.float32)
        xw = rng.standard_normal(cw.num_columns).astype(np.float32)
        xwd = jnp.asarray(xw)

        def step(xwd, Acw):
            return wellcw_spmv(Acw, xwd, interpret=interpret)

        def finish():
            cw_want = float(np.abs(cw.spmv(xw.astype(np.float64))).sum())
            cw_got = float(jnp.abs(step(xwd, Acw)).sum())
            cw_rel = abs(cw_got - cw_want) / cw_want
            if cw_rel > CHECKSUM_RTOL:
                raise RuntimeError(
                    f"wellcw checksum rel err {cw_rel}")
            ks, kl = (4, 48) if on_tpu else (2, 4)
            t_cw = time_kernel(
                step, (xwd, Acw), k_small=ks, k_large=kl, runs=6
            ).seconds_per_iteration
            # Stored stream: the merged grid's value+index tiles (or
            # every level's, on the fallback layout), the pools'
            # value+index+rowmap; x and y (4 MB each) are resident.
            cw_bytes = sum(
                int(lvl.value.size) * (lvl.value.dtype.itemsize + 4)
                for lvl in Acw.levels
            )
            if Acw.merged is not None:
                cw_bytes += int(Acw.merged.value.size) * (
                    Acw.merged.value.dtype.itemsize + 4
                )
            for _p in ([Acw.pool] if Acw.pool is not None else []) + list(
                Acw.tail_pools
            ):
                cw_bytes += int(_p.value.size) * (
                    _p.value.dtype.itemsize + 8)
            cw_roof = roofline_time(
                cw_bytes, 2 * cw.num_entries, machine=machine,
                dtype="float32", resident_rw_bytes=2 * 4 * cw_n,
            )
            spmm_detail = {}
            if on_tpu:
                # Multi-RHS on the scattered format (VERDICT r4
                # item 3): per-RHS-contiguous tables make the SpMM
                # ~0.9x per-nnz of the single-RHS kernel at k=8
                # (probes 61/62/62c) — the scattered format's best
                # multi-RHS path, though no DIA-style stream
                # amortization exists (gather VALU scales with
                # k*nnz).
                from spmv_tpu.ops.pallas_kernels import wellcw_spmm

                k_rhs = 8
                Xcw = jnp.asarray(rng.standard_normal(
                    (cw.num_columns, k_rhs)).astype(np.float32))
                Ycw = wellcw_spmm(Acw, Xcw)
                got = float(jnp.abs(Ycw).sum())
                want = float(np.abs(cw.spmm(
                    np.asarray(Xcw, np.float64))).sum())
                mm_rel = abs(got - want) / want
                if mm_rel > CHECKSUM_RTOL:
                    spmm_detail["wellcw_spmm_error"] = (
                        f"checksum rel err {mm_rel}")
                else:
                    t_mm = time_kernel(
                        lambda X: wellcw_spmm(Acw, X), (Xcw,),
                        k_small=4, k_large=24, runs=6,
                    ).seconds_per_iteration
                    spmm_detail = {
                        "wellcw_spmm_k": k_rhs,
                        "wellcw_spmm_checksum_rel_err": mm_rel,
                        "wellcw_spmm_seconds": t_mm,
                        "wellcw_spmm_eff_gnnz_per_s":
                            cw.num_entries * k_rhs / t_mm / 1e9,
                        "wellcw_spmm_per_nnz_vs_spmv":
                            (t_mm / k_rhs) / t_cw,
                    }
            return {
                **spmm_detail,
                "wellcw_matrix": f"banded_random_{cw_n}x{cw_n}",
                "wellcw_nnz": cw.num_entries,
                "wellcw_fill_ratio": cw.fill_ratio,
                "wellcw_remainder_fraction": cw.remainder_fraction,
                "wellcw_checksum_rel_err": cw_rel,
                "wellcw_seconds_per_spmv": t_cw,
                "wellcw_gnnz_per_s": cw.num_entries / t_cw / 1e9,
                "wellcw_stored_bytes": cw_bytes,
                "wellcw_roofline_fraction":
                    cw_roof["time_roofline_s"] / t_cw,
            }

        return step, (xwd, Acw), finish

    yield "wellcw", build_wellcw

    # ---- quaternary: BSR SpMM (MXU path) --------------------------
    def build_bsr():
        bs_n = (1 << 17) if on_tpu else (1 << 10)
        bs_mm = block_random(bs_n, bs_n, 8 if on_tpu else 2, seed=2)
        bs_host, bs_rationale = auto_format(bs_mm, workload="spmm")
        assert bs_rationale["format"] == "bsr", bs_rationale
        Abs = DeviceBsr.from_host(bs_host, dtype=jnp.float32)
        Ab16 = DeviceBsr.from_host(bs_host, dtype=jnp.bfloat16)
        bs_k = 128 if on_tpu else 8
        Xb = rng.standard_normal((bs_n, bs_k)).astype(np.float32)
        Xbd = jnp.asarray(Xb)

        def step(Xbd, Abs):
            return bsr_spmm(Abs, Xbd, interpret=interpret)

        def step16(Xbd, Ab16):
            return bsr_spmm(Ab16, Xbd, interpret=interpret)

        def finish():
            bs_want = float(
                np.abs(bs_host.spmm(Xb.astype(np.float64))).sum())
            bs_got = float(jnp.abs(step(Xbd, Abs)).sum())
            bs_rel = abs(bs_got - bs_want) / bs_want
            if bs_rel > CHECKSUM_RTOL:
                raise RuntimeError(f"bsr checksum rel err {bs_rel}")
            ks, kl = (4, 24) if on_tpu else (2, 4)
            t_bs = time_kernel(
                step, (Xbd, Abs), k_small=ks, k_large=kl, runs=6
            ).seconds_per_iteration
            bs_blocks = int(Abs.blocks.shape[0])
            bs_bytes = bs_blocks * Abs.block_rows * 128 * 4
            bs_flops = 2 * bs_blocks * Abs.block_rows * 128 * bs_k
            bs_roof = max(bs_bytes / machine.hbm_gbps / 1e9,
                          bs_flops / machine.peak_flops_f32)
            detail = {
                "bsr_matrix": f"block_random_{bs_n}x{bs_n}",
                "bsr_nnz": bs_host.num_entries,
                "bsr_block_rows": Abs.block_rows,
                "bsr_spmm_k": bs_k,
                "bsr_checksum_rel_err": bs_rel,
                "bsr_spmm_seconds": t_bs,
                "bsr_spmm_gnnz_per_s":
                    bs_k * bs_host.num_entries / t_bs / 1e9,
                "bsr_spmm_tflops": bs_flops / t_bs / 1e12,
                "bsr_spmm_roofline_fraction": bs_roof / t_bs,
            }
            # bf16 block storage (probe 54: 1.86x over f32; f32
            # accumulation, checksummed separately at a looser bound
            # for the bf16 quantization of 134M products).
            got16 = float(jnp.abs(step16(Xbd, Ab16)).sum())
            rel16 = abs(got16 - bs_want) / bs_want
            if rel16 <= 1e-2:
                t16 = time_kernel(
                    step16, (Xbd, Ab16), k_small=ks, k_large=kl,
                    runs=6).seconds_per_iteration
                roof16 = max(
                    bs_bytes / 2 / machine.hbm_gbps / 1e9,
                    bs_flops / machine.peak_flops_bf16)
                detail.update({
                    "bsr_bf16_checksum_rel_err": rel16,
                    "bsr_bf16_spmm_seconds": t16,
                    "bsr_bf16_spmm_tflops": bs_flops / t16 / 1e12,
                    "bsr_bf16_roofline_fraction": roof16 / t16,
                    "bsr_bf16_speedup_vs_f32": t_bs / t16,
                })
            else:
                detail["bsr_bf16_error"] = (
                    f"checksum rel err {rel16}")
            return detail

        return [step, step16], [(Xbd, Abs), (Xbd, Ab16)], finish

    yield "bsr", build_bsr

    # ---- file-driven stage: ingest -> convert -> first SpMV -------
    def build_file_driven():
        # The reference's canonical workflow is file -> .tar.gz ->
        # convert -> run (README.md:84-117); time the SuiteSparse-style
        # path end to end so ingest/convert cost appears in a measured
        # number (time-to-first-SpMV).  No pallas compile of its own
        # (reuses wellcw_spmv), so preflight just builds the archive.
        import io as _io
        import os as _os
        import tarfile
        import tempfile

        from spmv_tpu.io.matrix_market import (
            load_matrix,
            write_matrix_market,
        )

        fd_mm = banded_random((1 << 18) if on_tpu else (1 << 11),
                              half_bandwidth=512 if on_tpu else 64,
                              nnz_per_row=8, seed=3)

        def step():
            return None

        def finish():
            with tempfile.TemporaryDirectory() as td:
                buf = _io.StringIO()
                write_matrix_market(fd_mm, buf)
                payload = buf.getvalue().encode()
                tgz = _os.path.join(td, "fdbench.tar.gz")
                with tarfile.open(tgz, "w:gz") as tf:
                    info = tarfile.TarInfo("fdbench/fdbench.mtx")
                    info.size = len(payload)
                    tf.addfile(info, _io.BytesIO(payload))
                file_bytes = _os.path.getsize(tgz)

                t0 = time.perf_counter()
                fd_loaded = load_matrix(tgz)
                t1 = time.perf_counter()
                fd_cw = WellCwMatrix.from_matrix_market(fd_loaded)
                t2 = time.perf_counter()
                Afd = DeviceWellCw.from_host(fd_cw, dtype=jnp.float32)
                xfd = jnp.asarray(rng.standard_normal(
                    fd_cw.num_columns).astype(np.float32))
                y_first = wellcw_spmv(Afd, xfd, interpret=interpret)
                fd_checksum = float(jnp.abs(y_first).sum())
                t3 = time.perf_counter()
                # Fresh-process cold/warm pair on real hardware only:
                # the CPU/interpret contract run keeps its wall time.
                cold_warm = (_fd_cold_warm(tgz, td, interpret)
                             if on_tpu else {})
            fd_want = float(np.abs(fd_cw.spmv(
                np.asarray(xfd, np.float64))).sum())
            detail = {
                "file_bytes": file_bytes,
                "nnz": fd_loaded.num_entries,
                "ingest_seconds": t1 - t0,
                "convert_seconds": t2 - t1,
                "device_and_first_spmv_seconds": t3 - t2,
                "time_to_solution_seconds": t3 - t0,
                "checksum_rel_err":
                    abs(fd_checksum - fd_want) / fd_want,
            }
            detail.update(cold_warm)
            return {"file_driven": detail}

        return step, None, finish

    yield "file_driven", build_file_driven

    # ---- solver stage: resident-regime CG iteration throughput ----
    def build_solver():
        # The solver layer's headline claim (resident-DIA CG at tens
        # of us/iteration; batched multi-RHS at ~1.9x throughput,
        # probe 59) captured as a driver artifact rather than a
        # probe-only number.  Fixed-iteration (tol=0) solves;
        # us/iteration from the slope between two chain lengths, so
        # pad/extract/dispatch costs cancel.
        from spmv_tpu.ops import (
            batched_conjugate_gradient,
            dia_conjugate_gradient,
        )
        from spmv_tpu.ops.spmv import spmm as generic_spmm

        s_grid = 1024 if on_tpu else 48
        s_mm = poisson2d(s_grid, s_grid)
        s_dia = DiaMatrix.from_matrix_market(s_mm)
        As = DeviceDia.from_host(s_dia, dtype=jnp.float32)
        sn = s_dia.num_rows
        s_x = rng.standard_normal(sn).astype(np.float32)
        s_b = jnp.asarray(s_dia.spmv(s_x).astype(np.float32))
        # Long chains: the tunnel's ~30 ms dispatch variance must be
        # small against the large-small gap (at (200, 600) the
        # resident leg's 37 ms signal misread 92 us/iter as 204 in
        # one congested run; (600, 1800) gives ~110 ms of signal).
        iters = (600, 1800) if on_tpu else (20, 60)

        def step(b, A):
            return dia_conjugate_gradient(
                A, b, tol=0.0, max_iterations=iters[1], path="xla")

        def finish():
            import jax as _jax

            def slope(fn_small, fn_large, args):
                ts = []
                for fn in (fn_small, fn_large):
                    r = fn(*args)
                    float(jnp.sum(r.x))
                    best = float("inf")
                    for _ in range(4):
                        t0 = time.perf_counter()
                        r = fn(*args)
                        float(jnp.sum(r.x))
                        best = min(best, time.perf_counter() - t0)
                    ts.append(best)
                return (ts[1] - ts[0]) / (iters[1] - iters[0])

            cg_small = _jax.jit(lambda b, A: dia_conjugate_gradient(
                A, b, tol=0.0, max_iterations=iters[0], path="xla"))
            cg_large = _jax.jit(step)
            t1 = slope(cg_small, cg_large, (s_b, As))

            # correctness gate: a real tolerance solve reaches x_true
            sol = _jax.jit(lambda b, A: dia_conjugate_gradient(
                A, b, tol=1e-5, max_iterations=3000, path="xla")
            )(s_b, As)
            rel = float(np.linalg.norm(
                np.asarray(sol.x, np.float64) - s_x
            ) / np.linalg.norm(s_x))
            if rel > 1e-2:
                raise RuntimeError(f"solver gate: CG rel err {rel}")

            k = 4
            Bk = jnp.asarray(rng.standard_normal(
                (sn, k)).astype(np.float32))
            bk_small = _jax.jit(lambda B, A: batched_conjugate_gradient(
                lambda V: generic_spmm(A, V), B, tol=0.0,
                max_iterations=iters[0]))
            bk_large = _jax.jit(lambda B, A: batched_conjugate_gradient(
                lambda V: generic_spmm(A, V), B, tol=0.0,
                max_iterations=iters[1]))
            tk = slope(bk_small, bk_large, (Bk, As))
            detail = {
                "matrix": f"poisson2d_{s_grid}x{s_grid}",
                "rows": sn,
                "cg_us_per_iteration": t1 * 1e6,
                "cg_solve_iterations": int(sol.iterations),
                "cg_rel_x_err": rel,
                "batched_k": k,
                "batched_us_per_iteration": tk * 1e6,
                "batched_throughput_vs_sequential": k * t1 / tk,
            }

            # Streaming-regime fused CG (VERDICT r4 item 2): at 16.8M
            # rows the diagonals stream from HBM and the p.Ap dot's
            # separate 2-vector pass is real traffic — the fused
            # Pallas iteration (dia_spmv_core with_dot) folds it into
            # the matvec; the unfused control pins the drop in the
            # same artifact (probe 60 measured ~12%).
            if on_tpu:
                l_grid = 4096
                l_dia = DiaMatrix.from_matrix_market(
                    poisson2d(l_grid, l_grid))
                Al = DeviceDia.from_host(l_dia, dtype=jnp.float32)
                bl = jnp.asarray(rng.standard_normal(
                    l_dia.num_rows).astype(np.float32))
                li = (40, 120)

                def strm(fused, n_it):
                    return _jax.jit(
                        lambda b, A: dia_conjugate_gradient(
                            A, b, tol=0.0, max_iterations=n_it,
                            path="pallas", fused=fused))

                def slope_l(fused):
                    ts = []
                    for n_it in li:
                        fn = strm(fused, n_it)
                        r = fn(bl, Al)
                        float(jnp.sum(r.x))
                        best = float("inf")
                        for _ in range(3):
                            t0 = time.perf_counter()
                            r = fn(bl, Al)
                            float(jnp.sum(r.x))
                            best = min(best,
                                       time.perf_counter() - t0)
                        ts.append(best)
                    return (ts[1] - ts[0]) / (li[1] - li[0])

                t_fused = slope_l(True)
                t_unfused = slope_l(False)
                detail.update({
                    "streaming_matrix":
                        f"poisson2d_{l_grid}x{l_grid}",
                    "streaming_rows": l_dia.num_rows,
                    "streaming_cg_us_per_iteration": t_fused * 1e6,
                    "streaming_cg_unfused_us_per_iteration":
                        t_unfused * 1e6,
                    "streaming_fused_speedup": t_unfused / t_fused,
                })
            return {"solver": detail}

        return step, (s_b, As), finish

    yield "solver", build_solver


def _preflight() -> int:
    """AOT-compile every leg's kernel at driver shapes; no timing.

    Catches scoped-VMEM / lowering regressions (the BENCH_r03 failure
    mode) without a full bench run.  Prints one JSON line per leg and
    exits non-zero if any compile fails.
    """
    import jax

    dev, on_tpu, interpret, _ = _setup()
    failed = []
    for name, build in _legs(on_tpu, interpret):
        t0 = time.perf_counter()
        try:
            step, args, _finish = build()
            pairs = (list(zip(step, args)) if isinstance(step, list)
                     else [(step, args)])
            extra = {}
            for j, (stp, ag) in enumerate(pairs):
                if ag is None:
                    continue
                compiled = jax.jit(stp).lower(*ag).compile()
                mem = compiled.memory_analysis()
                suffix = f"_{j}" if len(pairs) > 1 else ""
                extra[f"output_bytes{suffix}"] = getattr(
                    mem, "output_size_in_bytes", None)
                extra[f"temp_bytes{suffix}"] = getattr(
                    mem, "temp_size_in_bytes", None)
            print(json.dumps({
                "leg": name, "ok": True,
                "compile_seconds": time.perf_counter() - t0, **extra,
            }), flush=True)
        except Exception as e:  # noqa: BLE001 — report every leg
            failed.append(name)
            print(json.dumps({
                "leg": name, "ok": False,
                "error": f"{type(e).__name__}: {e}"[:2000],
            }), flush=True)
    print(json.dumps({"preflight_ok": not failed, "failed": failed,
                      "device": str(dev)}), flush=True)
    return 1 if failed else 0


def _run(gate_wellcw: bool | None = None) -> None:
    """Run all legs.  ``gate_wellcw`` overrides whether the WELL-CW
    floor is enforced (default: only on TPU, where the floor's
    calibration holds); tests use it to pin the gate on CPU shapes."""
    dev, on_tpu, interpret, machine = _setup()
    if gate_wellcw is None:
        gate_wellcw = on_tpu

    detail = {"device": str(dev)}
    errors = {}
    headline = None
    legs = list(_legs(on_tpu, interpret))
    for name, build in legs:
        try:
            _step, _args, finish = build()
            res = finish()
            if name == "dia":
                headline = res
            detail.update(res)
        except Exception as e:  # noqa: BLE001 — isolate the leg
            if name == "dia":
                raise  # headline failure = bench failure (retried once)
            errors[name] = f"{type(e).__name__}: {e}"[:2000]
            detail[f"{name}_error"] = errors[name]
            traceback.print_exc(file=sys.stderr)

    frac = headline["roofline_fraction"]

    # The WELL-CW floor is a FAILING gate (VERDICT r2 item 2): dia and
    # wellcw gate the artifact; the rider legs (spmm/bf16/bsr/file) are
    # fault-isolated.  A *crashed* wellcw leg is a structural
    # regression by definition and trips the gate too.
    cw_frac = detail.get("wellcw_roofline_fraction")
    cw_bad = gate_wellcw and (
        "wellcw" in errors
        or (cw_frac is not None and cw_frac < WELLCW_FLOOR)
    )
    if cw_bad:
        print(json.dumps({
            "metric": "dia_spmv_roofline_fraction",
            "value": 0.0,
            "unit": "fraction_of_hbm_roofline",
            "vs_baseline": 0.0,
            "error": ("wellcw gate failed: "
                      + (errors.get("wellcw")
                         or f"roofline fraction {cw_frac:.4f} < "
                            f"{WELLCW_FLOOR}")),
            "detail": detail,
        }))
        return

    result = {
        "metric": "dia_spmv_roofline_fraction",
        "value": round(frac, 4),
        "unit": "fraction_of_hbm_roofline",
        "vs_baseline": round(frac / BASELINE_FRACTION, 4),
        "detail": detail,
    }
    if errors:
        result["leg_errors"] = sorted(errors)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
