"""CLI driver tests (the reference's L6, src/main.cpp).

Exercises both dispatch modes in-process on the CPU backend: simulation
(--profile 0, mirroring main.cpp:239-244) and profiling
(--profile N, main.cpp:246-259), plus error mapping to exit codes
(main.cpp:261-270).
"""

import io
import json

import pytest

import numpy as np

from spmv_tpu.cli import main

MTX = """%%MatrixMarket matrix coordinate real general
4 4 8
1 1 4.0
1 2 -1.0
2 1 -1.0
2 2 4.0
2 3 -1.0
3 2 -1.0
3 3 4.0
4 4 1.0
"""

CONFIG = {
    "caches": {
        "L1-0": {"size": 32768, "line_size": 64, "parent": "L3"},
        "L1-1": {"size": 32768, "line_size": 64, "parent": "L3"},
        "L3": {"size": 20971520, "line_size": 64, "parent": None},
    },
    "num_numa_domains": 2,
    "thread_affinities": [
        {"thread": 0, "cpu": 0, "cache": "L1-0", "numa_domain": 0},
        {"thread": 1, "cpu": 1, "cache": "L1-1", "numa_domain": 1},
    ],
}


@pytest.fixture
def matrix_file(tmp_path):
    p = tmp_path / "small.mtx"
    p.write_text(MTX)
    return str(p)


@pytest.fixture
def config_file(tmp_path):
    p = tmp_path / "machine.json"
    p.write_text(json.dumps(CONFIG))
    return str(p)


def _run(argv):
    out = io.StringIO()
    rc = main(argv, out=out)
    return rc, out.getvalue()


@pytest.mark.parametrize("fmt", ["csr", "coo", "ell", "hybrid", "dia", "well", "bsr"])
def test_simulate_mode(matrix_file, config_file, fmt):
    rc, text = _run(
        ["--matrix", matrix_file, "--trace-config", config_file,
         "--spmv-format", fmt]
    )
    assert rc == 0
    doc = json.loads(text)
    assert doc["kernel"]["name"] == fmt
    assert doc["kernel"]["nonzeros"] == 8
    # one miss matrix per cache, each (threads, numa domains)
    assert set(doc["cache_misses"]) == {"L1-0", "L1-1", "L3"}
    for m in doc["cache_misses"].values():
        assert len(m) == 2 and len(m[0]) == 2
    # every reference touched cold-misses at most once per line; the
    # tiny matrix fits entirely, so misses are positive but bounded
    total = sum(sum(r) for r in doc["cache_misses"]["L3"].values()) \
        if isinstance(doc["cache_misses"]["L3"], dict) \
        else sum(sum(r) for r in doc["cache_misses"]["L3"])
    assert total > 0


def test_simulate_triad(config_file):
    rc, text = _run(
        ["--triad", "1024", "--trace-config", config_file]
    )
    assert rc == 0
    doc = json.loads(text)
    assert doc["kernel"]["name"] == "triad"


def test_profile_mode(matrix_file):
    rc, text = _run(
        ["--matrix", matrix_file, "--spmv-format", "csr",
         "--profile", "3"]
    )
    assert rc == 0
    doc = json.loads(text)
    assert doc["runs"] == 3
    et = doc["execution_time"]
    for key in ("min", "max", "mean", "median", "variance",
                "standard_deviation", "skewness", "kurtosis"):
        assert key in et
    assert doc["achieved"]["gflop_per_s"] > 0
    assert doc["roofline"]["bound"] in ("memory", "compute")
    # VERDICT r4 item 6: multi-run profiles default to one untimed
    # warmup so run 1's compile never poisons the sample statistics.
    assert doc["warmup"] is True


def test_profile_warmup_default_and_override(matrix_file):
    # single run: no auto-warmup (matches the raw reference behavior)
    rc, text = _run(["--matrix", matrix_file, "--spmv-format", "csr",
                     "--profile", "1"])
    assert rc == 0 and json.loads(text)["warmup"] is False
    # explicit opt-out with multiple runs
    rc, text = _run(["--matrix", matrix_file, "--spmv-format", "csr",
                     "--profile", "3", "--no-warmup"])
    assert rc == 0 and json.loads(text)["warmup"] is False
    # explicit opt-in with one run
    rc, text = _run(["--matrix", matrix_file, "--spmv-format", "csr",
                     "--profile", "1", "--warmup"])
    assert rc == 0 and json.loads(text)["warmup"] is True


def test_scaling_report(matrix_file):
    """--scaling prints the assumed ICI efficiency NEXT TO its
    breakeven (VERDICT r4 item 9): declared assumptions stay visible
    in every user-facing multi-chip prediction."""
    rc, text = _run(["--matrix", matrix_file, "--spmv-format", "csr",
                     "--scaling", "2"])
    assert rc == 0
    doc = json.loads(text)["scaling"]
    assert doc["num_shards"] == 2
    assert doc["ici_efficiency_assumed"] == 0.7
    assert "ici_efficiency_breakeven" in doc
    assert doc["ici_efficiency_breakeven"] <= 1.0
    assert "assumption" in doc["note"]
    assert "breakeven" in doc["note"]
    # triad has no matrix to shard
    assert _run(["--triad", "64", "--scaling", "2"])[0] == 1


def test_profile_mode_dia(matrix_file):
    rc, text = _run(
        ["--matrix", matrix_file, "--spmv-format", "dia",
         "--profile", "2"]
    )
    assert rc == 0
    doc = json.loads(text)
    assert doc["kernel"]["num_diagonals"] == 3
    assert doc["kernel"]["fill_ratio"] >= 1.0


def test_list_devices():
    rc, text = _run(["--list-devices"])
    assert rc == 0
    doc = json.loads(text)
    assert len(doc["devices"]) >= 1
    assert {m["name"] for m in doc["machine_models"]} == {
        "tpu-v5e", "tpu-v5p"
    }


def test_errors_map_to_exit_codes(matrix_file, config_file, capsys):
    # no matrix and no triad
    assert _run(["--trace-config", config_file])[0] == 1
    # simulation without a config
    assert _run(["--matrix", matrix_file])[0] == 1
    # nonexistent matrix path
    assert _run(["--matrix", "/does/not/exist.mtx",
                 "--trace-config", config_file])[0] == 1
    # xla-csr cannot produce reference strings (mkl-csr parity,
    # mkl-csr-spmv.cpp:74-81)
    assert _run(["--matrix", matrix_file, "--trace-config", config_file,
                 "--spmv-format", "xla-csr"])[0] == 1


def test_reorder_option(matrix_file, config_file):
    for mode in ("rcm", "sigma"):
        rc, text = _run(
            ["--matrix", matrix_file, "--trace-config", config_file,
             "--spmv-format", "csr", "--reorder", mode]
        )
        assert rc == 0
        doc = json.loads(text)
        assert doc["kernel"]["nonzeros"] == 8


def test_write_matrix_market_roundtrip(tmp_path):
    import numpy as np

    from spmv_tpu.io import (
        load_matrix,
        parse_matrix_market,
        write_matrix_market,
    )

    mm = parse_matrix_market(MTX)
    p = tmp_path / "roundtrip.mtx"
    write_matrix_market(mm, str(p))
    mm2 = load_matrix(str(p))
    np.testing.assert_array_equal(mm.rows_1based, mm2.rows_1based)
    np.testing.assert_array_equal(mm.cols_1based, mm2.cols_1based)
    np.testing.assert_allclose(mm.values, mm2.values)


def test_cg_mode(matrix_file):
    rc, text = _run(
        ["--matrix", matrix_file, "--spmv-format", "csr",
         "--cg", "200", "--cg-tol", "1e-10"]
    )
    assert rc == 0
    doc = json.loads(text)
    assert doc["cg"]["iterations"] <= 200
    assert doc["cg"]["residual_norm"] < 1e-6
    assert doc["cg"]["solution_rms_error_vs_ones"] < 1e-5


def test_cg_mode_guards(matrix_file):
    assert _run(["--triad", "100", "--cg", "10"])[0] == 1


def test_cg_recompute_residual(matrix_file):
    rc, text = _run(
        ["--matrix", matrix_file, "--spmv-format", "csr",
         "--cg", "200", "--cg-tol", "1e-10",
         "--recompute-residual", "5"]
    )
    assert rc == 0
    doc = json.loads(text)
    assert doc["cg"]["residual_norm"] < 1e-6
    assert doc["cg"]["solution_rms_error_vs_ones"] < 1e-5
    # replacement is a CG-recurrence concept; other solvers refuse it
    assert _run(["--matrix", matrix_file, "--cg", "10",
                 "--solver", "chebyshev",
                 "--recompute-residual", "5"])[0] == 1


def test_auto_format_cli(matrix_file, config_file):
    rc, text = _run(
        ["--matrix", matrix_file, "--trace-config", config_file,
         "--spmv-format", "auto"]
    )
    assert rc == 0
    doc = json.loads(text)
    # the 4x4 tridiagonal-ish fixture has few diagonals -> DIA
    assert doc["kernel"]["name"] == "dia"
    # --reorder conflicts with auto
    assert _run(["--matrix", matrix_file, "-s", "auto",
                 "--reorder", "rcm", "--trace-config", config_file])[0] == 1


def test_cg_jacobi_mode(matrix_file):
    rc, text = _run(
        ["--matrix", matrix_file, "--spmv-format", "csr",
         "--cg", "200", "--cg-tol", "1e-10",
         "--precondition", "jacobi"]
    )
    assert rc == 0
    doc = json.loads(text)
    assert doc["cg"]["preconditioner"] == "jacobi"
    assert doc["cg"]["residual_norm"] < 1e-6
    assert doc["cg"]["solution_rms_error_vs_ones"] < 1e-5


def test_profile_spmm_mode(matrix_file):
    rc, text = _run(
        ["--matrix", matrix_file, "--spmv-format", "csr",
         "--profile", "2", "--spmm", "3"]
    )
    assert rc == 0
    doc = json.loads(text)
    assert doc["op"] == {"kind": "spmm", "k": 3}
    # k products per run: flops scale with k
    assert doc["roofline"]["flops"] > 0
    assert doc["achieved"]["gflop_per_s"] > 0


def test_profile_spmm_wellcw_pallas_path(matrix_file):
    """--spmm on the wellcw kernel runs the Pallas per-RHS-contiguous
    SpMM (round 5), not the XLA spec path."""
    rc, text = _run(
        ["--matrix", matrix_file, "--spmv-format", "wellcw",
         "--profile", "2", "--spmm", "2"]
    )
    assert rc == 0
    doc = json.loads(text)
    assert doc["op"] == {"kind": "spmm", "k": 2}
    assert doc["kernel"]["matrix_format"] == "wellcw"


def test_profile_spmm_rejects_triad():
    assert _run(["--triad", "64", "--profile", "2", "--spmm", "2"])[0] == 1


def test_list_devices_introspection():
    rc, text = _run(["--list-devices"])
    assert rc == 0
    doc = json.loads(text)
    assert doc["device_count"] >= 1
    assert doc["jax_version"]
    caps = doc["profiler_capabilities"]
    assert caps["trace_capture"] and not caps["hardware_counters"]
    v5e = next(m for m in doc["machine_models"]
               if m["name"] == "tpu-v5e")
    assert v5e["resident_bytes"] == 96 * 1024**2


def test_auto_spmm_selects_bsr_and_runs(tmp_path):
    # auto_format(workload="spmm") can hand the factory a BsrMatrix;
    # the CLI must be able to profile it (this path used to KeyError
    # before the bsr kernel existed).
    import numpy as np

    from spmv_tpu.io.generate import from_coo_arrays
    from spmv_tpu.io.matrix_market import write_matrix_market

    n = 512
    bh = 8
    rng = np.random.default_rng(3)
    rows_l, cols_l = [], []
    for br in range(n // bh):
        for bc in np.unique(rng.integers(0, n // 128, 2)):
            r, c = np.meshgrid(np.arange(bh), np.arange(128),
                               indexing="ij")
            rows_l.append((br * bh + r).ravel())
            cols_l.append((bc * 128 + c).ravel())
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    mm = from_coo_arrays(n, n, rows, cols,
                         rng.standard_normal(rows.size))
    path = tmp_path / "blocky.mtx"
    write_matrix_market(mm, str(path))

    from spmv_tpu.models import auto_format

    matrix, rationale = auto_format(mm, workload="spmm")
    assert rationale["format"] == "bsr"

    rc, text = _run(["--matrix", str(path), "-s", "auto",
                     "--profile", "2", "--spmm", "4"])
    assert rc == 0
    doc = json.loads(text)
    assert doc["kernel"]["name"] == "bsr"
    assert doc["op"] == {"kind": "spmm", "k": 4}


def test_list_profile_events_from_capture():
    """--list-profile-events DIR enumerates the xplane namespace (the
    full analogue of the reference's --list-perf-events PMU walk,
    src/util/perf-events.cpp:104-181) from a committed real-TPU
    capture: planes, lines, stat names/types, derived fields."""
    import os

    fix = os.path.join(os.path.dirname(__file__), "data",
                       "dia_poisson4096_tpu.xplane.pb")
    rc, text = _run(["--list-profile-events", fix])
    assert rc == 0
    doc = json.loads(text)
    assert doc["capture"] == fix
    planes = {p["plane"]: p for p in doc["planes"]}
    assert "/device:TPU:0" in planes
    ops_lines = {l["line"]: l for l in planes["/device:TPU:0"]["lines"]}
    assert "XLA Ops" in ops_lines
    statnames = {s["name"] for s in ops_lines["XLA Ops"]["event_stats"]}
    assert "device_duration_ps" in statnames
    assert any("bytes_accessed" in f
               for f in doc["derived_event_fields"])


def test_list_profile_events_live_run():
    """Without DIR, a tiny profiled run on the default (CPU here)
    backend supplies the namespace."""
    rc, text = _run(["--list-profile-events"])
    assert rc == 0
    doc = json.loads(text)
    assert doc["planes"], doc


def test_eigs_mode(matrix_file):
    rc, text = _run(
        ["--matrix", matrix_file, "--spmv-format", "csr",
         "--eigs", "2", "--eigs-tol", "1e-9",
         "--eigs-maxiter", "300"]
    )
    assert rc == 0
    doc = json.loads(text)
    e = doc["eigs"]
    # fixture spectrum: {1.0} (isolated 4,4 entry) plus the 3x3
    # tridiag(-1, 4, -1) eigenvalues 4 - 2 cos(k pi / 4)
    want = np.sort(np.concatenate(
        [[1.0], 4.0 - 2.0 * np.cos(np.arange(1, 4) * np.pi / 4)]))
    np.testing.assert_allclose(e["eigenvalues"], want[:2], rtol=1e-6)
    assert e["which"] == "smallest"
    assert e["iterations"] <= 300

    rc, text = _run(
        ["--matrix", matrix_file, "--spmv-format", "csr",
         "--eigs", "2", "--which", "largest", "--eigs-tol", "1e-9",
         "--eigs-maxiter", "300"]
    )
    assert rc == 0
    got = json.loads(text)["eigs"]["eigenvalues"]
    np.testing.assert_allclose(got, want[::-1][:2], rtol=1e-6)


def test_eigs_mode_guards(matrix_file):
    assert _run(["--triad", "100", "--eigs", "2"])[0] == 1
    # K must be below the matrix dimension
    assert _run(["--matrix", matrix_file, "--eigs", "4"])[0] == 1
    # unknown preconditioner class for eigs
    assert _run(["--matrix", matrix_file, "--eigs", "2",
                 "--precondition", "ic0"])[0] == 1


def test_eigs_jacobi_preconditioned(matrix_file):
    rc, text = _run(
        ["--matrix", matrix_file, "--spmv-format", "csr",
         "--eigs", "1", "--precondition", "jacobi",
         "--eigs-tol", "1e-9", "--eigs-maxiter", "300"]
    )
    assert rc == 0
    doc = json.loads(text)
    np.testing.assert_allclose(doc["eigs"]["eigenvalues"][0], 1.0,
                               rtol=1e-6)


def test_eigs_symmetric_storage_amg(tmp_path):
    # Symmetric STORAGE (one triangle) must expand for BOTH the
    # operator and the AMG hierarchy — a hierarchy built on the
    # stored triangle is a non-symmetric operator and converges to
    # wrong eigenpairs.  3x3 tridiag(-1, 2, -1): spectrum 2 -+ sqrt(2), 2.
    p = tmp_path / "sym.mtx"
    p.write_text("""%%MatrixMarket matrix coordinate real symmetric
3 3 5
1 1 2.0
2 1 -1.0
2 2 2.0
3 2 -1.0
3 3 2.0
""")
    want = np.sort(2.0 - 2.0 * np.cos(np.arange(1, 4) * np.pi / 4))
    for pre in ("none", "jacobi", "amg"):
        rc, text = _run(
            ["--matrix", str(p), "--spmv-format", "csr",
             "--eigs", "2", "--eigs-tol", "1e-8",
             "--precondition", pre, "--eigs-maxiter", "300"]
        )
        assert rc == 0, pre
        got = json.loads(text)["eigs"]["eigenvalues"]
        np.testing.assert_allclose(got, want[:2], rtol=1e-6,
                                   err_msg=pre)


def test_cg_nrhs_batched(matrix_file):
    rc, text = _run(
        ["--matrix", matrix_file, "--spmv-format", "csr",
         "--cg", "200", "--cg-tol", "1e-10", "--nrhs", "3"]
    )
    assert rc == 0
    doc = json.loads(text)["cg"]
    assert doc["nrhs"] == 3
    assert len(doc["iterations"]) == 3
    assert all(i <= 200 for i in doc["iterations"])
    assert all(e < 1e-5 for e in doc["solution_rms_error_vs_ones"])
    # jacobi-preconditioned variant
    rc, text = _run(
        ["--matrix", matrix_file, "--spmv-format", "csr",
         "--cg", "200", "--cg-tol", "1e-10", "--nrhs", "2",
         "--precondition", "jacobi"]
    )
    assert rc == 0
    doc = json.loads(text)["cg"]
    assert all(e < 1e-5 for e in doc["solution_rms_error_vs_ones"])
    # guards: wrong solver / unsupported preconditioner
    assert _run(["--matrix", matrix_file, "--cg", "10", "--nrhs", "2",
                 "--solver", "bicgstab"])[0] == 1
    assert _run(["--matrix", matrix_file, "--cg", "10", "--nrhs", "2",
                 "--precondition", "amg"])[0] == 1
