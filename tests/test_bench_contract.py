"""bench.py driver contract: one JSON object with the required keys.

Runs the benchmark body on the CPU backend (bench falls back to a tiny
matrix + interpret-mode kernels there), so the contract the round
driver depends on is pinned without TPU hardware.  Round-4 additions
(VERDICT r3 item 2): the --compile-only preflight and per-leg fault
isolation are pinned too, so one rider leg's failure can never again
zero the whole artifact (the BENCH_r03 failure mode).
"""

import importlib.util
import io
import json
import os
import sys
from contextlib import redirect_stdout

import pytest
# Long-running (VERDICT r3 item 9): excluded from the fast core;
# run with the full suite or -m slow.
pytestmark = pytest.mark.slow



def _load_bench():
    if "bench" in sys.modules:
        return sys.modules["bench"]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    spec = importlib.util.spec_from_file_location("bench", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_bench_contract_cpu():
    bench = _load_bench()
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench._run()
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 1
    doc = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in doc, key
    assert isinstance(doc["value"], (int, float))
    assert doc["detail"]["checksum_rel_err"] < 1e-4
    # all legs ran: no fault-isolation errors on a healthy run
    assert "leg_errors" not in doc, doc.get("leg_errors")
    for key in ("spmm_seconds", "bf16_seconds_per_spmv",
                "wellcw_seconds_per_spmv", "bsr_spmm_seconds",
                "file_driven"):
        assert key in doc["detail"], key


def test_bench_preflight_cpu():
    """--compile-only AOT-compiles every leg and exits 0."""
    bench = _load_bench()
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = bench._preflight()
    assert rc == 0
    lines = [json.loads(l) for l in buf.getvalue().splitlines()
             if l.strip()]
    summary = lines[-1]
    assert summary["preflight_ok"] is True
    legs = {d["leg"] for d in lines[:-1]}
    assert {"dia", "spmm", "bf16", "wellcw", "bsr"} <= legs
    assert all(d["ok"] for d in lines[:-1])


def test_bench_preflight_reports_broken_leg(monkeypatch):
    """A leg whose kernel fails to build/compile is reported with
    ok=False and a non-zero exit, instead of aborting the others —
    the preflight catches what BENCH_r03 hit at driver time."""
    import spmv_tpu.ops.pallas_kernels as pk

    bench = _load_bench()

    def boom(*a, **k):
        raise RuntimeError(
            "Scoped allocation ... exceeded scoped vmem limit (synthetic)")

    monkeypatch.setattr(pk, "bsr_spmm", boom)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = bench._preflight()
    assert rc == 1
    lines = [json.loads(l) for l in buf.getvalue().splitlines()
             if l.strip()]
    summary = lines[-1]
    assert summary["preflight_ok"] is False
    assert summary["failed"] == ["bsr"]
    by_leg = {d["leg"]: d for d in lines[:-1]}
    assert by_leg["bsr"]["ok"] is False
    assert "vmem" in by_leg["bsr"]["error"]
    assert by_leg["dia"]["ok"] and by_leg["wellcw"]["ok"]


def test_bench_rider_leg_fault_isolated(monkeypatch):
    """A rider leg (bsr) crashing yields a full artifact with the
    headline value intact plus '<leg>_error' detail — not rc=1."""
    import spmv_tpu.ops.pallas_kernels as pk

    bench = _load_bench()

    def boom(*a, **k):
        raise RuntimeError("synthetic bsr failure")

    monkeypatch.setattr(pk, "bsr_spmm", boom)
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench._run()
    doc = json.loads(buf.getvalue().strip())
    assert doc["value"] > 0
    assert doc["leg_errors"] == ["bsr"]
    assert "synthetic bsr failure" in doc["detail"]["bsr_error"]
    assert "wellcw_seconds_per_spmv" in doc["detail"]


def test_bench_wellcw_leg_still_gates(monkeypatch):
    """The scattered-path gate survives fault isolation: a crashed
    wellcw leg zeroes the artifact on TPU (VERDICT r2 item 2)."""
    import spmv_tpu.ops.pallas_kernels as pk

    bench = _load_bench()

    def boom(*a, **k):
        raise RuntimeError("synthetic wellcw failure")

    monkeypatch.setattr(pk, "wellcw_spmv", boom)
    buf = io.StringIO()
    with redirect_stdout(buf):
        try:
            # gate_wellcw=True forces the TPU gating decision on the
            # CPU backend's small shapes.
            bench._run(gate_wellcw=True)
        except Exception:
            pytest.fail("wellcw crash must gate, not raise")
    doc = json.loads(buf.getvalue().strip())
    assert doc["value"] == 0.0
    assert "wellcw gate failed" in doc["error"]
    assert "synthetic wellcw failure" in doc["error"]
