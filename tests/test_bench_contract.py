"""bench.py driver contract: one JSON object with the required keys.

Runs the benchmark body on the CPU backend (bench falls back to a tiny
matrix + interpret-mode kernels there), so the contract the round
driver depends on is pinned without TPU hardware.
"""

import io
import json
import sys
from contextlib import redirect_stdout


def test_bench_contract_cpu():
    sys.path.insert(0, ".")
    import bench

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
