"""Sample statistics and JSON output tests (reference: test_sample.cpp,
test_json_ostreambuf.cpp)."""

import json
import math

import numpy as np

from spmv_tpu.utils import compute_sample, json_dumps


def test_sample_statistics():
    s = compute_sample([2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0], unit="ns")
    assert s.size == 8
    assert s.min == 2.0
    assert s.max == 9.0
    assert s.mean == 5.0
    assert s.median == 4.5
    np.testing.assert_allclose(s.variance, 32.0 / 7.0)
    np.testing.assert_allclose(s.stddev, math.sqrt(32.0 / 7.0))


def test_sample_median_odd():
    assert compute_sample([3.0, 1.0, 2.0]).median == 2.0


def test_sample_json_shape():
    d = compute_sample([1.0, 2.0], unit="ns").to_json()
    # keys and order exactly as the reference's print_sample
    # (sample.hpp:138-165); "samples" is its name for the count
    assert [k for k in d] == [
        "samples", "min", "max", "mean", "median", "variance",
        "standard_deviation", "skewness", "kurtosis", "unit",
    ]


def test_json_nan_inf_rendering():
    out = json_dumps({"a": float("nan"), "b": float("inf"), "c": 1.5})
    parsed = json.loads(out)  # must be *valid* JSON
    assert parsed == {"a": "nan", "b": "inf", "c": 1.5}


def test_json_numpy_sanitization():
    out = json_dumps({"v": np.arange(3), "s": np.float64(2.5)})
    assert json.loads(out) == {"v": [0, 1, 2], "s": 2.5}
