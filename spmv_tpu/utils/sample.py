"""Sample statistics over repeated measurement runs.

Equivalent of the reference's src/util/sample.hpp:11-135: given the raw
per-run observations, report size / min / max / mean / median / variance /
standard deviation / skewness / kurtosis, and render them as a JSON block
with a unit (reference print_sample, src/util/sample.hpp:138-165).

Note the reference's median has a dead branch (``n % 1 == 0`` is always
true, src/util/sample.hpp:51) so it always averages the two middle
elements' bucket; we implement the *correct* median (even n: mean of the
two middle order statistics; odd n: the middle one), which coincides with
the reference's output for even n.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

__all__ = ["Sample", "compute_sample"]


@dataclasses.dataclass(frozen=True)
class Sample:
    """Summary statistics of a sample of observations."""

    size: int
    values: tuple
    unit: str = ""

    @property
    def min(self) -> float:
        return min(self.values)

    @property
    def max(self) -> float:
        return max(self.values)

    @property
    def mean(self) -> float:
        return math.fsum(self.values) / self.size

    @property
    def median(self) -> float:
        s = sorted(self.values)
        n = self.size
        if n % 2 == 0:
            return 0.5 * (s[n // 2 - 1] + s[n // 2])
        return s[n // 2]

    def _central_moment(self, k: int) -> float:
        mu = self.mean
        return math.fsum((v - mu) ** k for v in self.values) / self.size

    @property
    def variance(self) -> float:
        # Unbiased sample variance (n-1 denominator), matching the
        # reference (src/util/sample.hpp:60-71).
        if self.size < 2:
            return 0.0
        mu = self.mean
        return math.fsum((v - mu) ** 2 for v in self.values) / (self.size - 1)

    @property
    def stddev(self) -> float:
        return math.sqrt(self.variance)

    @property
    def skewness(self) -> float:
        # Adjusted Fisher-Pearson standardized moment coefficient, as in
        # the reference (src/util/sample.hpp:86-106).
        n = self.size
        if n < 3:
            return float("nan")
        m2 = self._central_moment(2)
        m3 = self._central_moment(3)
        if m2 == 0.0:
            return float("nan")
        g1 = m3 / m2 ** 1.5
        return math.sqrt(n * (n - 1)) / (n - 2) * g1

    @property
    def kurtosis(self) -> float:
        # Plain (non-excess) sample kurtosis m4/m2^2, as in the reference
        # (src/util/sample.hpp:108-126).
        n = self.size
        if n < 2:
            return float("nan")
        m2 = self._central_moment(2)
        m4 = self._central_moment(4)
        if m2 == 0.0:
            return float("nan")
        return m4 / (m2 * m2)

    def to_json(self, include_values: bool = False) -> dict:
        """JSON block in the shape of print_sample (sample.hpp:138-165)."""
        d = {
            "size": self.size,
            "min": self.min,
            "max": self.max,
            "mean": self.mean,
            "median": self.median,
            "variance": self.variance,
            "standard_deviation": self.stddev,
            "skewness": self.skewness,
            "kurtosis": self.kurtosis,
            "unit": self.unit,
        }
        if include_values:
            d["values"] = list(self.values)
        return d


def compute_sample(values: Sequence[float], unit: str = "") -> Sample:
    values = tuple(float(v) for v in values)
    if not values:
        raise ValueError("empty sample")
    return Sample(size=len(values), values=values, unit=unit)
