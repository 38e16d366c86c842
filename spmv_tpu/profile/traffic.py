"""On-device traffic-split measurement.

Times the full SpMV against its stream-only (regular) and gather-only
(irregular) variants (:mod:`spmv_tpu.ops.traffic`) and prices each leg
with the analytic byte model, so the per-matrix ``traffic_split`` the
roofline uses can be validated on hardware instead of trusted.

The reference runs the same experiment by timing
``csr_matrix::spmv_regular_traffic`` / ``spmv_irregular_traffic``
(csr-matrix-spmv.cpp:120-146,191-211) against the full kernel; on TPU
the three legs must each be chained through the timing harness
(profile.harness.time_kernel) with the loop-carried value feeding the
next iteration, or XLA hoists the loop-invariant matrix read out of
the timing loop entirely:

- full / irregular legs feed y back as the next x (the standard
  run_fn chaining);
- the regular leg never reads x, so the loop-carried value is a
  scalar that scales the value stream (``y = sum_k (a[k] * s)``),
  keeping the matrix read inside the loop at zero extra HBM cost.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from spmv_tpu.ops.traffic import (
    spmv_irregular_traffic,
    spmv_regular_traffic,
    traffic_variant_bytes,
)

__all__ = ["measure_traffic_split"]


def _fit(y, v):
    if y.shape == v.shape:
        return y
    if y.shape[0] >= v.shape[0]:
        return y[: v.shape[0]]
    return jnp.concatenate([y, v[y.shape[0]:]])


def measure_traffic_split(
    A,
    x: Optional[jnp.ndarray] = None,
    spmv_fn=None,
    runs: int = 5,
    machine=None,
) -> dict:
    """Time full / regular / irregular SpMV legs for device matrix
    ``A`` and report measured seconds + achieved GB/s against the
    analytic byte model.

    ``spmv_fn(A, x)``: the full kernel to compare against (defaults to
    the XLA formulation ``ops.spmv.spmv``, which is also what the
    variants are derived from, so full vs regular+irregular is an
    apples-to-apples split).  Returns a JSON-shaped dict.
    """
    from spmv_tpu.ops.spmv import spmv as _spmv
    from spmv_tpu.profile.harness import time_kernel

    if spmv_fn is None:
        spmv_fn = _spmv
    if x is None:
        x = jnp.ones((A.num_columns,), A.value.dtype
                     if hasattr(A, "value") else jnp.float32)

    def step_full(v, A):
        return _fit(spmv_fn(A, v[: A.num_columns]), v)

    def step_irregular(v, A):
        return _fit(spmv_irregular_traffic(A, v[: A.num_columns]), v)

    def step_regular(s, A):
        # s is a loop-carried scalar; scaling the value stream by it
        # defeats loop-invariant hoisting without touching x.
        y = spmv_regular_traffic(_scale_values(A, s), None)
        return y.sum() * jnp.asarray(1e-38, y.dtype) + jnp.asarray(
            1.0, y.dtype)

    t_full = time_kernel(step_full, (x, A), runs=runs)
    t_irr = time_kernel(step_irregular, (x, A), runs=runs)
    s0 = jnp.asarray(1.0, x.dtype)
    t_reg = time_kernel(step_regular, (s0, A), runs=runs)

    bytes_model = traffic_variant_bytes(A, x.dtype)
    tf = t_full.seconds_per_iteration
    tr = t_reg.seconds_per_iteration
    ti = t_irr.seconds_per_iteration
    out = {
        "format": getattr(A, "format_name", type(A).__name__),
        "rows": A.num_rows,
        "columns": A.num_columns,
        "stored_entries": bytes_model["stored_entries"],
        "seconds_full": tf,
        "seconds_regular": tr,
        "seconds_irregular": ti,
        "regular_fraction_of_full": tr / tf,
        "irregular_fraction_of_full": ti / tf,
        "additivity": (tr + ti) / tf,
        "analytic": bytes_model,
        "achieved_gbps": {
            "full": bytes_model["full_bytes"] / tf / 1e9,
            "regular": bytes_model["regular_bytes"] / tr / 1e9,
            "irregular": bytes_model["irregular_bytes"] / ti / 1e9,
        },
    }
    if machine is not None:
        # Price each leg with the machine model's streaming rate for
        # a roofline-style fraction per leg.
        rate = getattr(machine, "hbm_gbps", None)
        if rate:
            out["roofline_fraction"] = {
                "full": bytes_model["full_bytes"] / 1e9 / rate / tf,
                "regular":
                    bytes_model["regular_bytes"] / 1e9 / rate / tr,
                "irregular":
                    bytes_model["irregular_bytes"] / 1e9 / rate / ti,
            }
    return out


def _scale_values(A, s):
    """A with its value stream scaled by scalar ``s`` (same pytree
    class, so the variant dispatch is unchanged)."""
    import dataclasses

    from spmv_tpu.models.device import (
        DeviceCsr, DeviceEll, DeviceHybrid, DeviceWell,
    )

    if isinstance(A, (DeviceCsr, DeviceEll)):
        return dataclasses.replace(A, value=A.value * s)
    if isinstance(A, DeviceWell):
        spill = None if A.spill is None else dataclasses.replace(
            A.spill, value=A.spill.value * s)
        return dataclasses.replace(A, value=A.value * s, spill=spill)
    if isinstance(A, DeviceHybrid):
        return dataclasses.replace(
            A,
            ell=dataclasses.replace(A.ell, value=A.ell.value * s),
            coo=dataclasses.replace(A.coo, value=A.coo.value * s),
        )
    raise TypeError(type(A).__name__)
