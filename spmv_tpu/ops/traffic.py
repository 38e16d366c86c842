"""Traffic-isolation SpMV variants — stream-only and gather-only.

The reference ships executable kernel variants that separate the
*regular* (streamed: row structure + matrix values) from the
*irregular* (gathered: x[j[k]]) memory traffic of CSR SpMV so each can
be measured on hardware independently
(csr-matrix-spmv.cpp:35-61 ``csr_spmv_inner_loop_regular_traffic`` /
``csr_spmv_inner_loop_irregular_traffic``, wired as
``csr_matrix::spmv_regular_traffic`` / ``spmv_irregular_traffic``,
csr-matrix-spmv.cpp:120-146,191-211).

This module is the TPU analogue, and extends the idea to the formats
this framework actually runs (ELL, WELL) so the analytic
``Kernel.traffic_split`` can be validated per matrix on-device:

- ``spmv_regular_traffic(A, x)`` —
  ``y[i] = sum_k a[k]`` over the *stored* row (host alignment padding
  included, exactly like the reference's ``p[i]..p[i+1]`` loop).
  Streams the matrix values + row structure; never touches x.
- ``spmv_irregular_traffic(A, x)`` —
  ``y[i] = sum_k x[j[k]]`` over the stored row.  Issues the same
  gathers as the full kernel; never loads the value stream.

Semantics note: both variants run over the layout the full kernel
reads — stored (padded) entries included — because the point is to
reproduce the full kernel's traffic minus one stream, not to compute a
mathematically meaningful product.  The reference makes the same
choice implicitly: its variants loop over the aligned row extent.

Measurement companion: :func:`spmv_tpu.profile.traffic.measure_traffic_split`
times the full/regular/irregular triple and reports achieved rates
against the analytic byte model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spmv_tpu.errors import KernelError
from spmv_tpu.models.device import (
    DeviceCsr,
    DeviceEll,
    DeviceHybrid,
    DeviceWell,
    LANE,
    SUBLANE,
)

__all__ = [
    "spmv_regular_traffic",
    "spmv_irregular_traffic",
    "traffic_variant_bytes",
]


# ---------------------------------------------------------------- CSR

def _csr_regular(A: DeviceCsr) -> jax.Array:
    # Padding entries carry value 0 and the sacrificial overflow row,
    # so summing the full stored stream is exact for real rows.
    y = jax.ops.segment_sum(
        A.value, A.row_ids,
        num_segments=A.padded_rows, indices_are_sorted=True,
    )
    return y


def _csr_irregular(A: DeviceCsr, x: jax.Array) -> jax.Array:
    # Device-level padding entries land in the overflow row
    # (row_id == padded_rows - 1 >= num_rows), so their x[0] gathers
    # never reach a real row; host alignment padding is part of the
    # stored row by design (see module docstring).
    g = jnp.take(x, A.column_index, axis=0)
    return jax.ops.segment_sum(
        g, A.row_ids,
        num_segments=A.padded_rows, indices_are_sorted=True,
    )


# ---------------------------------------------------------------- ELL

def _ell_regular(A: DeviceEll) -> jax.Array:
    return A.value.sum(axis=1)


def _ell_irregular(A: DeviceEll, x: jax.Array) -> jax.Array:
    return jnp.take(x, A.column_index, axis=0).sum(axis=1)


# --------------------------------------------------------------- WELL

def _well_window_columns(A: DeviceWell) -> jax.Array:
    """The (chunks, 8, LANE) absolute x indices the kernel gathers."""
    steps, _, k = A.window_start.shape
    ws = A.window_start.transpose(0, 2, 1).reshape(A.num_chunks, SUBLANE)
    if A.segment_rows is not None:
        seg = jnp.repeat(A.segment_of_step, k)
        ws = ws + seg[:, None]
    return ws[:, :, None] * LANE + A.local_index


def _well_segment(contrib: jax.Array, A: DeviceWell) -> jax.Array:
    return jax.ops.segment_sum(
        contrib,
        A.group_of_chunk.reshape(-1),
        num_segments=A.num_groups,
        indices_are_sorted=A.segment_rows is None,
    ).reshape(-1)


def _well_regular(A: DeviceWell) -> jax.Array:
    y = _well_segment(A.value.sum(axis=1), A)
    if A.spill is not None:
        y = _add_spill(y, _csr_regular(A.spill), A.num_rows)
    return y


def _well_irregular(A: DeviceWell, x: jax.Array) -> jax.Array:
    xf = x.astype(A.value.dtype)
    gathered = jnp.take(xf, _well_window_columns(A), mode="clip")
    y = _well_segment(gathered.sum(axis=1), A)
    if A.spill is not None:
        y = _add_spill(y, _csr_irregular(A.spill, xf), A.num_rows)
    return y


def _add_spill(y: jax.Array, sp: jax.Array, num_rows: int) -> jax.Array:
    pad = y.shape[0] - sp.shape[0]
    sp = jnp.pad(sp, (0, pad)) if pad >= 0 else sp[: y.shape[0]]
    mask = jnp.arange(y.shape[0]) < num_rows
    return y + jnp.where(mask, sp, 0)


# ----------------------------------------------------------- dispatch

def spmv_regular_traffic(A, x: jax.Array) -> jax.Array:
    """Stream-only variant: ``y[i] = sum_k a[k]`` over the stored row.

    TPU re-expression of ``csr_matrix::spmv_regular_traffic``
    (csr-matrix-spmv.cpp:120-131,191-200).  ``x`` is accepted for
    signature symmetry and ignored, like the reference's unused
    ``x`` parameter.
    """
    del x
    if isinstance(A, DeviceCsr):
        y = _csr_regular(A)
    elif isinstance(A, DeviceEll):
        y = _ell_regular(A)
    elif isinstance(A, DeviceWell):
        y = _well_regular(A)
    elif isinstance(A, DeviceHybrid):
        ye = _ell_regular(A.ell)
        yc = _csr_regular(A.coo)
        y = _mix_hybrid(ye, yc, A)
    else:
        raise KernelError(
            f"traffic-isolation variants are not defined for "
            f"{type(A).__name__}"
        )
    return y[: A.num_rows] if y.shape[0] != A.num_rows else y


def spmv_irregular_traffic(A, x: jax.Array) -> jax.Array:
    """Gather-only variant: ``y[i] = sum_k x[j[k]]`` over the stored
    row — the same gathers the full kernel issues, without the value
    stream (csr-matrix-spmv.cpp:49-61,134-146,202-211)."""
    if isinstance(A, DeviceCsr):
        y = _csr_irregular(A, x)
    elif isinstance(A, DeviceEll):
        y = _ell_irregular(A, x)
    elif isinstance(A, DeviceWell):
        y = _well_irregular(A, x)
    elif isinstance(A, DeviceHybrid):
        ye = _ell_irregular(A.ell, x)
        yc = _csr_irregular(A.coo, x)
        y = _mix_hybrid(ye, yc, A)
    else:
        raise KernelError(
            f"traffic-isolation variants are not defined for "
            f"{type(A).__name__}"
        )
    return y[: A.num_rows] if y.shape[0] != A.num_rows else y


def _mix_hybrid(ye: jax.Array, yc: jax.Array, A: DeviceHybrid):
    n = max(ye.shape[0], yc.shape[0], A.num_rows)
    ye = jnp.pad(ye, (0, n - ye.shape[0]))
    yc = jnp.pad(yc, (0, n - yc.shape[0]))
    return (ye + yc)[: A.num_rows]


# --------------------------------------------------------- byte model

def traffic_variant_bytes(A, x_dtype=None) -> dict:
    """Analytic minimum HBM bytes each variant streams, for pricing
    the measured triple (full / regular / irregular).

    regular: row structure + values, plus the y write.
    irregular: row structure + column indices + the gathered x bytes
    (counted once per *unique* line in the analytic model's spirit; we
    report the raw gather volume — one element per stored entry — and
    the x footprint separately, because on TPU the gather's HBM cost
    depends on how much of x is resident).
    """
    import numpy as np

    vb = jnp.dtype(A.value.dtype).itemsize if hasattr(A, "value") else 4
    xb = jnp.dtype(x_dtype).itemsize if x_dtype is not None else vb
    ib = 4
    if isinstance(A, DeviceCsr):
        stored = int(A.padded_entries)
        struct = (A.padded_rows + 1) * ib
        val = stored * vb
        idx = stored * ib
    elif isinstance(A, DeviceEll):
        stored = int(A.padded_rows * A.padded_row_length)
        struct = 0
        val = stored * vb
        idx = stored * ib
    elif isinstance(A, DeviceWell):
        stored = int(np.prod(A.value.shape))
        struct = int(np.prod(A.window_start.shape)) * ib \
            + int(np.prod(A.group_of_chunk.shape)) * ib
        val = stored * vb
        idx = stored * ib
        if A.spill is not None:
            sp = traffic_variant_bytes(A.spill, x_dtype)
            struct += sp["structure_bytes"]
            val += sp["value_bytes"]
            idx += sp["index_bytes"]
            stored += sp["stored_entries"]
    elif isinstance(A, DeviceHybrid):
        e = traffic_variant_bytes(A.ell, x_dtype)
        c = traffic_variant_bytes(A.coo, x_dtype)
        stored = e["stored_entries"] + c["stored_entries"]
        struct = e["structure_bytes"] + c["structure_bytes"]
        val = e["value_bytes"] + c["value_bytes"]
        idx = e["index_bytes"] + c["index_bytes"]
    else:
        raise KernelError(
            f"traffic byte model not defined for {type(A).__name__}"
        )
    ybytes = A.num_rows * vb
    xfoot = A.num_columns * xb
    return {
        "stored_entries": stored,
        "structure_bytes": struct,
        "value_bytes": val,
        "index_bytes": idx,
        "gather_element_bytes": stored * xb,
        "x_footprint_bytes": xfoot,
        "y_bytes": ybytes,
        "regular_bytes": struct + val + ybytes,
        "irregular_bytes": struct + idx + min(stored * xb, xfoot)
        + ybytes,
        "full_bytes": struct + val + idx + min(stored * xb, xfoot)
        + ybytes,
    }
