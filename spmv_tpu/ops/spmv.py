"""SpMV / SpMM — XLA formulation.

The portable compute path: works on CPU (fp64 correctness gate) and TPU,
and is the semantic specification the Pallas kernels
(spmv_tpu.ops.pallas_kernels) are tested against.

Design notes (TPU-first, cf. SURVEY.md section 7):

- No scatter, no atomics: CSR/COO reductions are segmented sums over
  row-sorted entries (``jax.ops.segment_sum`` with
  ``indices_are_sorted=True``), replacing the reference's per-thread
  workspaces (coo-matrix.cpp:248-285) and ``omp atomic`` scatters
  (287-309).
- ELL is a dense (rows, L) gather + row reduction — the layout the VPU
  actually likes; the hybrid format runs an ELL pass plus a COO-segment
  pass, like the reference's two-pass kernel (hybrid-matrix.cpp:535-567).
- Everything is shape-static and jit-compatible; padded entries are
  mathematically inert (see models.device) so no masking control flow
  is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spmv_tpu.models.device import (
    DeviceBsr,
    DeviceCsr,
    DeviceDia,
    DeviceEll,
    DeviceHybrid,
    DeviceWell,
    DeviceWellCw,
    LANE,
    SUBLANE,
)

__all__ = ["spmv", "spmv_padded", "spmm", "fast_spmv"]


def _csr_padded(A: DeviceCsr, x: jax.Array) -> jax.Array:
    prod = A.value * jnp.take(x, A.column_index, axis=0)
    return jax.ops.segment_sum(
        prod,
        A.row_ids,
        num_segments=A.padded_rows,
        indices_are_sorted=True,
    )


def _ell_padded(A: DeviceEll, x: jax.Array) -> jax.Array:
    return (A.value * jnp.take(x, A.column_index, axis=0)).sum(axis=1)


def _dia_padded(A: DeviceDia, x: jax.Array) -> jax.Array:
    """DIA SpMV as shifted contiguous slices — no gather at all.

    The XLA specification of the Pallas stencil kernel
    (ops.pallas_kernels.dia_spmv): for each static diagonal offset o,
    y += data[k] * x[i + o] over the valid window, realized as a
    dynamic_slice of a zero-padded x.  Offsets are static metadata, so
    the loop unrolls at trace time.
    """
    n = A.padded_rows
    min_off = min(A.offsets) if A.offsets else 0
    max_off = max(A.offsets) if A.offsets else 0
    front = max(0, -min_off)
    back = max(0, n + max_off - x.shape[0])
    xp = jnp.pad(x.astype(A.data.dtype), (front, back))
    y = jnp.zeros((n,), dtype=A.data.dtype)
    flat = A.data.reshape(A.data.shape[0], n)
    for k, off in enumerate(A.offsets):
        win = jax.lax.dynamic_slice(xp, (front + off,), (n,))
        y = y + flat[k] * win
    return y


def _well_padded(A: DeviceWell, x: jax.Array) -> jax.Array:
    """WELL SpMV, XLA formulation (the Pallas kernel's specification).

    Gathers through the same (window_start, local_index) addressing the
    kernel uses, then segment-sums chunk contributions into their y
    slices; the spill remainder rides the CSR segment path.
    """
    xf = x.astype(A.value.dtype)
    steps, _, k = A.window_start.shape
    ws = A.window_start.transpose(0, 2, 1).reshape(A.num_chunks, SUBLANE)
    if A.segment_rows is not None:
        # segmented devices store segment-relative window starts
        seg = jnp.repeat(A.segment_of_step, k)
        ws = ws + seg[:, None]
    xcol = ws[:, :, None] * LANE + A.local_index
    gathered = jnp.take(xf, xcol, mode="clip")     # (chunks, 8, LANE)
    contrib = (A.value * gathered).sum(axis=1)     # (chunks, LANE)
    # group_of_chunk is non-decreasing only in non-segmented packing
    # (inert pad chunks carry the run's last group); segmented packing
    # orders chunks (block, segment)-major, which can interleave groups.
    y = jax.ops.segment_sum(
        contrib,
        A.group_of_chunk.reshape(-1),
        num_segments=A.num_groups,
        indices_are_sorted=A.segment_rows is None,
    ).reshape(-1)
    if A.spill is not None:
        pad = y.shape[0] - A.spill.padded_rows
        sp = _csr_padded(A.spill, xf)
        if pad >= 0:
            sp = jnp.pad(sp, (0, pad))
        else:
            sp = sp[: y.shape[0]]
        # spill rows beyond num_rows are padding garbage; mask them
        mask = jnp.arange(y.shape[0]) < A.num_rows
        y = y + jnp.where(mask, sp, 0)
    return y


def _wellcw_gathered(lvl, xf):
    """Per-level (chunks, 8, LANE) products via the chunk-window
    addressing (see models.wellcw): column = (anchor*d + w)*128 + lane
    offset, with anchor4 flattened from its step-major SMEM staging."""
    a4 = lvl.anchor4.reshape(-1)                    # (chunks,)
    loc = lvl.local_index
    xcol = (a4[:, None, None] * lvl.d + (loc >> 7)) * LANE + (
        loc & (LANE - 1)
    )
    return lvl.value * jnp.take(xf, xcol, mode="clip")


def _cw_merged_split(mg):
    """Static (level_idx, pool_idx, level_groups) for a merged grid:
    which flat chunk indices are level vs pool chunks, and the level
    chunks' group ids (all static meta, computed host-side)."""
    import numpy as np

    off = np.arange(mg.num_blocks * mg.kl) % mg.kl
    blk = np.arange(mg.num_blocks * mg.kl) // mg.kl
    is_lvl = off < mg.lvl_per_block
    lvl_idx = np.nonzero(is_lvl)[0]
    pool_idx = np.nonzero(~is_lvl)[0]
    lvl_groups = blk[lvl_idx] * 64 + off[lvl_idx] // mg.cap
    return (jnp.asarray(lvl_idx), jnp.asarray(pool_idx),
            jnp.asarray(lvl_groups.astype(np.int32)),
            jnp.asarray((blk[pool_idx] * 64).astype(np.int32)))


def _wellcw_merged_xla(mg, xf, ncols, y):
    """Accumulate a merged grid's contribution into y (flat rows,
    (rows,) for SpMV or (rows, k) for SpMM)."""
    a4 = mg.anchor4.reshape(-1)
    loc = mg.local_index
    wmask = 8 * mg.d - 1
    xcol = (a4[:, None, None] * mg.d + ((loc >> 7) & wmask)) * LANE \
        + (loc & (LANE - 1))
    lvl_idx, pool_idx, lvl_groups, pool_base = _cw_merged_split(mg)
    lanes = jnp.arange(LANE, dtype=jnp.int32)
    if ncols is None:
        gathered = jnp.take(xf, xcol, mode="clip")
        prod = mg.value * gathered                # (C, 8, LANE)
    else:
        gathered = jnp.take(xf, xcol, axis=0, mode="clip")
        prod = mg.value[..., None] * gathered     # (C, 8, LANE, k)
    contrib = prod[lvl_idx].sum(axis=1)           # (CL, LANE[, k])
    num_groups = y.shape[0] // LANE
    # pad-block slots carry groups past num_groups; clip them onto
    # the last group (their contribution is exactly zero)
    lvl_groups = jnp.minimum(lvl_groups, num_groups - 1)
    ysum = jax.ops.segment_sum(
        contrib, lvl_groups, num_segments=num_groups,
        indices_are_sorted=True,
    )
    y = y + ysum.reshape(y.shape)
    # pool cells: per-cell rowmap in loc bits 14+
    ploc = loc[pool_idx]
    rm = pool_base[:, None, None] + (ploc >> 14)
    flat = (rm * LANE + lanes).reshape(-1)
    pprod = prod[pool_idx]
    if ncols is None:
        y = y.at[flat].add(pprod.reshape(-1), mode="drop")
    else:
        y = y.at[flat].add(pprod.reshape(-1, ncols), mode="drop")
    return y


def _wellcw_padded(A: DeviceWellCw, x: jax.Array) -> jax.Array:
    """WELL-CW SpMV, XLA formulation (the Pallas kernel's spec)."""
    from spmv_tpu.ops.pallas_kernels import _cw_value_dtype

    xf = x.astype(_cw_value_dtype(A))
    num_groups = A.num_groups
    y = jnp.zeros((num_groups, LANE), dtype=xf.dtype)
    if A.merged is not None:
        y = _wellcw_merged_xla(
            A.merged, xf, None, y.reshape(-1)
        ).reshape(num_groups, LANE)
    for lvl in A.levels:
        contrib = _wellcw_gathered(lvl, xf).sum(axis=1)
        y = y + jax.ops.segment_sum(
            contrib,
            lvl.group_of_chunk.reshape(-1),
            num_segments=num_groups,
            indices_are_sorted=True,
        )
    pools = ([] if A.pool is None else [A.pool]) + list(A.tail_pools)
    for pv in pools:
        prod = _wellcw_gathered(pv, xf)             # (chunks, 8, LANE)
        lanes = jnp.arange(LANE, dtype=jnp.int32)
        flat = pv.rowmap * LANE + lanes             # (chunks, 8, LANE)
        y = y.reshape(-1).at[flat.reshape(-1)].add(
            prod.reshape(-1), mode="drop"
        ).reshape(num_groups, LANE)
    y = y.reshape(-1)
    if A.remainder is not None:
        sp = _csr_padded(A.remainder, xf)
        pad = y.shape[0] - sp.shape[0]
        sp = jnp.pad(sp, (0, pad)) if pad >= 0 else sp[: y.shape[0]]
        mask = jnp.arange(y.shape[0]) < A.num_rows
        y = y + jnp.where(mask, sp, 0)
    return y


def spmv_padded(A, x: jax.Array) -> jax.Array:
    """y = A @ x including the padded tail rows (for sharded callers).

    The padded length is format-specific: CSR/ELL/DIA return
    ``A.padded_rows`` (CSR's final overflow row collects the padding
    garbage; the others pad with exact zeros), WELL and WELL-CW return
    ``num_groups * 128``, and BSR returns
    ``num_block_rows * block_rows``.  In every case the rows past
    ``A.num_rows`` are inert (zeros, or the CSR overflow row).
    """
    if isinstance(A, DeviceCsr):
        return _csr_padded(A, x)
    if isinstance(A, DeviceEll):
        return _ell_padded(A, x)
    if isinstance(A, DeviceHybrid):
        y = _ell_padded(A.ell, x)
        c = _csr_padded(A.coo, x)
        return y.at[: A.num_rows].add(c[: A.num_rows])
    if isinstance(A, DeviceDia):
        return _dia_padded(A, x)
    if isinstance(A, DeviceWell):
        return _well_padded(A, x)
    if isinstance(A, DeviceWellCw):
        return _wellcw_padded(A, x)
    if isinstance(A, DeviceBsr):
        # keep the padded-length contract (tail rows are exact zeros)
        y = spmm(A, x[:, None])[:, 0]
        return jnp.pad(
            y, (0, A.num_block_rows * A.block_rows - A.num_rows))
    raise TypeError(f"unsupported device matrix type: {type(A)!r}")


def spmv(A, x: jax.Array) -> jax.Array:
    """y = A @ x with the true (unpadded) row count."""
    return spmv_padded(A, x)[: A.num_rows]


def spmm(A, X: jax.Array) -> jax.Array:
    """Y = A @ X for X of shape (num_columns, k).

    The multi-vector SpMV (BASELINE config #4): the gather of X rows
    amortizes index traffic over k columns, which is also the
    TPU-friendly direction (row gathers are contiguous 128-lane loads).
    """
    if isinstance(A, DeviceCsr):
        prod = A.value[:, None] * jnp.take(X, A.column_index, axis=0)
        return jax.ops.segment_sum(
            prod,
            A.row_ids,
            num_segments=A.padded_rows,
            indices_are_sorted=True,
        )[: A.num_rows]
    if isinstance(A, DeviceEll):
        gathered = jnp.take(X, A.column_index, axis=0)  # (rows, L, k)
        return (A.value[..., None] * gathered).sum(axis=1)[: A.num_rows]
    if isinstance(A, DeviceHybrid):
        return spmm(A.ell, X)[: A.num_rows] + spmm(A.coo, X)[: A.num_rows]
    if isinstance(A, DeviceDia):
        # Shifted-slice formulation per diagonal, vectorized over the k
        # columns of X — still zero gathers.
        n = A.padded_rows
        min_off = min(A.offsets) if A.offsets else 0
        max_off = max(A.offsets) if A.offsets else 0
        front = max(0, -min_off)
        back = max(0, n + max_off - X.shape[0])
        xp = jnp.pad(X.astype(A.data.dtype), ((front, back), (0, 0)))
        y = jnp.zeros((n, X.shape[1]), dtype=A.data.dtype)
        flat = A.data.reshape(A.data.shape[0], n)
        for kd, off in enumerate(A.offsets):
            win = jax.lax.dynamic_slice(
                xp, (front + off, 0), (n, X.shape[1])
            )
            y = y + flat[kd][:, None] * win
        return y[: A.num_rows]
    if isinstance(A, DeviceBsr):
        # XLA spec of the Pallas MXU kernel: batched block matmuls +
        # segment-sum over block rows.
        k = X.shape[1]
        ncb = A.num_block_cols
        xf = X.astype(A.blocks.dtype)
        x3d = jnp.pad(
            xf, ((0, ncb * LANE - X.shape[0]), (0, 0))
        ).reshape(ncb, LANE, k)
        gathered = jnp.take(x3d, A.block_col, axis=0)  # (NB, 128, k)
        prods = jnp.einsum(
            "brc,bck->brk", A.blocks, gathered,
            preferred_element_type=A.blocks.dtype,
        )
        block_row = jnp.repeat(A.block_row, A.blocks_per_step)
        y = jax.ops.segment_sum(
            prods, block_row,
            num_segments=A.num_block_rows,
            indices_are_sorted=True,
        )
        return y.reshape(-1, k)[: A.num_rows]
    if isinstance(A, DeviceWell):
        xf = X.astype(A.value.dtype)
        ws = A.window_start.transpose(0, 2, 1).reshape(
            A.num_chunks, SUBLANE
        )
        if A.segment_rows is not None:
            seg = jnp.repeat(A.segment_of_step, A.chunks_per_step)
            ws = ws + seg[:, None]
        xcol = ws[:, :, None] * LANE + A.local_index
        gathered = jnp.take(xf, xcol, axis=0, mode="clip")
        contrib = (A.value[..., None] * gathered).sum(axis=1)
        y = jax.ops.segment_sum(
            contrib,
            A.group_of_chunk.reshape(-1),
            num_segments=A.num_groups,
            indices_are_sorted=A.segment_rows is None,
        ).reshape(-1, X.shape[1])[: A.num_rows]
        if A.spill is not None:
            y = y + spmm(A.spill, xf)[: A.num_rows]
        return y
    if isinstance(A, DeviceWellCw):
        from spmv_tpu.ops.pallas_kernels import _cw_value_dtype

        xf = X.astype(_cw_value_dtype(A))
        y = jnp.zeros((A.num_groups, LANE, X.shape[1]), dtype=xf.dtype)
        if A.merged is not None:
            y = _wellcw_merged_xla(
                A.merged, xf, X.shape[1],
                y.reshape(-1, X.shape[1]),
            ).reshape(A.num_groups, LANE, X.shape[1])
        for lvl in A.levels:
            a4 = lvl.anchor4.reshape(-1)
            loc = lvl.local_index
            xcol = (a4[:, None, None] * lvl.d + (loc >> 7)) * LANE + (
                loc & (LANE - 1)
            )
            gathered = jnp.take(xf, xcol, axis=0, mode="clip")
            contrib = (lvl.value[..., None] * gathered).sum(axis=1)
            y = y + jax.ops.segment_sum(
                contrib,
                lvl.group_of_chunk.reshape(-1),
                num_segments=A.num_groups,
                indices_are_sorted=True,
            )
        pools = ([] if A.pool is None else [A.pool]) \
            + list(A.tail_pools)
        for pv in pools:
            a4 = pv.anchor4.reshape(-1)
            loc = pv.local_index
            xcol = (a4[:, None, None] * pv.d + (loc >> 7)) * LANE + (
                loc & (LANE - 1)
            )
            gathered = jnp.take(xf, xcol, axis=0, mode="clip")
            prod = pv.value[..., None] * gathered  # (c, 8, LANE, k)
            lanes = jnp.arange(LANE, dtype=jnp.int32)
            flat = (pv.rowmap * LANE + lanes).reshape(-1)
            y = y.reshape(-1, X.shape[1]).at[flat].add(
                prod.reshape(-1, X.shape[1]), mode="drop"
            ).reshape(A.num_groups, LANE, X.shape[1])
        y = y.reshape(-1, X.shape[1])[: A.num_rows]
        if A.remainder is not None:
            y = y + spmm(A.remainder, xf)[: A.num_rows]
        return y
    raise TypeError(f"unsupported device matrix type: {type(A)!r}")


def fast_spmv(A, x: jax.Array) -> jax.Array:
    """y = A @ x through the fastest available path per format.

    DeviceDia and DeviceWell route to their Pallas kernels (interpret
    mode off-TPU); every other format uses the XLA formulation.  The
    plain :func:`spmv` remains the portable semantic specification.
    """
    import jax as _jax

    interpret = _jax.default_backend() == "cpu"
    if isinstance(A, DeviceDia):
        from spmv_tpu.ops.pallas_kernels import dia_spmv

        return dia_spmv(A, x, interpret=interpret)
    if isinstance(A, DeviceWell):
        from spmv_tpu.ops.pallas_kernels import well_spmv

        return well_spmv(A, x, interpret=interpret)
    if isinstance(A, DeviceWellCw):
        from spmv_tpu.ops.pallas_kernels import wellcw_spmv

        return wellcw_spmv(A, x, interpret=interpret)
    return spmv(A, x)
