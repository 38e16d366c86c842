"""Device-side sparse matrix containers (JAX pytrees).

The host formats (numpy, exact reference layouts) convert to these
device containers, which are shaped for the TPU compute model rather
than for the reference's CPU kernels:

- indices are int32, values default to float32 on TPU (float64 is
  emulated and slow there) and float64 under x64 on CPU;
- arrays are padded to TPU-friendly sizes (lane = 128, sublane = 8)
  with zero-valued entries that are *mathematically inert* (value 0.0,
  in-bounds column 0, row id pointing at a sacrificial overflow row) —
  the TPU analogue of the reference's alignment padding
  (csr-matrix.cpp:193-243) and ELL sentinel handling, which on TPU is
  better expressed as multiply-by-zero than as control flow;
- CSR carries both ``row_ptr`` (for scalar-prefetch Pallas kernels and
  partitioning) and the expanded per-entry ``row_ids`` (for the XLA
  segment-sum formulation) — scatter/atomics do not exist on TPU, so
  every COO/CSR reduction is a segmented sum over sorted row ids
  (SURVEY.md: "no atomics -> segmented reduction").

All containers are registered pytrees: they pass through jit / shard_map
/ scan transparently with static shape metadata.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.errors import MatrixError
from spmv_tpu.models.coo import CooMatrix
from spmv_tpu.models.csr import CsrMatrix
from spmv_tpu.models.dia import DiaMatrix
from spmv_tpu.models.ell import EllMatrix, ELL_PAD_SENTINEL
from spmv_tpu.models.hybrid import HybridMatrix
from spmv_tpu.models.well import WellMatrix

__all__ = [
    "DeviceCsr",
    "DeviceDia",
    "DeviceEll",
    "DeviceHybrid",
    "DeviceWell",
    "DeviceWellCw",
    "DeviceCwLevel",
    "DeviceCwPool",
    "DeviceBsr",
    "device_put_matrix",
    "default_value_dtype",
    "round_up",
]

LANE = 128
SUBLANE = 8


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def default_value_dtype():
    """float64 when x64 is enabled (CPU correctness gate), else float32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["row_ptr", "row_ids", "column_index", "value"],
    meta_fields=["num_rows", "num_columns", "num_entries", "padded_rows",
                 "padded_entries"],
)
@dataclasses.dataclass(frozen=True)
class DeviceCsr:
    """CSR in segment-sum form.

    ``row_ids``/``column_index``/``value`` have length ``padded_entries``
    (a multiple of LANE*SUBLANE); padding entries carry
    ``row_id == padded_rows - 1`` (a sacrificial overflow row *beyond*
    num_rows), column 0 and value 0.  ``row_ptr`` has length
    ``padded_rows + 1``.
    """

    num_rows: int
    num_columns: int
    num_entries: int        # real nonzeros
    padded_rows: int
    padded_entries: int
    row_ptr: jax.Array      # (padded_rows + 1,) int32
    row_ids: jax.Array      # (padded_entries,) int32, sorted ascending
    column_index: jax.Array  # (padded_entries,) int32
    value: jax.Array        # (padded_entries,) value dtype

    format_name = "csr"

    @classmethod
    def from_host(
        cls,
        m: CsrMatrix,
        dtype=None,
        pad_rows_to: int = SUBLANE,
        pad_entries_to: int = LANE * SUBLANE,
    ) -> "DeviceCsr":
        dtype = dtype or default_value_dtype()
        stored = int(m.row_ptr[-1])
        padded_entries = max(round_up(stored, pad_entries_to), pad_entries_to)
        # One extra overflow row swallows the padding entries' partial
        # sums; pad the row count past it to the requested multiple.
        padded_rows = max(round_up(m.num_rows + 1, pad_rows_to), pad_rows_to)

        row_ids = np.full(padded_entries, padded_rows - 1, dtype=np.int32)
        row_ids[:stored] = np.repeat(
            np.arange(m.num_rows, dtype=np.int32), np.diff(m.row_ptr)
        )
        cols = np.zeros(padded_entries, dtype=np.int32)
        cols[:stored] = m.column_index
        vals = np.zeros(padded_entries, dtype=np.float64)
        vals[:stored] = m.value

        row_ptr = np.full(padded_rows + 1, stored, dtype=np.int32)
        row_ptr[: m.num_rows + 1] = m.row_ptr
        row_ptr[-1] = padded_entries  # overflow row owns the padding

        return cls(
            num_rows=m.num_rows,
            num_columns=m.num_columns,
            num_entries=m.num_entries,
            padded_rows=padded_rows,
            padded_entries=padded_entries,
            row_ptr=jnp.asarray(row_ptr),
            row_ids=jnp.asarray(row_ids),
            column_index=jnp.asarray(cols),
            value=jnp.asarray(vals, dtype=dtype),
        )

    @classmethod
    def from_coo_host(cls, m: CooMatrix, dtype=None, **kw) -> "DeviceCsr":
        """COO -> device: sort by row and reuse the CSR segment form.

        The TPU re-expression of the reference's COO kernels: both the
        per-thread-workspace reduction (coo-matrix.cpp:248-285) and the
        atomic scatter (287-309) become a sort + segmented sum.
        """
        order = np.argsort(m.row_index, kind="stable")
        rows = m.row_index[order]
        lengths = np.bincount(rows, minlength=m.num_rows)
        row_ptr = np.zeros(m.num_rows + 1, dtype=np.int64)
        np.cumsum(lengths, out=row_ptr[1:])
        host = CsrMatrix(
            m.num_rows, m.num_columns, m.num_entries, 1,
            row_ptr, m.column_index[order], m.value[order],
        )
        return cls.from_host(host, dtype=dtype, **kw)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["column_index", "value"],
    meta_fields=["num_rows", "num_columns", "num_entries", "row_length",
                 "padded_rows", "padded_row_length"],
)
@dataclasses.dataclass(frozen=True)
class DeviceEll:
    """ELLPACK: dense (padded_rows, padded_row_length) index/value tiles.

    The sentinel/skip-padding variant is host-side control flow that has
    no place on a vector unit; device padding is always value-0 +
    in-bounds column, so padded slots multiply to zero.
    """

    num_rows: int
    num_columns: int
    num_entries: int
    row_length: int
    padded_rows: int
    padded_row_length: int
    column_index: jax.Array  # (padded_rows, padded_row_length) int32
    value: jax.Array         # (padded_rows, padded_row_length)

    format_name = "ell"

    @classmethod
    def from_host(
        cls,
        m: EllMatrix,
        dtype=None,
        pad_rows_to: int = SUBLANE,
        pad_row_length_to: int = 1,
    ) -> "DeviceEll":
        dtype = dtype or default_value_dtype()
        pr = max(round_up(m.num_rows, pad_rows_to), pad_rows_to)
        pl = max(round_up(m.row_length, pad_row_length_to), 1)

        cols = np.zeros((pr, pl), dtype=np.int32)
        vals = np.zeros((pr, pl), dtype=np.float64)
        src_cols = m.column_index
        if m.skip_padding:
            # Replace sentinels with an inert in-bounds column.
            src_cols = np.where(src_cols == ELL_PAD_SENTINEL, 0, src_cols)
        cols[: m.num_rows, : m.row_length] = src_cols
        vals[: m.num_rows, : m.row_length] = m.value

        return cls(
            num_rows=m.num_rows,
            num_columns=m.num_columns,
            num_entries=m.num_entries,
            row_length=m.row_length,
            padded_rows=pr,
            padded_row_length=pl,
            column_index=jnp.asarray(cols),
            value=jnp.asarray(vals, dtype=dtype),
        )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ell", "coo"],
    meta_fields=["num_rows", "num_columns", "num_entries"],
)
@dataclasses.dataclass(frozen=True)
class DeviceHybrid:
    """Hybrid: an ELL part plus a COO remainder in segment-sum form."""

    num_rows: int
    num_columns: int
    num_entries: int
    ell: DeviceEll
    coo: DeviceCsr

    format_name = "hybrid"

    @classmethod
    def from_host(cls, m: HybridMatrix, dtype=None, **kw) -> "DeviceHybrid":
        ell_host = EllMatrix(
            m.num_rows, m.num_columns, m.num_ell_entries,
            max(m.ell_row_length, 1),
            m.ell_column_index
            if m.ell_row_length > 0
            else np.zeros((m.num_rows, 1), dtype=np.int32),
            m.ell_value
            if m.ell_row_length > 0
            else np.zeros((m.num_rows, 1)),
            m.ell_skip_padding,
        )
        coo_host = CooMatrix(
            m.num_rows, m.num_columns, m.num_coo_entries,
            m.coo_row_index, m.coo_column_index, m.coo_value,
        )
        return cls(
            num_rows=m.num_rows,
            num_columns=m.num_columns,
            num_entries=m.num_entries,
            ell=DeviceEll.from_host(ell_host, dtype=dtype),
            coo=DeviceCsr.from_coo_host(coo_host, dtype=dtype),
        )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data"],
    meta_fields=["num_rows", "num_columns", "num_entries", "offsets",
                 "padded_rows"],
)
@dataclasses.dataclass(frozen=True)
class DeviceDia:
    """DIA in 2-D vector layout for the Pallas stencil kernel.

    A length-n vector index i maps to (sublane-row, lane) = (i // LANE,
    i % LANE); ``data`` holds each diagonal in that layout,
    ``data[k, r, l] = A[i, i + offsets[k]]`` for ``i = r*LANE + l`` —
    so an x access at offset ``o = s*LANE + t`` is a row shift by s
    plus a lane roll by t, both vectorizable (no gather; see
    models.dia module docstring).

    ``offsets`` is a static tuple: the Pallas kernel specializes on it
    at trace time.  ``padded_rows`` is a multiple of LANE*SUBLANE.
    """

    num_rows: int
    num_columns: int
    num_entries: int
    offsets: tuple            # (D,) python ints, static, sorted
    padded_rows: int          # multiple of LANE * SUBLANE
    data: jax.Array           # (D, padded_rows // LANE, LANE)

    format_name = "dia"

    @property
    def num_diagonals(self) -> int:
        return len(self.offsets)

    @classmethod
    def from_host(
        cls,
        m: DiaMatrix,
        dtype=None,
        pad_rows_to: int = LANE * SUBLANE,
    ) -> "DeviceDia":
        dtype = dtype or default_value_dtype()
        pad_rows_to = round_up(pad_rows_to, LANE * SUBLANE)
        pr = max(round_up(m.num_rows, pad_rows_to), pad_rows_to)
        d = m.offsets.size
        data = np.zeros((d, pr), dtype=np.float64)
        data[:, : m.num_rows] = m.data
        return cls(
            num_rows=m.num_rows,
            num_columns=m.num_columns,
            num_entries=m.num_entries,
            offsets=tuple(int(o) for o in m.offsets),
            padded_rows=pr,
            data=jnp.asarray(
                data.reshape(d, pr // LANE, LANE), dtype=dtype
            ),
        )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["value", "local_index", "window_start", "group_of_chunk",
                 "block_of_step", "segment_of_step", "spill"],
    meta_fields=["num_rows", "num_columns", "num_entries", "window_rows",
                 "num_chunks", "num_groups", "chunks_per_step",
                 "blocks_per_out", "segment_rows"],
)
@dataclasses.dataclass(frozen=True)
class DeviceWell:
    """WELL (windowed sliced-ELL) on device — see models.well.

    ``value``/``local_index`` are (chunks, 8 slots, 128 rows) tiles;
    each chunk's x accesses lie in a 128*window_rows column window
    starting at x2d row ``window_start[t]``; ``group_of_chunk[t]`` is
    the 128-row group the chunk accumulates into.  ``spill`` is the
    out-of-window remainder in CSR segment form (or None).
    """

    num_rows: int
    num_columns: int
    num_entries: int
    window_rows: int
    num_chunks: int           # padded: multiple of chunks_per_step,
                              # and no step spans two y blocks
    num_groups: int
    chunks_per_step: int      # K: chunks fused into one grid step
    blocks_per_out: int       # B: 8-group blocks per output tile
    segment_rows: Optional[int]  # x rows staged per segment, or None
                                 # for whole-x-in-VMEM mode
    value: jax.Array          # (chunks, 8, LANE)
    local_index: jax.Array    # (chunks, 8, LANE) int32
    window_start: jax.Array   # (steps, 8, K) int32 per-slot, staged
                              # into SMEM one step at a time;
                              # segment-relative in segmented mode
    group_of_chunk: jax.Array  # (steps, 1, K) int32
    block_of_step: jax.Array  # (steps,) int32 — y block per step
    segment_of_step: Optional[jax.Array]  # (steps,) int32 x start row
    spill: Optional[DeviceCsr]

    format_name = "well"

    @classmethod
    def from_host(
        cls, m: WellMatrix, dtype=None, chunks_per_step: int = 8,
        segment_rows: Optional[int] = None, blocks_per_out: int = 1,
    ) -> "DeviceWell":
        """Device conversion.

        ``segment_rows``: when set, the kernel streams x through a
        sliding VMEM segment of that many 128-wide rows instead of
        holding all of x — chunks whose windows do not fit their
        segment move to the CSR spill.  Lifts the whole-x VMEM limit
        for banded/reordered matrices of any size.
        """
        dtype = dtype or default_value_dtype()
        if jnp.dtype(dtype).itemsize < 4:
            # The WELL kernels accumulate in the value dtype and rely on
            # dynamic single-row x loads + pltpu.roll, both of which are
            # 32-bit-only on this Mosaic (and measured 2x slower when
            # forced via paired 16-row tiles — experiments/RESULTS.md).
            raise MatrixError(
                "DeviceWell requires a >=32-bit value dtype; "
                f"got {jnp.dtype(dtype).name}. Use float32, or DIA for "
                "bfloat16 storage."
            )
        if segment_rows is None:
            # whole-x mode needs x resident in VMEM: switch to
            # segment streaming automatically when it cannot fit
            x_bytes = (-(-m.num_columns // LANE) + m.window_rows + 1) \
                * LANE * jnp.dtype(dtype).itemsize
            if x_bytes > 8 * 1024 * 1024:
                # large-x defaults: wider segments + folded output
                # blocks amortize the per-grid-step overhead
                segment_rows = 4096
                if blocks_per_out == 1 and chunks_per_step == 8:
                    blocks_per_out = 4
                    chunks_per_step = 32

        k = max(int(chunks_per_step), 1)
        b_out = max(int(blocks_per_out), 1)
        grp = np.asarray(m.group_of_chunk)
        ws_full = np.asarray(m.window_start).copy()   # (chunks, 8)
        value_full = np.asarray(m.value).copy()
        loc_full = np.asarray(m.local_index)

        sp_r, sp_c, sp_v = [], [], []
        seg_id = None
        if segment_rows is not None:
            seg = int(segment_rows)
            active = (value_full != 0).any(axis=2) | (
                loc_full != 0
            ).any(axis=2)                              # (chunks, 8)
            ws_act = np.where(
                active, ws_full, np.iinfo(np.int32).max
            )
            smin = ws_act.min(axis=1)
            has = active.any(axis=1)
            smin = np.where(has, smin, 0)
            smax = np.where(
                active, ws_full, np.iinfo(np.int32).min
            ).max(axis=1)
            smax = np.where(has, smax, 0)
            # One segment per 8-group OUTPUT BLOCK (so runs never
            # fragment and chunks_per_step stays effective), starting
            # at the block's minimum window row — segment starts need
            # no alignment, so any block whose windows span at most
            # seg rows fits entirely.
            blocks_of = np.asarray(m.group_of_chunk) // (
                SUBLANE * b_out
            )
            nblk = int(blocks_of.max()) + 1 if blocks_of.size else 1
            blk_min = np.full(nblk, np.iinfo(np.int64).max)
            np.minimum.at(
                blk_min, blocks_of,
                np.where(has, smin, np.iinfo(np.int64).max),
            )
            # blocks whose chunks are all inert never updated blk_min
            blk_min = np.where(
                blk_min == np.iinfo(np.int64).max, 0, blk_min
            )
            # Quantizing starts to a half-segment grid lets adjacent
            # blocks share a segment (one DMA amortizes over many
            # steps).  The lowered start costs up to qs-1 rows of the
            # window, so the guarantee is: spans <= seg/2 always fit;
            # wider spans may spill some slots to the CSR path.
            qs = max(seg // 2, 1)
            seg_start = (blk_min[blocks_of] // qs) * qs
            seg_start = np.where(has, seg_start, 0)
            # slots whose window still escapes spill INDIVIDUALLY
            lo_ok = ws_full >= seg_start[:, None]
            hi_ok = ws_full <= (seg_start + seg)[:, None]
            bad = active & ~(lo_ok & hi_ok)
            for c in np.nonzero(bad.any(axis=1))[0]:
                for sl in np.nonzero(bad[c])[0]:
                    ln = np.nonzero(value_full[c, sl] != 0)[0]
                    sp_r.extend((grp[c] * LANE + ln).tolist())
                    sp_c.extend(
                        (int(ws_full[c, sl]) * LANE
                         + loc_full[c, sl, ln]).tolist()
                    )
                    sp_v.extend(value_full[c, sl, ln].tolist())
                    value_full[c, sl] = 0.0
            ws_full = np.where(
                active & ~bad,
                ws_full - seg_start[:, None],
                0,
            ).astype(np.int32)
            ws_full = np.maximum(ws_full, 0)
            seg_id = seg_start

        spill = None
        spill_host = m.spill
        if sp_r:
            rr, cc, vv = list(sp_r), list(sp_c), list(sp_v)
            if spill_host is not None:
                old_rows = np.repeat(
                    np.arange(spill_host.num_rows, dtype=np.int64),
                    np.diff(spill_host.row_ptr),
                )
                rr.extend(old_rows.tolist())
                cc.extend(
                    np.asarray(spill_host.column_index).tolist()
                )
                vv.extend(np.asarray(spill_host.value).tolist())
            order = np.lexsort((cc, rr))
            r = np.asarray(rr, dtype=np.int64)[order]
            c = np.asarray(cc, dtype=np.int64)[order]
            v = np.asarray(vv, dtype=np.float64)[order]
            lengths = np.bincount(r, minlength=m.num_rows)
            ptr = np.zeros(m.num_rows + 1, dtype=np.int64)
            np.cumsum(lengths, out=ptr[1:])
            spill_host = CsrMatrix(
                m.num_rows, m.num_columns, int(r.size), 1,
                ptr, c.astype(np.int32), v,
            )
        if spill_host is not None:
            spill = DeviceCsr.from_host(spill_host, dtype=dtype)

        # Pad each chunk run to a multiple of K with inert chunks so
        # one grid step never spans two output blocks, and (segmented
        # mode) never spans two x segments.
        blocks = grp // (SUBLANE * b_out)
        run_key = (
            blocks.astype(np.int64) if seg_id is None
            else blocks.astype(np.int64) * (int(seg_id.max()) + 2)
            + seg_id
        )  # seg_id holds per-chunk segment START rows in segmented mode
        val_parts, loc_parts, ws_parts, grp_parts = [], [], [], []
        blk_steps, seg_steps = [], []
        # run_key has block as the high digit: sorting by it keeps
        # blocks contiguous AND groups same-segment chunks within one
        idx = np.argsort(run_key, kind="stable")
        i = 0
        while i < idx.size:
            j = i
            while j < idx.size and run_key[idx[j]] == run_key[idx[i]]:
                j += 1
            sel = idx[i:j]
            c = sel.size
            pad = (-c) % k
            val_parts.append(value_full[sel])
            loc_parts.append(loc_full[sel])
            ws_parts.append(ws_full[sel])
            grp_parts.append(grp[sel])
            if pad:
                val_parts.append(np.zeros(
                    (pad,) + value_full.shape[1:], value_full.dtype
                ))
                loc_parts.append(np.zeros(
                    (pad,) + loc_full.shape[1:], np.int32
                ))
                ws_parts.append(np.zeros((pad, SUBLANE), np.int32))
                # Inert pad chunks carry the run's LAST real group so the
                # flattened group_of_chunk stays non-decreasing: the XLA
                # WELL paths feed it to segment_sum(indices_are_sorted=True)
                # (ops/spmv.py), which is undefined for unsorted indices.
                # (well_shard.py uses the same convention.)
                grp_parts.append(np.full(
                    pad, int(grp[sel[-1]]), dtype=np.int32,
                ))
            nsteps = (c + pad) // k
            blk_steps.extend([int(blocks[sel[0]])] * nsteps)
            if seg_id is not None:
                seg_steps.extend([int(seg_id[sel[0]])] * nsteps)
            i = j

        value = np.concatenate(val_parts)
        local_index = np.concatenate(loc_parts)
        window_start = np.concatenate(ws_parts)        # (chunks, 8)
        group_of_chunk = np.concatenate(grp_parts)     # (chunks,)
        steps = value.shape[0] // k
        # step-major SMEM staging layout: [step, slot, chunk-in-step]
        window_start = np.ascontiguousarray(
            window_start.reshape(steps, k, SUBLANE).transpose(0, 2, 1)
        ).astype(np.int32)
        group_of_chunk = group_of_chunk.reshape(steps, 1, k)

        return cls(
            num_rows=m.num_rows,
            num_columns=m.num_columns,
            num_entries=m.num_entries,
            window_rows=m.window_rows,
            num_chunks=int(value.shape[0]),
            num_groups=m.num_groups,
            chunks_per_step=k,
            blocks_per_out=b_out,
            segment_rows=(None if segment_rows is None
                          else int(segment_rows)),
            value=jnp.asarray(value, dtype=dtype),
            local_index=jnp.asarray(local_index),
            window_start=jnp.asarray(window_start),
            group_of_chunk=jnp.asarray(group_of_chunk),
            block_of_step=jnp.asarray(
                np.asarray(blk_steps, dtype=np.int32)
            ),
            segment_of_step=(
                None if seg_id is None
                else jnp.asarray(np.asarray(seg_steps, dtype=np.int32))
            ),
            spill=spill,
        )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["value", "local_index", "anchor4", "group_of_chunk",
                 "block_of_step"],
    meta_fields=["d", "num_chunks", "chunks_per_step", "xr4"],
)
@dataclasses.dataclass(frozen=True)
class DeviceCwLevel:
    """One WELL-CW level on device (see models.wellcw).

    ``anchor4``/``group_of_chunk`` are staged step-major for SMEM:
    (steps, 1, K).  ``xr4`` is the stride-d x-table row count the
    kernel slices from — fixed by num_columns and d, so retracing is
    shape-stable.
    """

    d: int
    num_chunks: int           # padded to chunks_per_step per block run
    chunks_per_step: int      # K
    xr4: int
    value: jax.Array          # (chunks, 8, 128)
    local_index: jax.Array    # (chunks, 8, 128) int32
    anchor4: jax.Array        # (steps, 1, K) int32
    group_of_chunk: jax.Array  # (steps, 1, K) int32
    block_of_step: jax.Array  # (steps,) int32


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["value", "local_index", "anchor4", "rowmap",
                 "block_of_step"],
    meta_fields=["d", "num_chunks", "chunks_per_step", "xr4",
                 "out_rows"],
)
@dataclasses.dataclass(frozen=True)
class DeviceCwPool:
    """Pooled WELL-CW tail level on device (see models.wellcw
    CwPoolLevel): chunks shared across the ``out_rows`` groups of one
    output block; ``rowmap`` carries each cell's global group so the
    kernel scatters per slot row instead of per chunk."""

    d: int
    num_chunks: int
    chunks_per_step: int
    xr4: int
    value: jax.Array          # (chunks, 8, 128)
    local_index: jax.Array    # (chunks, 8, 128) int32
    anchor4: jax.Array        # (steps, 1, K) int32
    rowmap: jax.Array         # (chunks, 8, 128) int32: global group
    block_of_step: jax.Array  # (steps,) int32
    out_rows: int = 64        # groups per output block == pool width


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["value", "local_index", "anchor4"],
    meta_fields=["d", "kl", "cap", "lvl_per_block", "pool_per_block",
                 "num_blocks", "xr4"],
)
@dataclasses.dataclass(frozen=True)
class DeviceCwMerged:
    """Merged WELL-CW grid: level + stage-1 pool in ONE pallas grid.

    Probes 46-48: the separate level/pool calls pay ~280 ns/step grid
    overhead and poor DMA/compute interleaving; with the dense-slot
    level (every group emits exactly ``cap`` chunks) and the capped
    stage-1 pool (exactly ``pool_per_block`` padded chunks per
    64-group block), every output block is a single static
    ``kl = 64*cap + pool_per_block``-chunk grid step:

      - chunk kk < lvl_per_block: level chunk of group
        ``block*64 + kk//cap`` (static scalar-row scatter)
      - else: stage-1 pool chunk, relative rowmap folded into
        ``local_index`` bits 14..19 (per-lane scatter)

    One output visit per block, no type flags, no padding beyond the
    dense slots.  Measured on the scattered cliff case: 339 us vs
    297+135 us for the separate calls.
    """

    d: int
    kl: int                   # chunks per step = 64*cap + pool chunks
    cap: int                  # level rank cap (dense slots per group)
    lvl_per_block: int        # 64 * cap
    pool_per_block: int       # stage-1 pool chunks per block (0 = no
                              # pool merged)
    num_blocks: int
    xr4: int
    value: jax.Array          # (num_blocks*kl, 8, 128)
    local_index: jax.Array    # (num_blocks*kl, 8, 128) int32
    anchor4: jax.Array        # (num_blocks, 1, kl) int32


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["levels", "pool", "remainder", "merged",
                 "tail_pools"],
    meta_fields=["num_rows", "num_columns", "num_entries",
                 "num_groups", "blocks_per_out"],
)
@dataclasses.dataclass(frozen=True)
class DeviceWellCw:
    """WELL-CW (chunk-window WELL) on device — see models.wellcw.

    Two device layouts:

    - **merged** (preferred, probes 46-48): the single level's dense
      slots and the capped stage-1 pool interleave into ONE grid
      (`DeviceCwMerged`); ``levels``/``pool`` are empty.  Chosen when
      the matrix has one level, a matching-width (or no) pool, and
      the dense-slot padding waste is small.
    - **fallback**: per-level + pool pallas calls (``merged`` None),
      for multi-level specs, tiny matrices, or dense-waste cases.

    ``tail_pools`` are wide-pooled spill stages (own calls either
    way); ``remainder`` is the pathological-multiplicity tail on the
    XLA CSR path.
    """

    num_rows: int
    num_columns: int
    num_entries: int
    num_groups: int
    blocks_per_out: int       # B: 8-group blocks per output tile
    levels: tuple             # of DeviceCwLevel (fallback layout)
    pool: Optional["DeviceCwPool"]
    remainder: Optional[DeviceCsr]
    merged: Optional["DeviceCwMerged"] = None
    tail_pools: tuple = ()    # of DeviceCwPool (wide out_rows)

    format_name = "wellcw"

    @classmethod
    def from_host(
        cls, m, dtype=None, blocks_per_out: Optional[int] = None,
        chunks_per_step: Optional[int] = None,
    ) -> "DeviceWellCw":
        """Device conversion.  K (chunks per grid step) and B (output
        folding) default to the probe-28 sweet spot K=64/B=8, scaled
        down for small matrices so step padding stays negligible."""
        from spmv_tpu.models.wellcw import WellCwMatrix  # noqa: F401

        dtype = dtype or default_value_dtype()
        if jnp.dtype(dtype).itemsize < 4:
            raise MatrixError(
                "DeviceWellCw requires a >=32-bit value dtype; got "
                f"{jnp.dtype(dtype).name}."
            )
        num_groups = m.num_groups
        has_pool = getattr(m, "pool", None) is not None
        if blocks_per_out is None:
            blocks_per_out = max(1, min(8, num_groups // SUBLANE))
            if has_pool:
                # pooled chunks span POOL_GROUPS=64 groups = one
                # 8-block output tile; the out block must cover them
                blocks_per_out = 8
        elif has_pool and int(blocks_per_out) != 8:
            raise MatrixError(
                "a pooled WELL-CW matrix requires blocks_per_out=8 "
                "(pool spans 64 groups)")
        b_out = int(blocks_per_out)
        out_rows = SUBLANE * b_out
        num_blocks = -(-num_groups // (SUBLANE * b_out))

        tails = []
        for tp in getattr(m, "tail_pools", ()):
            # step size from the ACTUAL run lengths: a deep catch-all
            # ladder may hold thin 2-chunk runs (pad to 2^k near the
            # max run, not to the cap)
            counts = np.bincount(np.asarray(tp.pool_of_chunk))
            max_run = int(counts.max(initial=1))
            kp = 1 << int(np.ceil(np.log2(max(1, max_run))))
            kp = max(1, min(kp, 64))
            t_rows = int(tp.pool_groups)
            base_grp = np.asarray(tp.pool_of_chunk
                                  ).astype(np.int64) * t_rows
            tv, tl, tws, _g, tblks, trm = _pad_cw_steps(
                np.asarray(tp.value), np.asarray(tp.local_index),
                np.asarray(tp.anchor4), base_grp, num_groups,
                k=kp, out_rows=t_rows, rowmap=np.asarray(tp.rowmap))
            a_max = int(np.asarray(tp.anchor4).max(initial=0))
            xr4 = round_up(
                max(-(-m.num_columns // (LANE * tp.d)),
                    a_max + SUBLANE), SUBLANE)
            tails.append(DeviceCwPool(
                d=tp.d, num_chunks=int(tv.shape[0]),
                chunks_per_step=kp, xr4=int(xr4),
                value=jnp.asarray(tv, dtype=dtype),
                local_index=jnp.asarray(tl),
                anchor4=jnp.asarray(tws),
                rowmap=jnp.asarray(trm),
                block_of_step=jnp.asarray(tblks),
                out_rows=t_rows))

        remainder = None
        if m.remainder is not None:
            remainder = DeviceCsr.from_host(m.remainder, dtype=dtype)

        merged = None
        if chunks_per_step is None:
            merged = _build_cw_merged(m, dtype)
        if merged is not None:
            return cls(
                num_rows=m.num_rows,
                num_columns=m.num_columns,
                num_entries=m.num_entries,
                num_groups=num_groups,
                blocks_per_out=8,
                levels=(),
                pool=None,
                remainder=remainder,
                merged=merged,
                tail_pools=tuple(tails),
            )

        levels = []
        for lv in m.levels:
            if chunks_per_step is None:
                avg = lv.num_chunks / max(num_blocks, 1)
                k = 64 if avg >= 32 else 32 if avg >= 16 \
                    else 16 if avg >= 8 else 8
            else:
                k = int(chunks_per_step)
            value, loc, ws, grp2, blks = _pad_cw_steps(
                np.asarray(lv.value), np.asarray(lv.local_index),
                np.asarray(lv.anchor4), np.asarray(lv.group_of_chunk),
                num_groups, k=k, out_rows=out_rows)
            # stride-d table rows: anchors are band-adaptive (any
            # xt-row start), so the tables must cover both the whole
            # column space and the largest anchor's slice end.
            a_max = int(np.asarray(lv.anchor4).max(initial=0))
            xr4 = round_up(
                max(-(-m.num_columns // (LANE * lv.d)), a_max + SUBLANE),
                SUBLANE,
            )
            levels.append(DeviceCwLevel(
                d=lv.d,
                num_chunks=int(value.shape[0]),
                chunks_per_step=k,
                xr4=int(xr4),
                value=jnp.asarray(value, dtype=dtype),
                local_index=jnp.asarray(loc),
                anchor4=jnp.asarray(ws),
                group_of_chunk=jnp.asarray(grp2),
                block_of_step=jnp.asarray(blks),
            ))
        pool = None
        if has_pool:
            pl_ = m.pool
            if chunks_per_step is None:
                avg = pl_.num_chunks / max(num_blocks, 1)
                kp = 64 if avg >= 32 else 32 if avg >= 16 \
                    else 16 if avg >= 8 else 8
            else:
                kp = int(chunks_per_step)
            # pool_of_chunk indexes 64-group pools == output blocks,
            # so feeding base-group ids to the padder reuses its
            # block-run logic unchanged
            base_grp = np.asarray(pl_.pool_of_chunk
                                  ).astype(np.int64) * out_rows
            value, loc, ws, _grp2, blks, rm = _pad_cw_steps(
                np.asarray(pl_.value), np.asarray(pl_.local_index),
                np.asarray(pl_.anchor4), base_grp,
                num_groups, k=kp, out_rows=out_rows,
                rowmap=np.asarray(pl_.rowmap))
            a_max = int(np.asarray(pl_.anchor4).max(initial=0))
            xr4 = round_up(
                max(-(-m.num_columns // (LANE * pl_.d)),
                    a_max + SUBLANE),
                SUBLANE,
            )
            pool = DeviceCwPool(
                d=pl_.d,
                num_chunks=int(value.shape[0]),
                chunks_per_step=kp,
                xr4=int(xr4),
                value=jnp.asarray(value, dtype=dtype),
                local_index=jnp.asarray(loc),
                anchor4=jnp.asarray(ws),
                rowmap=jnp.asarray(rm),
                block_of_step=jnp.asarray(blks),
            )
        return cls(
            num_rows=m.num_rows,
            num_columns=m.num_columns,
            num_entries=m.num_entries,
            num_groups=num_groups,
            blocks_per_out=b_out,
            levels=tuple(levels),
            pool=pool,
            remainder=remainder,
            merged=None,
            tail_pools=tuple(tails),
        )


def _pad_cw_steps(value, loc, a4, grp, num_groups, k, out_rows,
                  rowmap=None):
    """Pad each output block's chunk run to a multiple of K with inert
    chunks (value 0, anchor 0) so one grid step never spans two output
    blocks; pad chunks carry the block's last group so group ids stay
    non-decreasing.  Returns step-staged (value, loc, ws, grp2,
    block_of_step[, rowmap]) — ``rowmap`` (pooled levels) is padded
    with each chunk's group id broadcast (inert cells scatter zero)."""
    # each output row of the (padded_groups, 128) result is one group,
    # so a block of out_rows output rows covers out_rows groups
    b_groups = out_rows
    blk = grp // out_rows
    num_blocks = -(-num_groups // b_groups)
    starts = np.searchsorted(blk, np.arange(num_blocks + 1))
    counts = np.diff(starts)
    padded = np.where(counts == 0, k, -(-counts // k) * k)
    out_start = np.concatenate([[0], np.cumsum(padded)])
    total = int(out_start[-1])
    value_o = np.zeros((total, SUBLANE, LANE), value.dtype)
    loc_o = np.zeros((total, SUBLANE, LANE), np.int32)
    a4_o = np.zeros(total, np.int32)
    gpad = np.minimum(
        np.arange(num_blocks) * b_groups + b_groups - 1,
        num_groups - 1).astype(np.int32)
    has = counts > 0
    gpad[has] = grp[starts[1:][has] - 1]
    grp_o = np.repeat(gpad, padded)
    pos = np.arange(value.shape[0]) - starts[:-1][blk] \
        + out_start[:-1][blk]
    value_o[pos] = value
    loc_o[pos] = loc
    a4_o[pos] = a4
    grp_o[pos] = grp
    blks = np.repeat(np.arange(num_blocks, dtype=np.int32),
                     padded // k)
    steps = total // k
    ws = a4_o.reshape(steps, 1, k)
    grp2 = grp_o.reshape(steps, 1, k)
    if rowmap is not None:
        rm_o = np.broadcast_to(
            grp_o[:, None, None], (total, SUBLANE, LANE)
        ).astype(np.int32).copy()
        rm_o[pos] = rowmap
        return value_o, loc_o, ws, grp2, blks, rm_o
    return value_o, loc_o, ws, grp2, blks


def _build_cw_merged(m, dtype):
    """Build the merged level+pool grid (DeviceCwMerged) when the
    host matrix fits the dense-slot pattern, else None.

    Eligible iff: exactly one level with recorded ranks, pool (if
    any) shares the level's window width and pools 64 groups with a
    mergeable cap, and the dense slots (round_up(ng,64) * cap per
    block) would waste <= 15% extra chunks over the packed level.
    """
    levels = getattr(m, "levels", ())
    if len(levels) != 1:
        return None
    lvl = levels[0]
    if not lvl.cap or lvl.rank_of_chunk is None:
        return None
    pool = getattr(m, "pool", None)
    if pool is not None and (
        pool.d != lvl.d or pool.pool_groups != 64
        or not (0 < pool.cap <= 64)
    ):
        return None
    if lvl.d > 16:
        return None               # rowmap fold needs loc bits >= 14
    ng = m.num_groups
    ng_pad = round_up(ng, 64)
    cap = int(lvl.cap)
    lvl_per = 64 * cap
    pool_per = int(pool.cap) if pool is not None else 0
    kl = lvl_per + pool_per
    if kl > 256:
        return None               # unroll sanity bound
    dense_total = ng_pad * cap
    if dense_total > max(lvl.num_chunks, 1) * 1.15:
        return None               # zero-filled slots would dominate
    S = ng_pad // 64

    value = np.zeros((S * kl, SUBLANE, LANE),
                     dtype=np.asarray(lvl.value).dtype)
    loc = np.zeros((S * kl, SUBLANE, LANE), dtype=np.int32)
    a4 = np.zeros(S * kl, dtype=np.int32)

    grp = np.asarray(lvl.group_of_chunk).astype(np.int64)
    rank = np.asarray(lvl.rank_of_chunk).astype(np.int64)
    didx = (grp // 64) * kl + (grp % 64) * cap + rank
    value[didx] = np.asarray(lvl.value)
    loc[didx] = np.asarray(lvl.local_index)
    a4[didx] = np.asarray(lvl.anchor4)
    a_max = int(np.asarray(lvl.anchor4).max(initial=0))

    if pool is not None:
        base_grp = np.asarray(pool.pool_of_chunk
                              ).astype(np.int64) * 64
        pv, plc, pws, _g, _blks, prm = _pad_cw_steps(
            np.asarray(pool.value), np.asarray(pool.local_index),
            np.asarray(pool.anchor4), base_grp, ng,
            k=pool_per, out_rows=64, rowmap=np.asarray(pool.rowmap))
        n_pool = pv.shape[0]
        if n_pool != S * pool_per:
            return None           # a pool run exceeded its cap
        blk_of = np.arange(n_pool) // pool_per
        rm_rel = prm - (blk_of * 64)[:, None, None]
        if rm_rel.min() < 0 or rm_rel.max() >= 64:
            return None
        if int(plc.max(initial=0)) >= (1 << 14):
            return None           # fold would clobber loc bits
        plc = (plc | (rm_rel.astype(np.int32) << 14)).astype(np.int32)
        pidx = blk_of * kl + lvl_per + np.arange(n_pool) % pool_per
        value[pidx] = pv
        loc[pidx] = plc
        a4[pidx] = pws.reshape(-1)
        a_max = max(a_max, int(np.asarray(pool.anchor4
                                          ).max(initial=0)))

    xr4 = round_up(
        max(-(-m.num_columns // (LANE * lvl.d)), a_max + SUBLANE),
        SUBLANE)
    return DeviceCwMerged(
        d=lvl.d, kl=kl, cap=cap, lvl_per_block=lvl_per,
        pool_per_block=pool_per, num_blocks=S, xr4=int(xr4),
        value=jnp.asarray(value, dtype=dtype),
        local_index=jnp.asarray(loc),
        anchor4=jnp.asarray(a4.reshape(S, 1, kl)),
    )


def device_put_matrix(m, dtype=None, **kw):
    """Convert any host format to its device counterpart."""
    if isinstance(m, CsrMatrix):
        return DeviceCsr.from_host(m, dtype=dtype, **kw)
    if isinstance(m, CooMatrix):
        return DeviceCsr.from_coo_host(m, dtype=dtype, **kw)
    if isinstance(m, EllMatrix):
        return DeviceEll.from_host(m, dtype=dtype, **kw)
    if isinstance(m, HybridMatrix):
        return DeviceHybrid.from_host(m, dtype=dtype, **kw)
    if isinstance(m, DiaMatrix):
        return DeviceDia.from_host(m, dtype=dtype, **kw)
    if isinstance(m, WellMatrix):
        return DeviceWell.from_host(m, dtype=dtype, **kw)
    from spmv_tpu.models.wellcw import WellCwMatrix
    if isinstance(m, WellCwMatrix):
        return DeviceWellCw.from_host(m, dtype=dtype, **kw)
    from spmv_tpu.models.bsr import BsrMatrix
    if isinstance(m, BsrMatrix):
        return DeviceBsr.from_host(m, dtype=dtype, **kw)
    raise TypeError(f"unsupported host matrix type: {type(m)!r}")


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["blocks", "block_col", "block_row"],
    meta_fields=["num_rows", "num_columns", "num_entries", "num_blocks", "block_rows",
                 "num_block_rows", "num_block_cols", "blocks_per_step"],
)
@dataclasses.dataclass(frozen=True)
class DeviceBsr:
    """BSR on device — dense (128, 128) blocks for the MXU (models.bsr).

    ``block_row`` expands the host's block_rowptr to one entry per
    block (non-decreasing), serving both the output index map and the
    first-of-row detection in the Pallas SpMM kernel.
    """

    num_rows: int
    num_columns: int
    num_entries: int
    num_blocks: int           # padded: each block-row's count is a
                              # multiple of blocks_per_step
    num_block_rows: int
    num_block_cols: int
    blocks_per_step: int      # KB: blocks fused into one grid step
    block_rows: int           # block height (multiple of 8, <= 128)
    blocks: jax.Array      # (NB, block_rows, 128)
    block_col: jax.Array   # (NB,) int32
    block_row: jax.Array   # (NB // KB,) int32 per-STEP block row
    format_name = "bsr"

    @classmethod
    def from_host(cls, m, dtype=None,
                  blocks_per_step: int = 8) -> "DeviceBsr":
        from spmv_tpu.models.bsr import BsrMatrix, BLOCK

        assert isinstance(m, BsrMatrix)
        dtype = dtype or default_value_dtype()
        kb = max(int(blocks_per_step), 1)

        bh = int(getattr(m, "block_rows", BLOCK))
        counts = np.diff(m.block_rowptr)
        pads = (-counts) % kb
        nb_padded = int((counts + pads).sum())
        blocks = np.zeros((nb_padded, bh, BLOCK), m.blocks.dtype)
        bcol = np.zeros(nb_padded, dtype=np.int32)
        step_row = []
        pos = 0
        for br in range(m.num_block_rows):
            s, e = int(m.block_rowptr[br]), int(m.block_rowptr[br + 1])
            c = e - s
            blocks[pos:pos + c] = m.blocks[s:e]
            bcol[pos:pos + c] = m.block_col[s:e]
            total = c + int(pads[br])
            step_row.extend([br] * (total // kb))
            pos += total

        return cls(
            num_rows=m.num_rows,
            num_columns=m.num_columns,
            num_entries=m.num_entries,
            num_blocks=nb_padded,
            num_block_rows=m.num_block_rows,
            num_block_cols=-(-m.num_columns // BLOCK),
            blocks_per_step=kb,
            block_rows=bh,
            blocks=jnp.asarray(blocks, dtype=dtype),
            block_col=jnp.asarray(bcol),
            block_row=jnp.asarray(
                np.asarray(step_row, dtype=np.int32)
            ),
        )
