"""Pallas TPU kernels — the hot compute path.

Semantics are specified by the XLA formulations in spmv_tpu.ops.spmv;
every kernel here is tested against them (tests/test_dia.py, CPU
interpret mode) and against the fp64 host reference.

Design constraints discovered on the target chip
(experiments/tpu_probe3_gather2.py): arbitrary sublane gathers inside
Pallas miscompile on this Mosaic version; only lane-dimension
operations (roll / take_along_axis axis=1) are reliable.  The kernels
therefore use *zero* sublane gathers:

- DIA SpMV/SpMM: each diagonal offset o = s*LANE + t decomposes into a
  static sublane shift s (a static slice of a VMEM x window) and a
  static lane roll t (pltpu.roll + boundary select) — pure streaming
  FMAs, the TPU analogue of the reference's unit-stride triad loop
  rather than its gather-based CSR loop (csr-matrix-spmv.cpp:29-33).
- WELL SpMV/SpMM: per-slot lane shuffles from narrow column windows
  (whole-x VMEM or segment-streamed), K-batched grid steps with
  output-block folding — see the section comments below.
- BSR SpMM: dense (128, 128) blocks as native MXU matmuls.

Memory plan per y tile (tile_rows x LANE):
- the diagonal data block and y tile ride the regular Mosaic
  double-buffered BlockSpec pipeline;
- x stays in HBM (memory_space ANY) and the kernel DMAs exactly the
  rows the tile's offsets can touch into a two-slot VMEM window
  scratch, prefetching tile j+1's window while computing tile j —
  so x is fetched ~(1 + span/tile)x, not 3x, and the kernel scales to
  x far beyond VMEM.

Vectors cross the kernel boundary in a *padded 2-D layout* (leading
zero rows so every shifted window stays in bounds).  ``dia_spmv``
wraps pad -> kernel -> unpad for one-shot calls; iterative solvers
should pad once via ``dia_prepare_x`` and chain ``dia_spmv_core``,
whose output layout equals its input layout (the pad cost then
vanishes from the loop).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.errors import MatrixError
from spmv_tpu.models.device import (
    DeviceDia,
    DeviceWell,
    LANE,
    SUBLANE,
    round_up,
)

__all__ = [
    "dia_spmv",
    "dia_spmv_padded",
    "dia_spmv_core",
    "dia_prepare_x",
    "dia_extract_y",
    "DiaPlan",
    "well_spmv",
    "well_spmv_padded",
    "dia_spmm",
    "dia_spmm_core",
    "dia_prepare_X",
    "dia_extract_Y",
    "bsr_spmm",
    "well_spmm",
    "well_spmm_padded",
    "wellcw_spmv",
    "wellcw_spmv_padded",
    "wellcw_spmm",
]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@dataclasses.dataclass(frozen=True)
class DiaPlan:
    """Static geometry of the DIA kernel's padded vector layout."""

    tile_rows: int      # w: sublane rows per y tile
    front_blocks: int   # FB: leading zero blocks in the x/y layout
    num_tiles: int      # nb: active y tiles (covers padded_rows)
    total_rows: int     # rows of the padded 2-D layout (multiple of w)
    window_rows: int    # WR: x rows DMA'd per tile
    smin_row: int       # min over offsets of floor(off / LANE)

    @property
    def grid(self) -> int:
        return self.total_rows // self.tile_rows

    @property
    def x_offset(self) -> int:
        """Flat index of x[0] within the padded layout."""
        return self.front_blocks * self.tile_rows * LANE


def make_plan(A: DeviceDia, tile_rows: int = 256,
              nvec: int = 1) -> DiaPlan:
    w = int(tile_rows)
    if w % SUBLANE:
        raise MatrixError(f"tile_rows must be a multiple of {SUBLANE}")
    offs = A.offsets or (0,)
    srows = [o // LANE for o in offs]           # floor division
    smin_row, smax_row = min(min(srows), 0), max(max(srows), 0)
    wr = round_up((smax_row + w + 1) - smin_row, SUBLANE)
    itemsize = jnp.dtype(A.data.dtype).itemsize
    if 2 * wr * nvec * LANE * itemsize > 12 * 1024 * 1024:
        raise MatrixError(
            f"diagonal span {smax_row - smin_row} rows needs a "
            f"{wr}-row x {nvec}-vector window per tile — beyond the "
            "VMEM budget; reorder the matrix (RCM), reduce k, or use "
            "another format"
        )
    fb = _cdiv(max(0, -smin_row), w)
    nb = _cdiv(A.padded_rows // LANE, w)
    total_rows = round_up(
        max(
            fb * w + _cdiv(A.num_columns, LANE) + 1,
            (fb + nb - 1) * w + smin_row + wr,
            (fb + nb) * w,
        ),
        w,
    )
    return DiaPlan(
        tile_rows=w,
        front_blocks=fb,
        num_tiles=nb,
        total_rows=total_rows,
        window_rows=wr,
        smin_row=smin_row,
    )


def _dia_window_schedule(j, active, fb, nb, window_dma, in_place):
    """Issue/wait the sliding-window DMAs for grid step ``j``.

    Out-of-place (2 slots): start in(j+1), wait in(j) — the classic
    double buffer.

    In-place (3 slots, for ``input_output_aliases``): the pipeline's
    out-DMA for y block j is issued right after this body, and y block
    j overlaps the x rows of windows j-1..j+1 (guarded: smin_row >=
    -tile_rows).  Waiting in(j+1) *before* the body ends guarantees
    every window that reads those rows has fully landed in VMEM before
    the write starts; in(j+2) is prefetched to keep the read stream
    two steps ahead of the write stream (probe 24: same-buffer r+w
    sustains ~640 GB/s vs ~325 GB/s cross-buffer).

    Returns the slot index holding window ``j``'s data.
    """
    if not in_place:
        @pl.when(j == fb)
        def _():
            window_dma(fb % 2, fb).start()

        @pl.when(jnp.logical_and(active, j + 1 < fb + nb))
        def _():
            window_dma((j + 1) % 2, j + 1).start()

        @pl.when(active)
        def _():
            window_dma(j % 2, j).wait()

        return j % 2

    @pl.when(j == fb)
    def _():
        window_dma(fb % 3, fb).start()
        if nb > 1:
            window_dma((fb + 1) % 3, fb + 1).start()

    @pl.when(jnp.logical_and(active, j + 2 < fb + nb))
    def _():
        window_dma((j + 2) % 3, j + 2).start()

    @pl.when(j == fb)
    def _():
        window_dma(fb % 3, fb).wait()

    @pl.when(jnp.logical_and(active, j + 1 < fb + nb))
    def _():
        window_dma((j + 1) % 3, j + 1).wait()

    return j % 3


def _dia_kernel(x_hbm, d_ref, y_ref, *rest, offsets, plan, dtype,
                in_place=False, with_dot=False):
    dot_ref = rest[0] if with_dot else None
    if with_dot:
        _dot_dt = (dtype if jnp.dtype(dtype).itemsize >= 4
                   else jnp.float32)

        @pl.when(pl.program_id(0) == 0)
        def _():
            dot_ref[:] = jnp.zeros((SUBLANE, LANE), _dot_dt)
    win, sems = rest[-2], rest[-1]
    w = plan.tile_rows
    fb, nb, wr = plan.front_blocks, plan.num_tiles, plan.window_rows
    j = pl.program_id(0)
    active = jnp.logical_and(j >= fb, j < fb + nb)

    def window_dma(slot, jj):
        start = jj * w + plan.smin_row
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, wr), :],
            win.at[slot],
            sems.at[slot],
        )

    slot = _dia_window_schedule(j, active, fb, nb, window_dma, in_place)

    @pl.when(active)
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, (w, LANE), 1)
        # Sub-fp32 storage (bf16 halves the dominant diagonal stream)
        # is cast up after the VMEM load: pltpu.roll only rotates
        # 32-bit data, and f32 accumulation keeps the sum exact-ish.
        acc_dt = dtype if jnp.dtype(dtype).itemsize >= 4 else jnp.float32
        acc = jnp.zeros((w, LANE), dtype=acc_dt)
        for k, off in enumerate(offsets):
            s, t = divmod(off, LANE)
            lo = s - plan.smin_row
            if t == 0:
                shifted = win[slot, pl.ds(lo, w), :].astype(acc_dt)
            else:
                rows = win[slot, pl.ds(lo, w + 1), :].astype(acc_dt)
                # rolled[r, l] = rows[r, (l + t) % LANE]
                rolled = pltpu.roll(rows, LANE - t, axis=1)
                shifted = jnp.where(
                    lane < LANE - t,
                    jax.lax.slice_in_dim(rolled, 0, w, axis=0),
                    jax.lax.slice_in_dim(rolled, 1, w + 1, axis=0),
                )
            acc = acc + d_ref[k].astype(acc_dt) * shifted
        y_ref[:] = acc.astype(dtype)
        if with_dot:
            # Fused <x, A x> partial (lane-wise; the host sums the
            # tiny (8, LANE) output): x's own tile is already in the
            # VMEM window, so CG's p.Ap dot costs nothing here vs a
            # separate 2-vector HBM pass (~12% of a streaming
            # iteration, probe 60).  Accumulated in acc_dt so f64
            # data keeps a double-precision p.Ap (bf16 storage still
            # dots in f32).  All grid steps revisit ONE (8, LANE)
            # block (index map (0, 0)) and accumulate into row 0 —
            # a per-step (1, LANE) output block violates Mosaic's
            # sublane-divisibility rule.
            x_tile = win[slot, pl.ds(-plan.smin_row, w), :].astype(
                acc_dt)
            dot_ref[0, :] = dot_ref[0, :] + jnp.sum(x_tile * acc,
                                                    axis=0)

    @pl.when(jnp.logical_not(active))
    def _():
        y_ref[:] = jnp.zeros((w, LANE), dtype=dtype)


def _dia_in_place_ok(plan: DiaPlan) -> bool:
    """In-place (aliased x/y buffer) is safe iff no window reads more
    than one tile behind its y block: window j+2 then starts at or
    after y block j+1's first row, so the depth-2 prefetch schedule
    never reads a row after it has been overwritten."""
    return plan.smin_row >= -plan.tile_rows


@functools.partial(
    jax.jit,
    static_argnames=("tile_rows", "interpret", "in_place", "with_dot"))
def dia_spmv_core(
    A: DeviceDia, x2d: jax.Array, tile_rows: int = 256,
    interpret: bool = False, in_place: bool | None = None,
    with_dot: bool = False,
):
    """y2d = A @ x in the padded layout (same layout in and out).

    ``x2d`` must come from :func:`dia_prepare_x` (or be a previous
    ``dia_spmv_core`` output for square matrices) — chaining this is
    the zero-copy iteration path for CG and the profiling harness.

    ``in_place`` (default: auto) writes y into the donated ``x2d``
    buffer via ``input_output_aliases``: this chip moves mixed
    read+write traffic within one HBM buffer ~2x faster than across
    two (probe 24), so chained callers should leave it on.  ``x2d``
    must not be reused after the call (XLA inserts a defensive copy if
    it is live, losing the benefit but not correctness).

    ``with_dot=True`` returns ``(y2d, dot_partials)`` where
    ``dot_partials.sum()`` equals ``<x, A x>`` in the accumulator
    dtype (f64 for f64 data, else f32) — the fused CG
    dot (the x tile is already in the kernel's VMEM window, so this
    skips the separate 2-vector HBM pass that prices p.Ap).  The
    padded rows contribute exact zeros (x is zero there).  Requires
    ``in_place=False`` (x must outlive the call to be dotted).
    """
    plan = make_plan(A, tile_rows)
    w = plan.tile_rows
    d, r0, _ = A.data.shape
    nbw = plan.num_tiles * w
    data = A.data
    if nbw != r0:
        data = jnp.pad(data, ((0, 0), (0, nbw - r0), (0, 0)))
    if x2d.shape != (plan.total_rows, LANE):
        raise MatrixError(
            f"x2d has shape {x2d.shape}, expected "
            f"{(plan.total_rows, LANE)} — use dia_prepare_x"
        )
    itemsize = jnp.dtype(data.dtype).itemsize
    fits3 = 3 * plan.window_rows * LANE * itemsize <= 12 * 1024 * 1024
    if with_dot:
        if in_place:
            raise MatrixError("with_dot requires in_place=False")
        in_place = False
    if in_place is None:
        in_place = _dia_in_place_ok(plan) and fits3
    elif in_place and not (_dia_in_place_ok(plan) and fits3):
        raise MatrixError(
            f"in_place DIA needs smin_row >= -tile_rows "
            f"({plan.smin_row} < {-plan.tile_rows}) and three windows "
            "within the VMEM budget; raise tile_rows or use "
            "in_place=False"
        )

    kernel = functools.partial(
        _dia_kernel, offsets=A.offsets, plan=plan, dtype=data.dtype,
        in_place=in_place, with_dot=with_dot,
    )
    fb, nb = plan.front_blocks, plan.num_tiles
    n_slots = 3 if in_place else 2
    out_shape = jax.ShapeDtypeStruct((plan.total_rows, LANE), data.dtype)
    out_specs = pl.BlockSpec(
        (w, LANE), lambda j: (j, 0), memory_space=pltpu.VMEM
    )
    if with_dot:
        dot_dt = (data.dtype if jnp.dtype(data.dtype).itemsize >= 4
                  else jnp.float32)
        # ONE revisited (8, LANE) accumulator tile — every grid step
        # maps to block (0, 0) and adds into row 0 (a (1, LANE)
        # per-step block trips Mosaic's sublane-divisibility rule)
        out_shape = (out_shape, jax.ShapeDtypeStruct(
            (SUBLANE, LANE), dot_dt))
        out_specs = (out_specs, pl.BlockSpec(
            (SUBLANE, LANE), lambda j: (0, 0),
            memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(plan.grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (d, w, LANE),
                lambda j: (0, jnp.clip(j - fb, 0, nb - 1), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n_slots, plan.window_rows, LANE), data.dtype),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ],
        input_output_aliases={0: 0} if in_place else {},
        interpret=interpret,
    )(x2d.astype(data.dtype), data)


def dia_prepare_x(
    A: DeviceDia, x: jax.Array, tile_rows: int = 256
) -> jax.Array:
    """Lay a length-num_columns vector into the kernel's padded layout."""
    plan = make_plan(A, tile_rows)
    off = plan.x_offset
    return jnp.pad(
        x, (off, plan.total_rows * LANE - off - x.shape[0])
    ).reshape(plan.total_rows, LANE)


def dia_extract_y(
    A: DeviceDia, y2d: jax.Array, tile_rows: int = 256
) -> jax.Array:
    """Pull the true y vector out of the padded layout."""
    plan = make_plan(A, tile_rows)
    off = plan.x_offset
    return y2d.reshape(-1)[off: off + A.num_rows]


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def dia_spmv_padded(
    A: DeviceDia, x: jax.Array, tile_rows: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """y = A @ x, returning padded_rows entries (tail rows are zero)."""
    y2d = dia_spmv_core(
        A, dia_prepare_x(A, x, tile_rows), tile_rows, interpret
    )
    off = make_plan(A, tile_rows).x_offset
    return y2d.reshape(-1)[off: off + A.padded_rows]


def dia_spmv(
    A: DeviceDia, x: jax.Array, tile_rows: int = 256, interpret: bool = False
) -> jax.Array:
    """y = A @ x with the true row count."""
    return dia_spmv_padded(A, x, tile_rows=tile_rows, interpret=interpret)[
        : A.num_rows
    ]


# ----------------------------------------------------------------------
# WELL: windowed sliced-ELL (general matrices) — see models.well.
#
# Gather strategy (probe 11): per chunk of (8 slots x 128 consecutive
# rows), every x access lies in a 128*window_rows column window; the
# kernel broadcasts each of the m window rows across sublanes and does
# one lane shuffle (take_along_axis axis=1) + masked accumulate — the
# only gather primitive that is reliable on this chip.  The chunk's
# slot dimension reduces on-chip to one 128-row strip of y, which
# accumulates into a revisited (8, 128) output block; chunks of the
# same block are consecutive in the grid.
# ----------------------------------------------------------------------


def _well_kernel(blk_ref, ws_ref, grp_ref, x_ref, v_ref, l_ref, y_ref,
                 *, window_rows, k, out_rows, dtype):
    i = pl.program_id(0)
    first_of_block = jnp.logical_or(
        i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)]
    )
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (out_rows, LANE), 0)
    acc_blk = jnp.zeros((out_rows, LANE), dtype=dtype)
    for kk in range(k):
        loc = l_ref[kk]
        lrow = loc >> 7
        llane = loc & (LANE - 1)
        val = v_ref[kk]
        acc = jnp.zeros((SUBLANE, LANE), dtype=dtype)
        for m in range(window_rows):
            # per-slot gather table: row s = x2d[ws[s, t] + m]
            bt = jnp.concatenate(
                [x_ref[pl.ds(ws_ref[0, s, kk] + m, 1), :]
                 for s in range(SUBLANE)],
                axis=0,
            )
            gthr = jnp.take_along_axis(bt, llane, axis=1)
            acc = acc + jnp.where(
                lrow == m, val * gthr, jnp.zeros_like(val)
            )
        strip = jnp.sum(acc, axis=0, keepdims=True)        # (1, LANE)
        grow = grp_ref[0, 0, kk] % out_rows
        acc_blk = acc_blk + jnp.where(
            row_iota == grow,
            jnp.broadcast_to(strip, (out_rows, LANE)),
            jnp.zeros((out_rows, LANE), dtype=dtype),
        )

    @pl.when(first_of_block)
    def _():
        y_ref[:] = acc_blk

    @pl.when(jnp.logical_not(first_of_block))
    def _():
        y_ref[:] += acc_blk


@functools.partial(jax.jit, static_argnames=("interpret",))
def well_spmv_padded(
    A: DeviceWell, x: jax.Array, interpret: bool = False
) -> jax.Array:
    """y = A @ x over the WELL chunks, of length
    round_up(num_groups, 8 * blocks_per_out) * 128.

    The spill remainder is NOT included — callers add it (well_spmv
    composes both; this function is the bare Pallas path).
    """
    m = A.window_rows
    k = A.chunks_per_step
    xrows = _cdiv(A.num_columns, LANE) + m + 1
    if A.segment_rows is not None:
        # segmented mode: x stays in HBM, streams through a sliding
        # VMEM segment — no whole-x size limit
        xrows = round_up(
            xrows + A.segment_rows + 8, SUBLANE
        )
        xf = x.astype(A.value.dtype)
        x2d = jnp.pad(
            xf, (0, xrows * LANE - x.shape[0])
        ).reshape(xrows, LANE)
        return _well_seg_call(A, x2d, interpret).reshape(-1)
    vmem_bytes = xrows * LANE * A.value.dtype.itemsize
    if vmem_bytes > 8 * 1024 * 1024:
        raise MatrixError(
            f"x ({vmem_bytes/1e6:.0f} MB padded) exceeds the WELL "
            "kernel's whole-x VMEM budget; convert with "
            "segment_rows=... (DeviceWell.from_host), shard the "
            "matrix (spmv_tpu.parallel), or use the DIA/XLA paths"
        )
    xf = x.astype(A.value.dtype)
    x2d = jnp.pad(xf, (0, xrows * LANE - x.shape[0])).reshape(xrows, LANE)

    out_rows = SUBLANE * A.blocks_per_out
    padded_groups = round_up(A.num_groups, out_rows)
    kernel = functools.partial(
        _well_kernel, window_rows=m, k=k, out_rows=out_rows,
        dtype=A.value.dtype,
    )
    y2d = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(A.num_chunks // k,),
            in_specs=[
                pl.BlockSpec(
                    (1, SUBLANE, k),
                    lambda i, blk: (i, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, 1, k),
                    lambda i, blk: (i, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (k, SUBLANE, LANE),
                    lambda i, blk: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (k, SUBLANE, LANE),
                    lambda i, blk: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (out_rows, LANE),
                lambda i, blk: (blk[i], 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (padded_groups, LANE), A.value.dtype
        ),
        interpret=interpret,
    )(A.block_of_step, A.window_start, A.group_of_chunk,
      x2d, A.value, A.local_index)
    return y2d.reshape(-1)


def _well_seg_kernel(blk_ref, seg_ref, ws_ref, grp_ref, x_hbm,
                     v_ref, l_ref, y_ref, win, sems, *,
                     window_rows, k, seg_rows, out_rows, dtype):
    """Segmented WELL: x streams through a sliding VMEM segment.

    seg_ref[i] is the x2d start row of step i's segment (constant
    within a step by construction); the segment is re-DMA'd only when
    it changes — rare for banded/reordered matrices, so the transfer
    amortizes over many steps.
    """
    i = pl.program_id(0)
    seg_changed = jnp.logical_or(
        i == 0, seg_ref[i] != seg_ref[jnp.maximum(i - 1, 0)]
    )

    win_rows = round_up(seg_rows + window_rows + 1, SUBLANE)

    @pl.when(seg_changed)
    def _():
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(seg_ref[i], win_rows)],
            win,
            sems,
        )
        dma.start()
        dma.wait()

    first_of_block = jnp.logical_or(
        i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)]
    )
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (out_rows, LANE), 0)
    acc_blk = jnp.zeros((out_rows, LANE), dtype=dtype)
    for kk in range(k):
        loc = l_ref[kk]
        lrow = loc >> 7
        llane = loc & (LANE - 1)
        val = v_ref[kk]
        acc = jnp.zeros((SUBLANE, LANE), dtype=dtype)
        for m in range(window_rows):
            bt = jnp.concatenate(
                [win[pl.ds(ws_ref[0, s, kk] + m, 1), :]
                 for s in range(SUBLANE)],
                axis=0,
            )
            gthr = jnp.take_along_axis(bt, llane, axis=1)
            acc = acc + jnp.where(
                lrow == m, val * gthr, jnp.zeros_like(val)
            )
        strip = jnp.sum(acc, axis=0, keepdims=True)
        grow = grp_ref[0, 0, kk] % out_rows
        acc_blk = acc_blk + jnp.where(
            row_iota == grow,
            jnp.broadcast_to(strip, (out_rows, LANE)),
            jnp.zeros((out_rows, LANE), dtype=dtype),
        )

    @pl.when(first_of_block)
    def _():
        y_ref[:] = acc_blk

    @pl.when(jnp.logical_not(first_of_block))
    def _():
        y_ref[:] += acc_blk


def _well_seg_call(A, x2d, interpret):
    m = A.window_rows
    k = A.chunks_per_step
    seg_rows = A.segment_rows
    out_rows = SUBLANE * A.blocks_per_out
    padded_groups = round_up(A.num_groups, out_rows)
    kernel = functools.partial(
        _well_seg_kernel, window_rows=m, k=k, seg_rows=seg_rows,
        out_rows=out_rows, dtype=A.value.dtype,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(A.num_chunks // k,),
            in_specs=[
                pl.BlockSpec(
                    (1, SUBLANE, k),
                    lambda i, blk, seg: (i, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, 1, k),
                    lambda i, blk, seg: (i, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (k, SUBLANE, LANE),
                    lambda i, blk, seg: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (k, SUBLANE, LANE),
                    lambda i, blk, seg: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (out_rows, LANE),
                lambda i, blk, seg: (blk[i], 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM(
                    (round_up(seg_rows + A.window_rows + 1, SUBLANE),
                     LANE),
                    A.value.dtype,
                ),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (padded_groups, LANE), A.value.dtype
        ),
        interpret=interpret,
    )(A.block_of_step, A.segment_of_step,
      A.window_start, A.group_of_chunk, x2d, A.value, A.local_index)


def well_spmv(
    A: DeviceWell, x: jax.Array, interpret: bool = False
) -> jax.Array:
    """y = A @ x including the spill remainder, true row count."""
    if interpret:
        y = well_spmv_padded(A, x, interpret=True)
    else:
        from spmv_tpu.utils.aotcache import aot_call

        y = aot_call("well_spmv_padded", well_spmv_padded, (A, x))
    y = y[: A.num_rows]
    if A.spill is not None:
        from spmv_tpu.ops.spmv import spmv as _xla_spmv

        y = y + _xla_spmv(A.spill, x.astype(y.dtype))
    return y


# ----------------------------------------------------------------------
# DIA SpMM: multi-vector stencil kernel.  X columns ride a leading k
# dimension through the same padded layout and sliding HBM->VMEM
# window as dia_spmv_core; diagonal data is fetched ONCE per tile and
# reused across all k columns (the amortization BASELINE config #4 is
# about — the XLA spmm formulation reaches only ~18% of roofline
# because it materializes shifted copies per column).
# ----------------------------------------------------------------------


def _dia_spmm_kernel(x_hbm, d_ref, y_ref, win, sems, *, offsets, plan,
                     nvec, dtype, in_place=False):
    w = plan.tile_rows
    fb, nb, wr = plan.front_blocks, plan.num_tiles, plan.window_rows
    j = pl.program_id(0)
    active = jnp.logical_and(j >= fb, j < fb + nb)

    def window_dma(slot, jj):
        start = jj * w + plan.smin_row
        # X layout (total_rows, k, LANE): the window slab is one
        # CONTIGUOUS region — the strided per-column layout measured
        # 2x slower (experiments, probe 15).
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, wr)],
            win.at[slot],
            sems.at[slot],
        )

    slot = _dia_window_schedule(j, active, fb, nb, window_dma, in_place)

    @pl.when(active)
    def _():
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (w, nvec, LANE), 2
        )
        # As in _dia_kernel: pltpu.roll only rotates 32-bit data, so
        # sub-fp32 storage casts up after the VMEM load and
        # accumulates in f32.
        acc_dt = (dtype if jnp.dtype(dtype).itemsize >= 4
                  else jnp.float32)
        acc = jnp.zeros((w, nvec, LANE), dtype=acc_dt)
        for kd, off in enumerate(offsets):
            s, t = divmod(off, LANE)
            lo = s - plan.smin_row
            if t == 0:
                shifted = win[slot, pl.ds(lo, w)].astype(acc_dt)
            else:
                rows = win[slot, pl.ds(lo, w + 1)].astype(acc_dt)
                rolled = pltpu.roll(rows, LANE - t, axis=2)
                shifted = jnp.where(
                    lane < LANE - t,
                    jax.lax.slice_in_dim(rolled, 0, w, axis=0),
                    jax.lax.slice_in_dim(rolled, 1, w + 1, axis=0),
                )
            acc = acc + d_ref[kd].astype(acc_dt)[:, None, :] * shifted
        y_ref[:] = acc.astype(dtype)

    @pl.when(jnp.logical_not(active))
    def _():
        y_ref[:] = jnp.zeros((w, nvec, LANE), dtype=dtype)


@functools.partial(
    jax.jit, static_argnames=("tile_rows", "interpret", "in_place"))
def dia_spmm_core(
    A: DeviceDia, x3d: jax.Array, tile_rows: int = 256,
    interpret: bool = False, in_place: bool | None = None,
) -> jax.Array:
    """Y = A @ X in the padded layout: x3d (total_rows, k, LANE) from
    :func:`dia_prepare_X`; output in the same layout (chainable for
    square matrices, like dia_spmv_core).

    ``in_place`` (default: auto) aliases Y onto the donated x3d buffer
    — see dia_spmv_core.  The y write stream is ~1/3 of this kernel's
    traffic, so keeping it inside the x3d buffer avoids the ~2x
    cross-buffer mixing penalty (probe 24) that capped large-n SpMM at
    0.48 of roofline in round 1.
    """
    nvec = x3d.shape[1]
    plan = make_plan(A, tile_rows, nvec=nvec)
    w = plan.tile_rows
    d, r0, _ = A.data.shape
    nbw = plan.num_tiles * w
    data = A.data
    if nbw != r0:
        data = jnp.pad(data, ((0, 0), (0, nbw - r0), (0, 0)))
    if (x3d.shape[0], x3d.shape[2]) != (plan.total_rows, LANE):
        raise MatrixError(
            f"x3d has shape {x3d.shape}, expected "
            f"({plan.total_rows}, k, {LANE}) — use dia_prepare_X"
        )
    itemsize = jnp.dtype(data.dtype).itemsize
    fits3 = (3 * plan.window_rows * nvec * LANE * itemsize
             <= 12 * 1024 * 1024)
    if in_place is None:
        in_place = _dia_in_place_ok(plan) and fits3
    elif in_place and not (_dia_in_place_ok(plan) and fits3):
        raise MatrixError(
            "in_place DIA SpMM needs smin_row >= -tile_rows and three "
            "windows within the VMEM budget; raise tile_rows, reduce "
            "k, or use in_place=False"
        )

    kernel = functools.partial(
        _dia_spmm_kernel, offsets=A.offsets, plan=plan, nvec=nvec,
        dtype=data.dtype, in_place=in_place,
    )
    fb, nb = plan.front_blocks, plan.num_tiles
    n_slots = 3 if in_place else 2
    return pl.pallas_call(
        kernel,
        grid=(plan.grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (d, w, LANE),
                lambda j: (0, jnp.clip(j - fb, 0, nb - 1), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (w, nvec, LANE), lambda j: (j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (plan.total_rows, nvec, LANE), data.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (n_slots, plan.window_rows, nvec, LANE), data.dtype),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ],
        input_output_aliases={0: 0} if in_place else {},
        interpret=interpret,
    )(x3d.astype(data.dtype), data)


def dia_prepare_X(
    A: DeviceDia, X: jax.Array, tile_rows: int = 256
) -> jax.Array:
    """(num_columns, k) multi-vector -> (total_rows, k, LANE) layout."""
    plan = make_plan(A, tile_rows)
    off = plan.x_offset
    k = X.shape[1]
    padded = jnp.pad(
        X, ((off, plan.total_rows * LANE - off - X.shape[0]), (0, 0))
    )
    # flat index i of column j lives at [i // LANE, j, i % LANE]
    return padded.reshape(plan.total_rows, LANE, k).transpose(0, 2, 1)


def dia_extract_Y(
    A: DeviceDia, y3d: jax.Array, tile_rows: int = 256
) -> jax.Array:
    """Padded layout -> (num_rows, k)."""
    plan = make_plan(A, tile_rows)
    off = plan.x_offset
    k = y3d.shape[1]
    flat = y3d.transpose(0, 2, 1).reshape(-1, k)
    return flat[off: off + A.num_rows]


def dia_spmm(
    A: DeviceDia, X: jax.Array, tile_rows: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Y = A @ X for X of shape (num_columns, k), true row count."""
    y3d = dia_spmm_core(
        A, dia_prepare_X(A, X, tile_rows), tile_rows, interpret
    )
    return dia_extract_Y(A, y3d, tile_rows)


# ----------------------------------------------------------------------
# BSR SpMM: dense (block_rows, 128) blocks on the MXU — see models.bsr.
# Per grid step t: Y[brow[t]] += blocks[t] @ X[bcol[t]], a native
# systolic-array matmul; X and Y tiles ride BlockSpec pipelines with
# index maps driven by the prefetched block coordinate arrays, and
# consecutive blocks of one block-row accumulate into a revisited
# output tile.
# ----------------------------------------------------------------------


def _tree_sum(parts):
    """Pairwise-sum a list of equal-shape arrays (dependency depth
    log2 n instead of n-1).  Probe 57: the serial accumulator chain
    cost the whole-X BSR kernel 18% (1.407 -> 1.188 ms at the 537 MB
    driver shape) because each MXU dot waited on the previous add."""
    while len(parts) > 1:
        parts = [
            parts[i] + parts[i + 1] if i + 1 < len(parts) else parts[i]
            for i in range(0, len(parts), 2)
        ]
    return parts[0]


def _bsr_spmm_kernel(bcol_ref, brow_ref, *refs, kb, dtype):
    x_refs = refs[:kb]
    blk_ref = refs[kb]
    y_ref = refs[kb + 1]
    t = pl.program_id(0)
    first = jnp.logical_or(
        t == 0, brow_ref[t] != brow_ref[jnp.maximum(t - 1, 0)]
    )
    acc = _tree_sum([
        jnp.dot(blk_ref[i], x_refs[i][0], preferred_element_type=dtype)
        for i in range(kb)
    ])

    @pl.when(first)
    def _():
        y_ref[0] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        y_ref[0] += acc


def _bsr_spmm_wholex_kernel(bcol_ref, brow_ref, x_ref, blk_ref, y_ref,
                            *, kb, dtype):
    t = pl.program_id(0)
    first = jnp.logical_or(
        t == 0, brow_ref[t] != brow_ref[jnp.maximum(t - 1, 0)]
    )
    acc = _tree_sum([
        jnp.dot(blk_ref[i], x_ref[bcol_ref[t * kb + i]],
                preferred_element_type=dtype)
        for i in range(kb)
    ])

    @pl.when(first)
    def _():
        y_ref[0] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        y_ref[0] += acc


# X residency budget for the whole-X BSR path: X + double-buffered
# block/Y tiles must fit v5e's 128 MB VMEM with headroom.  The
# environment's *default* scoped-VMEM limit can be far smaller (the
# round-3 driver compiled with 16 MB and OOM'd, BENCH_r03.json), so
# the whole-X pallas_call always passes an explicit
# CompilerParams(vmem_limit_bytes=...) sized from its actual buffers
# rather than trusting the default.
_BSR_WHOLEX_BYTES = 80 * 1024 * 1024
# Everything the Mosaic scoped allocator must fit besides X: two
# buffers each for the block tile and the Y tile, plus slack for
# semaphores/iota/accumulator spills.
_BSR_VMEM_HEADROOM = 12 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("interpret",))
def bsr_spmm(A, X: jax.Array, interpret: bool = False) -> jax.Array:
    """Y = A @ X for DeviceBsr; X of shape (num_columns, k).

    dtype contract: X is cast to ``A.blocks.dtype`` before the kernel
    (a silent downcast when the blocks are stored bf16); partial sums
    always accumulate in f32 when the blocks are bf16, and Y is
    returned in that accumulator dtype — so **bf16 blocks give
    f32 output from (implicitly bf16) inputs**.  With f32 blocks Y is
    f32.  Measured in probe 54 (experiments/RESULTS.md).

    Two paths.  The pipelined path streams one (LANE, k) X tile per
    block through a BlockSpec index map — which re-fetches X once per
    BLOCK, doubling HBM traffic (measured: 1.58 ms vs a 0.65 ms
    stream-only floor at 131k rows / 134M nnz / k=128, probe in
    BENCH detail).  When X fits the VMEM budget it instead stays
    RESIDENT whole (the WELL SpMM's whole-x mode) and the kernel
    indexes its block-column tile dynamically, so only the blocks
    stream from HBM; that call carries an explicit vmem_limit_bytes
    because default scoped-VMEM limits (16 MB in the round-3 driver)
    are far below the resident X.
    """
    from spmv_tpu.models.device import DeviceBsr

    assert isinstance(A, DeviceBsr)
    k = X.shape[1]
    ncb = A.num_block_cols
    xf = X.astype(A.blocks.dtype)
    x3d = jnp.pad(
        xf, ((0, ncb * LANE - X.shape[0]), (0, 0))
    ).reshape(ncb, LANE, k)

    # bf16 blocks run the MXU at its bf16 rate and halve the block
    # stream, but partial sums must stay f32: the accumulator dtype is
    # promoted, and Y comes back f32 (measured: see probe 54).
    acc_dtype = (jnp.float32 if A.blocks.dtype == jnp.bfloat16
                 else A.blocks.dtype)
    kb = A.blocks_per_step
    bh = A.block_rows
    x_bytes = ncb * LANE * k * x3d.dtype.itemsize
    if x_bytes <= _BSR_WHOLEX_BYTES:
        acc_itemsize = jnp.dtype(acc_dtype).itemsize
        tile_bytes = 2 * (kb * bh * LANE * x3d.dtype.itemsize
                          + bh * k * acc_itemsize)
        vmem_limit = x_bytes + tile_bytes + _BSR_VMEM_HEADROOM
        kernel = functools.partial(
            _bsr_spmm_wholex_kernel, kb=kb, dtype=acc_dtype
        )
        y3d = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(A.num_blocks // kb,),
                in_specs=[
                    pl.BlockSpec(
                        (ncb, LANE, k),
                        lambda t, bc, br: (0, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (kb, bh, LANE),
                        lambda t, bc, br: (t, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (1, bh, k),
                    lambda t, bc, br: (br[t], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (A.num_block_rows, bh, k), acc_dtype
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(vmem_limit)
            ),
            interpret=interpret,
        )(A.block_col, A.block_row, x3d, A.blocks)
        return y3d.reshape(-1, k)[: A.num_rows]

    kernel = functools.partial(
        _bsr_spmm_kernel, kb=kb, dtype=acc_dtype
    )
    x_specs = [
        pl.BlockSpec(
            (1, LANE, k),
            (lambda i: lambda t, bc, br: (bc[t * kb + i], 0, 0))(i),
            memory_space=pltpu.VMEM,
        )
        for i in range(kb)
    ]
    y3d = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(A.num_blocks // kb,),
            in_specs=x_specs + [
                pl.BlockSpec(
                    (kb, bh, LANE),
                    lambda t, bc, br: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, bh, k),
                lambda t, bc, br: (br[t], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (A.num_block_rows, bh, k), acc_dtype
        ),
        interpret=interpret,
    )(A.block_col, A.block_row, *([x3d] * kb), A.blocks)
    return y3d.reshape(-1, k)[: A.num_rows]


# ----------------------------------------------------------------------
# WELL SpMM: multi-vector shuffle-gather.  X rides a (rows, k, LANE)
# layout; each slot's lane shuffle applies identically to all k
# vectors, so index traffic and window logic amortize over k like the
# DIA SpMM.  Whole-x VMEM mode (the XLA path covers larger x).
# ----------------------------------------------------------------------


def _well_spmm_kernel(blk_ref, ws_ref, grp_ref, x_ref, v_ref, l_ref,
                      y_ref, *, window_rows, k, nvec, out_rows, dtype):
    i = pl.program_id(0)
    first_of_block = jnp.logical_or(
        i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)]
    )
    row_iota = jax.lax.broadcasted_iota(
        jnp.int32, (out_rows, nvec, LANE), 0
    )
    acc_blk = jnp.zeros((out_rows, nvec, LANE), dtype=dtype)
    for kk in range(k):
        loc = l_ref[kk]
        lrow = loc >> 7
        llane = loc & (LANE - 1)
        val = v_ref[kk]
        strip = jnp.zeros((nvec, LANE), dtype=dtype)
        for s in range(SUBLANE):
            idx = jnp.broadcast_to(llane[s][None, :], (nvec, LANE))
            vs = val[s][None, :]
            for m in range(window_rows):
                bt = x_ref[ws_ref[0, s, kk] + m]      # (nvec, LANE)
                g = jnp.take_along_axis(bt, idx, axis=1)
                strip = strip + jnp.where(
                    lrow[s][None, :] == m, vs * g,
                    jnp.zeros((nvec, LANE), dtype=dtype),
                )
        grow = grp_ref[0, 0, kk] % out_rows
        acc_blk = acc_blk + jnp.where(
            row_iota == grow,
            jnp.broadcast_to(strip[None], (out_rows, nvec, LANE)),
            jnp.zeros((out_rows, nvec, LANE), dtype=dtype),
        )

    @pl.when(first_of_block)
    def _():
        y_ref[:] = acc_blk

    @pl.when(jnp.logical_not(first_of_block))
    def _():
        y_ref[:] += acc_blk


def _well_seg_spmm_kernel(blk_ref, seg_ref, ws_ref, grp_ref, x_hbm,
                          v_ref, l_ref, y_ref, win, sems, *,
                          window_rows, k, seg_rows, nvec, out_rows,
                          dtype):
    """Segmented WELL SpMM: X streams through a sliding VMEM segment.

    The _well_seg_kernel segment schedule (one DMA per segment change,
    amortized over the run's steps) combined with the _well_spmm_kernel
    multi-vector body — each slot's lane shuffle applies to all nvec
    columns of the (rows, nvec, LANE) X layout.
    """
    i = pl.program_id(0)
    seg_changed = jnp.logical_or(
        i == 0, seg_ref[i] != seg_ref[jnp.maximum(i - 1, 0)]
    )

    win_rows = round_up(seg_rows + window_rows + 1, SUBLANE)

    @pl.when(seg_changed)
    def _():
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(seg_ref[i], win_rows)],
            win,
            sems,
        )
        dma.start()
        dma.wait()

    first_of_block = jnp.logical_or(
        i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)]
    )
    row_iota = jax.lax.broadcasted_iota(
        jnp.int32, (out_rows, nvec, LANE), 0
    )
    acc_blk = jnp.zeros((out_rows, nvec, LANE), dtype=dtype)
    for kk in range(k):
        loc = l_ref[kk]
        lrow = loc >> 7
        llane = loc & (LANE - 1)
        val = v_ref[kk]
        strip = jnp.zeros((nvec, LANE), dtype=dtype)
        for s in range(SUBLANE):
            idx = jnp.broadcast_to(llane[s][None, :], (nvec, LANE))
            vs = val[s][None, :]
            for m in range(window_rows):
                bt = win[ws_ref[0, s, kk] + m]         # (nvec, LANE)
                g = jnp.take_along_axis(bt, idx, axis=1)
                strip = strip + jnp.where(
                    lrow[s][None, :] == m, vs * g,
                    jnp.zeros((nvec, LANE), dtype=dtype),
                )
        grow = grp_ref[0, 0, kk] % out_rows
        acc_blk = acc_blk + jnp.where(
            row_iota == grow,
            jnp.broadcast_to(strip[None], (out_rows, nvec, LANE)),
            jnp.zeros((out_rows, nvec, LANE), dtype=dtype),
        )

    @pl.when(first_of_block)
    def _():
        y_ref[:] = acc_blk

    @pl.when(jnp.logical_not(first_of_block))
    def _():
        y_ref[:] += acc_blk


def _well_seg_spmm_call(A, x3d, nvec, interpret):
    m = A.window_rows
    k = A.chunks_per_step
    seg_rows = A.segment_rows
    out_rows = SUBLANE * A.blocks_per_out
    padded_groups = round_up(A.num_groups, out_rows)
    win_rows = round_up(seg_rows + m + 1, SUBLANE)
    # The segment window is the only large VMEM consumer (the per-step
    # value/index blocks and the output tile are tens of KB), so it can
    # use most of the ~16 MB scoped-VMEM budget.
    seg_bytes = win_rows * nvec * LANE * A.value.dtype.itemsize
    if seg_bytes > 12 * 1024 * 1024:
        raise MatrixError(
            f"X segment ({seg_bytes/1e6:.0f} MB for nvec={nvec}) "
            "exceeds the WELL spmm kernel's VMEM budget; rebuild the "
            "device with smaller segment_rows or use ops.spmm (XLA)"
        )
    kernel = functools.partial(
        _well_seg_spmm_kernel, window_rows=m, k=k, seg_rows=seg_rows,
        nvec=nvec, out_rows=out_rows, dtype=A.value.dtype,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(A.num_chunks // k,),
            in_specs=[
                pl.BlockSpec(
                    (1, SUBLANE, k),
                    lambda i, blk, seg: (i, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, 1, k),
                    lambda i, blk, seg: (i, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (k, SUBLANE, LANE),
                    lambda i, blk, seg: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (k, SUBLANE, LANE),
                    lambda i, blk, seg: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (out_rows, nvec, LANE),
                lambda i, blk, seg: (blk[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((win_rows, nvec, LANE), A.value.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (padded_groups, nvec, LANE), A.value.dtype
        ),
        interpret=interpret,
    )(A.block_of_step, A.segment_of_step,
      A.window_start, A.group_of_chunk, x3d, A.value, A.local_index)


@functools.partial(jax.jit, static_argnames=("interpret",))
def well_spmm_padded(
    A: DeviceWell, X: jax.Array, interpret: bool = False
) -> jax.Array:
    """Y = A @ X over the WELL chunks (spill not included), shape
    (padded_groups * LANE, k)."""
    m = A.window_rows
    k = A.chunks_per_step
    nvec = X.shape[1]
    xrows = _cdiv(A.num_columns, LANE) + m + 1
    if A.segment_rows is not None:
        # segmented mode: X stays in HBM, streams through a sliding
        # VMEM segment — no whole-X size limit
        xrows = round_up(xrows + A.segment_rows + 8, SUBLANE)
        xf = X.astype(A.value.dtype)
        x3d = jnp.pad(
            xf, ((0, xrows * LANE - X.shape[0]), (0, 0))
        ).reshape(xrows, LANE, nvec).transpose(0, 2, 1)
        y3d = _well_seg_spmm_call(A, x3d, nvec, interpret)
        return y3d.transpose(0, 2, 1).reshape(-1, nvec)
    vmem_bytes = xrows * nvec * LANE * A.value.dtype.itemsize
    if vmem_bytes > 8 * 1024 * 1024:
        raise MatrixError(
            f"X ({vmem_bytes/1e6:.0f} MB padded) exceeds the WELL "
            "spmm kernel's VMEM budget; convert with segment_rows=... "
            "(DeviceWell.from_host), use ops.spmm (XLA), or shard"
        )
    xf = X.astype(A.value.dtype)
    x3d = jnp.pad(
        xf, ((0, xrows * LANE - X.shape[0]), (0, 0))
    ).reshape(xrows, LANE, nvec).transpose(0, 2, 1)

    out_rows = SUBLANE * A.blocks_per_out
    padded_groups = round_up(A.num_groups, out_rows)
    kernel = functools.partial(
        _well_spmm_kernel, window_rows=m, k=k, nvec=nvec,
        out_rows=out_rows, dtype=A.value.dtype,
    )
    y3d = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(A.num_chunks // k,),
            in_specs=[
                pl.BlockSpec(
                    (1, SUBLANE, k),
                    lambda i, blk: (i, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, 1, k),
                    lambda i, blk: (i, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (k, SUBLANE, LANE),
                    lambda i, blk: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (k, SUBLANE, LANE),
                    lambda i, blk: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (out_rows, nvec, LANE),
                lambda i, blk: (blk[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (padded_groups, nvec, LANE), A.value.dtype
        ),
        interpret=interpret,
    )(A.block_of_step, A.window_start, A.group_of_chunk,
      x3d, A.value, A.local_index)
    # (groups, k, LANE) -> flat rows x k
    return y3d.transpose(0, 2, 1).reshape(-1, nvec)


def well_spmm(
    A: DeviceWell, X: jax.Array, interpret: bool = False
) -> jax.Array:
    """Y = A @ X including the spill remainder, true row count."""
    if interpret:
        Y = well_spmm_padded(A, X, interpret=True)
    else:
        from spmv_tpu.utils.aotcache import aot_call

        Y = aot_call("well_spmm_padded", well_spmm_padded, (A, X))
    Y = Y[: A.num_rows]
    if A.spill is not None:
        from spmv_tpu.ops.spmv import spmm as _xla_spmm

        Y = Y + _xla_spmm(A.spill, X.astype(Y.dtype))[: A.num_rows]
    return Y


# ----------------------------------------------------------------------
# WELL-CW: chunk-window WELL (scattered general matrices) — see
# models.wellcw for the layout and probes 27/28 for the measurements.
#
# Each chunk has ONE window of 8*d x2d rows.  x is pre-split into d
# stride-d tables xt[p] = x2d[p::d], so slot s's gather table for
# phase p is one contiguous dynamic slice xt[p][a4 : a4+8].  Anchors
# are band-adaptive per-chunk scalars (models.wellcw: each group's
# rank-k chunk anchors at its own band start/end, and pool ladders
# step through a pool's span), so the slice start is arbitrary — the
# kernel relies on Mosaic handling UNALIGNED dynamic sublane slice
# starts (verified on this chip; arbitrary sublane gathers still
# miscompile).  Per chunk: d x (slice + take_along_axis +
# phase-select FMA) + one strip scatter; ~10x less VPU work than the
# per-slot-window WELL kernel, which must assemble its gather tables
# from 8 single-row slices per window row.
# ----------------------------------------------------------------------


def _cw_kernel(blk_ref, ws_ref, grp_ref, x_ref, v_ref, l_ref, y_ref,
               *, d, k, out_rows, dtype):
    i = pl.program_id(0)
    first = jnp.logical_or(
        i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)]
    )
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (out_rows, LANE), 0)
    acc_blk = jnp.zeros((out_rows, LANE), dtype=dtype)
    for kk in range(k):
        a4 = ws_ref[0, 0, kk]
        locv = l_ref[kk]
        llane = locv & (LANE - 1)
        sel = (locv >> 7) & (d - 1)          # phase = window-row % d
        val = v_ref[kk]
        acc = jnp.zeros((SUBLANE, LANE), dtype=dtype)
        for p in range(d):
            T = x_ref[p, pl.ds(a4, SUBLANE), :]        # (8, LANE)
            gthr = jnp.take_along_axis(T, llane, axis=1)
            acc = acc + jnp.where(sel == p, val * gthr,
                                  jnp.zeros_like(val))
        strip = jnp.sum(acc, axis=0, keepdims=True)
        grow = grp_ref[0, 0, kk] % out_rows
        acc_blk = acc_blk + jnp.where(
            row_iota == grow,
            jnp.broadcast_to(strip, (out_rows, LANE)),
            jnp.zeros((out_rows, LANE), dtype=dtype),
        )

    @pl.when(first)
    def _():
        y_ref[:] = acc_blk

    @pl.when(jnp.logical_not(first))
    def _():
        y_ref[:] += acc_blk


def _cw_table_reuse(build):
    """Share stride tables across CW sources with the same phase
    count d: a source whose xr4 is <= an already-built table's can
    read that table directly (same stride interleave, same padding
    start; its anchors never reach the extra rows).  At the bench
    cliff case this drops the tail pool's duplicate 16-MB-per-RHS
    table build — the largest fixed overhead left in the SpMM call.
    Sources must be visited largest-first per d (merged comes first,
    which holds by construction)."""
    cache = {}

    def tables_for(src):
        hit = cache.get(src.d)
        if hit is not None and hit[0] >= src.xr4:
            return hit[1]
        xt = build(src)
        if hit is None or src.xr4 > hit[0]:
            cache[src.d] = (src.xr4, xt)
        return xt

    return tables_for


def _cw_tables(lvl, x):
    """Split x into the level's d stride-d gather tables
    (d, xr4, LANE)."""
    d, xr4 = lvl.d, lvl.xr4
    x2d = jnp.pad(x, (0, xr4 * d * LANE - x.shape[0])).reshape(
        xr4 * d, LANE
    )
    return jnp.stack([x2d[p::d] for p in range(d)])


def _cw_level_call(lvl, xt, padded_groups, out_rows, interpret):
    k = lvl.chunks_per_step
    steps = lvl.num_chunks // k
    kernel = functools.partial(
        _cw_kernel, d=lvl.d, k=k, out_rows=out_rows,
        dtype=lvl.value.dtype,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((1, 1, k), lambda i, blk: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, k), lambda i, blk: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((k, SUBLANE, LANE),
                             lambda i, blk: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, SUBLANE, LANE),
                             lambda i, blk: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (out_rows, LANE), lambda i, blk: (blk[i], 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (padded_groups, LANE), lvl.value.dtype
        ),
        compiler_params=_cw_vmem_params(xt, k, 1, padded_groups,
                                        lvl.value.dtype),
        interpret=interpret,
    )(lvl.block_of_step, lvl.anchor4, lvl.group_of_chunk,
      xt, lvl.value, lvl.local_index)


def _cw_pool_kernel(blk_ref, ws_ref, x_ref, v_ref, l_ref, rm_ref,
                    y_ref, *, d, k, out_rows, dtype):
    """Pooled-tail CW kernel: same stride-d gather as _cw_kernel, but
    each slot row scatters independently to the row named by its
    rowmap cell (minus the block base) — chunks serve all 64 groups of
    the output block, which is what lets the scattered tail pack
    densely (models.wellcw CwPoolLevel)."""
    i = pl.program_id(0)
    first = jnp.logical_or(
        i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)]
    )
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (out_rows, LANE), 0)
    base = blk_ref[i] * out_rows
    acc_blk = jnp.zeros((out_rows, LANE), dtype=dtype)
    for kk in range(k):
        a4 = ws_ref[0, 0, kk]
        locv = l_ref[kk]
        llane = locv & (LANE - 1)
        sel = (locv >> 7) & (d - 1)
        val = v_ref[kk]
        acc = jnp.zeros((SUBLANE, LANE), dtype=dtype)
        for p in range(d):
            T = x_ref[p, pl.ds(a4, SUBLANE), :]
            gthr = jnp.take_along_axis(T, llane, axis=1)
            acc = acc + jnp.where(sel == p, val * gthr,
                                  jnp.zeros_like(val))
        rm = rm_ref[kk] - base                       # (8, LANE)
        for s in range(SUBLANE):
            acc_blk = acc_blk + jnp.where(
                row_iota == rm[s][None, :],
                jnp.broadcast_to(acc[s][None, :], (out_rows, LANE)),
                jnp.zeros((out_rows, LANE), dtype=dtype),
            )

    @pl.when(first)
    def _():
        y_ref[:] = acc_blk

    @pl.when(jnp.logical_not(first))
    def _():
        y_ref[:] += acc_blk


def _cw_pool_call(pool, xt, padded_groups, out_rows, interpret):
    k = pool.chunks_per_step
    steps = pool.num_chunks // k
    kernel = functools.partial(
        _cw_pool_kernel, d=pool.d, k=k, out_rows=out_rows,
        dtype=pool.value.dtype,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((1, 1, k), lambda i, blk: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((k, SUBLANE, LANE),
                             lambda i, blk: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, SUBLANE, LANE),
                             lambda i, blk: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, SUBLANE, LANE),
                             lambda i, blk: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (out_rows, LANE), lambda i, blk: (blk[i], 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (padded_groups, LANE), pool.value.dtype
        ),
        compiler_params=_cw_vmem_params(xt, k, 1, padded_groups,
                                        pool.value.dtype),
        interpret=interpret,
    )(pool.block_of_step, pool.anchor4,
      xt, pool.value, pool.local_index, pool.rowmap)


def _cw_merged_kernel(ws_ref, x_ref, v_ref, l_ref, y_ref, *, d, kl,
                      cap, lvl_per, dtype):
    """Merged level + stage-1 pool step: one 64-group output block
    per grid step (models.device.DeviceCwMerged).  Chunk positions
    are static: kk < lvl_per is the level chunk of group kk // cap
    (scalar-row scatter); the rest are pool chunks whose relative
    rowmap rides in local_index bits 14+ (per-lane scatter)."""
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (64, LANE), 0)
    acc_blk = jnp.zeros((64, LANE), dtype=dtype)
    for kk in range(kl):
        a4 = ws_ref[0, 0, kk]
        locv = l_ref[kk]
        llane = locv & (LANE - 1)
        sel = (locv >> 7) & (d - 1)
        val = v_ref[kk]
        g = jnp.zeros((SUBLANE, LANE), dtype=dtype)
        for p in range(d):
            T = x_ref[p, pl.ds(a4, SUBLANE), :]
            gthr = jnp.take_along_axis(T, llane, axis=1)
            g = g + jnp.where(sel == p, gthr, jnp.zeros_like(gthr))
        acc = val * g
        if kk < lvl_per:
            strip = jnp.sum(acc, axis=0, keepdims=True)
            acc_blk = acc_blk + jnp.where(
                row_iota == (kk // cap),
                jnp.broadcast_to(strip, (64, LANE)),
                jnp.zeros((64, LANE), dtype=dtype),
            )
        else:
            rm = locv >> 14
            for s in range(SUBLANE):
                acc_blk = acc_blk + jnp.where(
                    row_iota == rm[s][None, :],
                    jnp.broadcast_to(acc[s][None, :], (64, LANE)),
                    jnp.zeros((64, LANE), dtype=dtype),
                )
    y_ref[:] = acc_blk


def _cw_merged_call(mg, xt, interpret):
    kl = mg.kl
    kernel = functools.partial(
        _cw_merged_kernel, d=mg.d, kl=kl, cap=mg.cap,
        lvl_per=mg.lvl_per_block, dtype=mg.value.dtype,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(mg.num_blocks,),
            in_specs=[
                pl.BlockSpec((1, 1, kl), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((kl, SUBLANE, LANE),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kl, SUBLANE, LANE),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (64, LANE), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (mg.num_blocks * 64, LANE), mg.value.dtype
        ),
        compiler_params=_cw_vmem_params(xt, kl, 1, mg.num_blocks * 64,
                                        mg.value.dtype),
        interpret=interpret,
    )(mg.anchor4, xt, mg.value, mg.local_index)


# Chunks unrolled per fori_loop body in the merged SpMM kernel: the
# fully-unrolled kl*d*nvec program costs ~6/18 MINUTES of Mosaic
# compile at kl=144, k=2/4 (probe 62); a full roll compiles in ~36 s
# but loses cross-chunk overlap (2.0x per-nnz, probe 62b).  U=16
# keeps ~92% of the unrolled kernel's throughput (per-nnz 0.83 vs
# 0.76 at k=4) at ~30 s compile (probe 62c sweep: U4 1.08 / U8 0.91
# / U16 0.83).
_CW_SPMM_UNROLL = 16


def _cw_merged_spmm_kernel(ws_ref, x_ref, v_ref, l_ref, y_ref, *, d,
                           kl, cap, lvl_per, nvec, dtype,
                           unroll=_CW_SPMM_UNROLL):
    """Merged-grid SpMM: level region [0, lvl_per) then pool region
    [lvl_per, kl), each as a partially-unrolled lax.fori_loop over
    chunks (non-aligned remainders peel off as unrolled epilogues).
    ``unroll >= kl`` degenerates to the fully-unrolled body (used in
    interpret mode, where a traced fori_loop is pathologically slow
    to execute eagerly)."""
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (64, LANE), 0)

    def chunk_acc(kk, v):
        a4 = ws_ref[0, 0, kk]
        locv = l_ref[kk]
        llane = locv & (LANE - 1)
        sel = (locv >> 7) & (d - 1)
        g = jnp.zeros((SUBLANE, LANE), dtype=dtype)
        for p in range(d):
            T = x_ref[p, v, pl.ds(a4, SUBLANE), :]
            gthr = jnp.take_along_axis(T, llane, axis=1)
            g = g + jnp.where(sel == p, gthr, jnp.zeros_like(gthr))
        return v_ref[kk] * g, locv

    def level_chunk(kk, accs):
        out = list(accs)
        for v in range(nvec):
            acc, _ = chunk_acc(kk, v)
            strip = jnp.sum(acc, axis=0, keepdims=True)
            out[v] = out[v] + jnp.where(
                row_iota == (kk // cap),
                jnp.broadcast_to(strip, (64, LANE)),
                jnp.zeros((64, LANE), dtype=dtype))
        return tuple(out)

    def pool_chunk(kk, accs):
        out = list(accs)
        for v in range(nvec):
            acc, locv = chunk_acc(kk, v)
            rm = locv >> 14
            a = out[v]
            for s in range(SUBLANE):
                a = a + jnp.where(
                    row_iota == rm[s][None, :],
                    jnp.broadcast_to(acc[s][None, :], (64, LANE)),
                    jnp.zeros((64, LANE), dtype=dtype))
            out[v] = a
        return tuple(out)

    def run_region(lo, hi, chunk_fn, accs):
        U = unroll
        span = hi - lo
        if U >= span:                      # fully-unrolled degenerate
            for kk in range(lo, hi):
                accs = chunk_fn(kk, accs)
            return accs
        steps = span // U

        def body(s, accs):
            for u in range(U):
                accs = chunk_fn(lo + s * U + u, accs)
            return accs

        if steps > 0:
            accs = jax.lax.fori_loop(0, steps, body, accs)
        for kk in range(lo + steps * U, hi):   # peeled remainder
            accs = chunk_fn(kk, accs)
        return accs

    accs = tuple(jnp.zeros((64, LANE), dtype=dtype)
                 for _ in range(nvec))
    accs = run_region(0, lvl_per, level_chunk, accs)
    accs = run_region(lvl_per, kl, pool_chunk, accs)
    for v in range(nvec):
        y_ref[:, v, :] = accs[v]


def _cw_vmem_params(xt, k, nvec, out_rows_total, dtype):
    """Explicit scoped-VMEM limit for the CW SpMV/SpMM calls: the
    whole-x tables (up to 64 MB under the guard) plus double-buffered
    value/index tiles, the output (the TPU allocator has been seen
    stack-allocating the FULL (padded, nvec, LANE) result inside
    chained while-loops, 34.9 MB at k=8/1M rows), and slack must all
    fit — the environment's DEFAULT scoped limit is 16 MB and rejects
    any k >= 4 at 1M columns (same failure mode as the round-3 BSR
    whole-X OOM, BENCH_r03)."""
    itemsize = jnp.dtype(dtype).itemsize
    xbytes = int(xt.size) * itemsize
    tiles = 2 * k * SUBLANE * LANE * (itemsize + 4)
    ybytes = out_rows_total * nvec * LANE * itemsize
    return pltpu.CompilerParams(
        vmem_limit_bytes=int(xbytes + tiles + ybytes
                             + 12 * 1024 * 1024))


def _cw_merged_spmm_call(mg, xt, nvec, interpret):
    kl = mg.kl
    kernel = functools.partial(
        _cw_merged_spmm_kernel, d=mg.d, kl=kl, cap=mg.cap,
        lvl_per=mg.lvl_per_block, nvec=nvec, dtype=mg.value.dtype,
        unroll=(kl if interpret else _CW_SPMM_UNROLL),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(mg.num_blocks,),
            in_specs=[
                pl.BlockSpec((1, 1, kl), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((kl, SUBLANE, LANE),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kl, SUBLANE, LANE),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (64, nvec, LANE), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (mg.num_blocks * 64, nvec, LANE), mg.value.dtype
        ),
        compiler_params=_cw_vmem_params(xt, kl, nvec,
                                        mg.num_blocks * 64,
                                        mg.value.dtype),
        interpret=interpret,
    )(mg.anchor4, xt, mg.value, mg.local_index)


def _cw_value_dtype(A):
    if A.merged is not None:
        return A.merged.value.dtype
    return A.levels[0].value.dtype


def _cw_sources(A):
    if A.merged is not None:
        yield (A.merged.xr4, A.merged.d)
    for lvl in A.levels:
        yield (lvl.xr4, lvl.d)
    if A.pool is not None:
        yield (A.pool.xr4, A.pool.d)
    for tp in A.tail_pools:
        yield (tp.xr4, tp.d)


def _cw_vmem_guard(A, nvec=1):
    sources = list(_cw_sources(A))
    xbytes = max(
        xr4 * d for xr4, d in sources
    ) * LANE * nvec * _cw_value_dtype(A).itemsize
    # 64 MB leaves >= half of v5e's 128 MB VMEM for value/index tiles
    # and the y block; k=8 at 1M columns (33 MB of tables) ran clean
    # in probes 61/62.  (The old 8 MB bound predated SpMM and blocked
    # every multi-RHS call at the cliff scale.)
    if xbytes > 64 * 1024 * 1024:
        raise MatrixError(
            f"x ({xbytes/1e6:.0f} MB padded, all {nvec} RHS) exceeds "
            "the WELL-CW whole-x VMEM budget; shard the matrix "
            "(spmv_tpu.parallel), split the RHS block, or use "
            "DIA/WELL segmented paths"
        )


@functools.partial(jax.jit, static_argnames=("interpret",))
def wellcw_spmv_padded(A, x, interpret: bool = False) -> jax.Array:
    """y = A @ x over the CW levels (remainder not included), length
    round_up(num_groups, 8 * blocks_per_out) * 128."""
    _cw_vmem_guard(A)
    out_rows = SUBLANE * A.blocks_per_out
    padded_groups = round_up(A.num_groups, out_rows)
    xf = x.astype(_cw_value_dtype(A))
    tables_for = _cw_table_reuse(lambda src: _cw_tables(src, xf))
    y = None
    if A.merged is not None:
        y = _cw_merged_call(A.merged, tables_for(A.merged),
                            interpret)
        padded_groups = y.shape[0]
    for lvl in A.levels:
        y2d = _cw_level_call(lvl, tables_for(lvl), padded_groups,
                             out_rows, interpret)
        y = y2d if y is None else y + y2d
    if A.pool is not None:
        y2d = _cw_pool_call(A.pool, tables_for(A.pool),
                            padded_groups, out_rows, interpret)
        y = y2d if y is None else y + y2d
    for tp in A.tail_pools:
        tg = round_up(A.num_groups, tp.out_rows)
        y2d = _cw_pool_call(tp, tables_for(tp), tg, tp.out_rows,
                            interpret)
        pad = padded_groups - y2d.shape[0]
        if pad > 0:
            y2d = jnp.pad(y2d, ((0, pad), (0, 0)))
        elif pad < 0:
            y2d = y2d[:padded_groups]
        y = y2d if y is None else y + y2d
    return y.reshape(-1)


def wellcw_spmv(A, x, interpret: bool = False) -> jax.Array:
    """y = A @ x including the remainder, true row count."""
    if interpret:
        y = wellcw_spmv_padded(A, x, interpret=True)
    else:
        # The CW kernels' unrolled gathers make Python tracing the
        # dominant fresh-process cost (~4 s at modest shapes); the AOT
        # trace cache skips it entirely on warm runs (measured
        # 5.5 s -> 0.04 s first-SpMV with a warm cache).
        from spmv_tpu.utils.aotcache import aot_call

        y = aot_call("wellcw_spmv_padded", wellcw_spmv_padded, (A, x))
    y = y[: A.num_rows]
    if A.remainder is not None:
        from spmv_tpu.ops.spmv import spmv as _xla_spmv

        y = y + _xla_spmv(A.remainder, x.astype(y.dtype))
    return y


def _cw_spmm_kernel(blk_ref, ws_ref, grp_ref, x_ref, v_ref, l_ref,
                    y_ref, *, d, k, nvec, out_rows, dtype):
    i = pl.program_id(0)
    first = jnp.logical_or(
        i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)]
    )
    row_iota = jax.lax.broadcasted_iota(
        jnp.int32, (out_rows, LANE), 0)
    accs = [jnp.zeros((out_rows, LANE), dtype=dtype)
            for _ in range(nvec)]
    for kk in range(k):
        a4 = ws_ref[0, 0, kk]
        locv = l_ref[kk]
        llane = locv & (LANE - 1)                    # (8, LANE)
        sel = (locv >> 7) & (d - 1)
        val = v_ref[kk]
        grow = grp_ref[0, 0, kk] % out_rows
        for v in range(nvec):
            g = jnp.zeros((SUBLANE, LANE), dtype=dtype)
            for p in range(d):
                # per-RHS-contiguous table: the gather is the SpMV
                # gather (see _cw_tables3; probe 61/62 measured the
                # old strided slice at 2.2-3.8x worse per-nnz)
                T = x_ref[p, v, pl.ds(a4, SUBLANE), :]
                gthr = jnp.take_along_axis(T, llane, axis=1)
                g = g + jnp.where(sel == p, gthr,
                                  jnp.zeros_like(gthr))
            strip = jnp.sum(val * g, axis=0, keepdims=True)
            accs[v] = accs[v] + jnp.where(
                row_iota == grow,
                jnp.broadcast_to(strip, (out_rows, LANE)),
                jnp.zeros((out_rows, LANE), dtype=dtype),
            )

    @pl.when(first)
    def _():
        for v in range(nvec):
            y_ref[:, v, :] = accs[v]

    @pl.when(jnp.logical_not(first))
    def _():
        for v in range(nvec):
            y_ref[:, v, :] += accs[v]


def _cw_pool_spmm_kernel(blk_ref, ws_ref, x_ref, v_ref, l_ref,
                         rm_ref, y_ref, *, d, k, nvec, out_rows,
                         dtype):
    i = pl.program_id(0)
    first = jnp.logical_or(
        i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)]
    )
    row_iota = jax.lax.broadcasted_iota(
        jnp.int32, (out_rows, nvec, LANE), 0)
    base = blk_ref[i] * out_rows
    acc_blk = jnp.zeros((out_rows, nvec, LANE), dtype=dtype)
    for kk in range(k):
        a4 = ws_ref[0, 0, kk]
        locv = l_ref[kk]
        llane = locv & (LANE - 1)                   # (8, LANE)
        sel = (locv >> 7) & (d - 1)
        val = v_ref[kk]
        rm = rm_ref[kk] - base                      # (8, LANE)
        # GATHER per RHS on the contiguous tables (the probe-61 fix);
        # SCATTER stays the stacked 3-D form — the per-v scatter
        # variant made XLA's CPU compile (interpret-mode tests)
        # pathologically slow (~7 min for a 700-row fixture).
        gs = []
        for v in range(nvec):
            g = jnp.zeros((SUBLANE, LANE), dtype=dtype)
            for p in range(d):
                T = x_ref[p, v, pl.ds(a4, SUBLANE), :]
                gthr = jnp.take_along_axis(T, llane, axis=1)
                g = g + jnp.where(sel == p, gthr,
                                  jnp.zeros_like(gthr))
            gs.append(val * g)
        acc = jnp.stack(gs, axis=1)                 # (8, nvec, LANE)
        for sl in range(SUBLANE):
            acc_blk = acc_blk + jnp.where(
                row_iota == rm[sl][None, None, :],
                jnp.broadcast_to(acc[sl][None],
                                 (out_rows, nvec, LANE)),
                jnp.zeros((out_rows, nvec, LANE), dtype=dtype),
            )

    @pl.when(first)
    def _():
        y_ref[:] = acc_blk

    @pl.when(jnp.logical_not(first))
    def _():
        y_ref[:] += acc_blk


def _cw_pool_spmm_call(pool, xt, padded_groups, out_rows, nvec,
                       interpret):
    k = pool.chunks_per_step
    steps = pool.num_chunks // k
    kernel = functools.partial(
        _cw_pool_spmm_kernel, d=pool.d, k=k, nvec=nvec,
        out_rows=out_rows, dtype=pool.value.dtype,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((1, 1, k), lambda i, blk: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((k, SUBLANE, LANE),
                             lambda i, blk: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, SUBLANE, LANE),
                             lambda i, blk: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, SUBLANE, LANE),
                             lambda i, blk: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (out_rows, nvec, LANE),
                lambda i, blk: (blk[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (padded_groups, nvec, LANE), pool.value.dtype
        ),
        compiler_params=_cw_vmem_params(xt, k, nvec, padded_groups,
                                        pool.value.dtype),
        interpret=interpret,
    )(pool.block_of_step, pool.anchor4,
      xt, pool.value, pool.local_index, pool.rowmap)


def _cw_tables3(src, XT, nvec):
    """PER-RHS-CONTIGUOUS stride-d tables for SpMM:
    (d, nvec, xr4, LANE).

    The round-4 layout was (d, xr4, nvec, LANE), making the kernels
    slice ``T[:, v, :]`` — a stride-nvec sublane view Mosaic had to
    relayout before EVERY gather, pricing the SpMM at 2.2-3.8x worse
    per-nnz than repeated SpMV (probe 61).  With each RHS contiguous,
    the per-RHS gather is byte-identical to the proven SpMV gather
    and the chunk's index decode + A-value loads amortize over k:
    measured per-nnz 0.92x (k=2) / 0.76x (k=4) of single-RHS
    (probe 62)."""
    d, xr4 = src.d, src.xr4
    # XT is the pre-transposed (nvec, n) X — the 16 MB-per-RHS-block
    # relayout happens ONCE in _wellcw_spmm_padded, not per source
    # (merged + pool + tail pools each build their own tables).
    pad = xr4 * d * LANE - XT.shape[1]
    x3d = jnp.pad(XT, ((0, 0), (0, pad)))
    x3d = x3d.reshape(nvec, xr4 * d, LANE)
    return jnp.stack([x3d[:, p::d, :] for p in range(d)])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _wellcw_spmm_padded(A, X, interpret: bool = False) -> jax.Array:
    nvec = X.shape[1]
    _cw_vmem_guard(A, nvec)
    out_rows = SUBLANE * A.blocks_per_out
    padded_groups = round_up(A.num_groups, out_rows)
    Xf = X.astype(_cw_value_dtype(A))
    XT = Xf.T
    tables_for = _cw_table_reuse(
        lambda src: _cw_tables3(src, XT, nvec))
    y = None
    if A.merged is not None:
        y = _cw_merged_spmm_call(
            A.merged, tables_for(A.merged), nvec,
            interpret)
        padded_groups = y.shape[0]
    for lvl in A.levels:
        d = lvl.d
        xt = tables_for(lvl)
        k = lvl.chunks_per_step
        steps = lvl.num_chunks // k
        kernel = functools.partial(
            _cw_spmm_kernel, d=d, k=k, nvec=nvec, out_rows=out_rows,
            dtype=lvl.value.dtype,
        )
        y3d = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(steps,),
                in_specs=[
                    pl.BlockSpec((1, 1, k), lambda i, blk: (i, 0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, 1, k), lambda i, blk: (i, 0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec((k, SUBLANE, LANE),
                                 lambda i, blk: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((k, SUBLANE, LANE),
                                 lambda i, blk: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (out_rows, nvec, LANE),
                    lambda i, blk: (blk[i], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (padded_groups, nvec, LANE), lvl.value.dtype
            ),
            compiler_params=_cw_vmem_params(xt, k, nvec,
                                            padded_groups,
                                            lvl.value.dtype),
            interpret=interpret,
        )(lvl.block_of_step, lvl.anchor4, lvl.group_of_chunk,
          xt, lvl.value, lvl.local_index)
        y = y3d if y is None else y + y3d
    if A.pool is not None:
        xt = tables_for(A.pool)
        y3d = _cw_pool_spmm_call(A.pool, xt, padded_groups, out_rows,
                                 nvec, interpret)
        y = y3d if y is None else y + y3d
    for tp in A.tail_pools:
        tg = round_up(A.num_groups, tp.out_rows)
        y3d = _cw_pool_spmm_call(tp, tables_for(tp), tg,
                                 tp.out_rows, nvec, interpret)
        pad = padded_groups - y3d.shape[0]
        if pad > 0:
            y3d = jnp.pad(y3d, ((0, pad), (0, 0), (0, 0)))
        elif pad < 0:
            y3d = y3d[:padded_groups]
        y = y3d if y is None else y + y3d
    return y.transpose(0, 2, 1).reshape(-1, nvec)


def wellcw_spmm(A, X, interpret: bool = False) -> jax.Array:
    """Y = A @ X including the remainder, true row count."""
    if interpret:
        Y = _wellcw_spmm_padded(A, X, interpret=True)
    else:
        from spmv_tpu.utils.aotcache import aot_call

        Y = aot_call("wellcw_spmm_padded", _wellcw_spmm_padded, (A, X))
    Y = Y[: A.num_rows]
    if A.remainder is not None:
        from spmv_tpu.ops.spmv import spmm as _xla_spmm

        Y = Y + _xla_spmm(A.remainder, X.astype(Y.dtype))[: A.num_rows]
    return Y
