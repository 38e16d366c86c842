"""Fused multigrid V-cycle: the whole AMG apply in ONE Pallas kernel.

Why (probe 53c, experiments/RESULTS.md): the unfused block V-cycle
costs ~4.3 ms at 1M rows while a plain CG iteration costs 25 us on the
same chip — every standalone op in the cycle pays a ~0.4-0.7 ms
dispatch/DMA floor that a single streaming loop amortizes away.  The
V-cycle is ~40 small sequential ops, so the floor IS the cost.  PLAN
item 11 records the fix measured here: all levels of a block-SA
hierarchy are DIA and the whole working set fits VMEM below ~2M rows
(f32), so the entire cycle — smoothers, residuals, transfers, coarse
dense solve — can run inside one kernel with zero HBM round-trips
between ops.

The reference has no multigrid at all (SURVEY.md §2: its solve story
stops at SpMV); this module is TPU-native invention on top of the
block-SA hierarchy of :mod:`spmv_tpu.ops.amg`.

Design — the lane-folded vector layout
--------------------------------------

Pallas TPU punishes sublane gathers but is fast at static sublane
slices and lane rolls (see ops/pallas_kernels.py module docstring).
The fused kernel therefore stores a level-l vector of length
``n_l = R_l * 128`` as a ``(R_l, 128)`` array where **lane c holds the
contiguous chunk** ``v[c*R_l : (c+1)*R_l]`` (column-chunked, unlike
the row-major fold of DeviceDia).  Consequences:

- a DIA matvec's ``x[i + off]`` is a pure **static sublane shift** of
  a halo-widened copy (halo = the neighbouring lanes' chunk edges,
  rebuilt per matvec from two ``pltpu.roll`` lane shifts);
- block restriction (aggregates = runs of ``block`` consecutive rows,
  exactly the hierarchy :func:`~spmv_tpu.ops.amg.block_aggregation_setup`
  builds) is ``reshape(R//b, b, 128).sum(1)`` — a sublane fold whose
  output is *already* the coarse level's folded layout, because
  ``R_{l+1} = R_l / b`` keeps chunk boundaries aligned;
- prolongation is ``jnp.repeat(-, b, axis=0)`` — a sublane broadcast;
- the coarse dense solve runs as ``Rc x Rc`` MXU matmuls of (128,128)
  blocks of the inverse, **pre-permuted on the host into the folded
  basis** so no in-kernel transpose exists.

Alignment contract: every level's ``n`` must be divisible by
``128 * block``, all the way down to a coarsest size that is a
multiple of 128.  :func:`fused_block_setup` pre-pads the input matrix
with identity rows (mean-|diag| value, as amg._pad_csr_identity does)
to the unique multiple of ``128 * block**L`` — the price is <= 25%
padding for ``coarse_max=512``; the padded rows decouple and cost
proportional extra stream.

Every diagonal offset must satisfy ``|off| <= R_l`` (the halo covers
exactly the two neighbouring lanes); for a row-major 2-D grid this
means "at least 128 grid lines", which holds for every problem large
enough to want a fused cycle.  Violations raise MatrixError — fall
back to :func:`~spmv_tpu.ops.amg.block_vcycle`.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.errors import MatrixError
from spmv_tpu.models.device import LANE, SUBLANE, round_up

__all__ = [
    "fused_block_setup",
    "fused_vcycle_device",
    "fused_vcycle",
    "fused_vcycle_preconditioner",
    "FusedVcycle",
]


# ---------------------------------------------------------------------
# setup: a block hierarchy with fused-kernel alignment
# ---------------------------------------------------------------------

def _choose_depth(n: int, block: int, coarse_max: int,
                  max_levels: int) -> int:
    """Smallest L (>= 1) whose coarsest padded size fits coarse_max."""
    level = 1
    while (-(-n // (LANE * block ** level)) * LANE > coarse_max
           and level < max_levels):
        level += 1
    return level


def fused_block_setup(
    m,
    block: int = 4,
    coarse_max: int = 512,
    max_levels: int = 8,
    **setup_kw,
):
    """Build a :class:`~spmv_tpu.ops.amg.BlockAmgHierarchy` whose every
    level satisfies the fused kernel's alignment contract.

    The input is pre-padded with identity rows to a multiple of
    ``128 * block**L`` so the internal per-level padding of
    ``block_aggregation_setup`` is a no-op and level sizes divide
    exactly by ``block`` all the way down.  ``setup_kw`` forwards to
    block_aggregation_setup (e.g. ``smooth_levels``).
    """
    from spmv_tpu.models.csr import CsrMatrix
    from spmv_tpu.ops.amg import (
        _as_host_csr,
        _extract_diag,
        _pad_csr_identity,
        block_aggregation_setup,
    )

    if m.num_rows != m.num_columns:
        raise MatrixError("fused V-cycle requires a square matrix")
    n = m.num_rows
    depth = _choose_depth(n, block, coarse_max, max_levels)
    unit = LANE * block ** depth
    n_pad = -(-n // unit) * unit
    rp, cols, vals = _as_host_csr(m)
    if n_pad != n:
        d = _extract_diag(n, rp, cols, vals)
        dmean = float(np.abs(d).mean()) or 1.0
        rp, cols, vals = _pad_csr_identity(n, n_pad, rp, cols, vals,
                                           dmean)
    host = CsrMatrix(n_pad, n_pad, len(vals), 1, rp, cols, vals)
    hier = block_aggregation_setup(
        host, block=block, max_levels=depth, coarse_size=0, **setup_kw)
    hier.original_rows = n          # for pad/unpad at the boundary
    return hier


# ---------------------------------------------------------------------
# device hierarchy in the folded layout
# ---------------------------------------------------------------------

@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "dinv", "coarse"],
    meta_fields=["offsets", "chunk_rows", "halos", "omegas", "los",
                 "his", "wscales", "smoothed", "block", "degree",
                 "num_rows", "padded_rows"],
)
@dataclasses.dataclass
class FusedVcycle:
    """Device arrays + static geometry for the fused kernel.

    ``data[l]`` is ``(D_l, R_l, 128)`` with
    ``data[l][k, r, c] = A_l[i, i + offsets[l][k]]`` at ``i = c*R_l + r``
    (the folded layout); ``coarse`` is the dense coarse inverse as
    ``(Rc, Rc, 128, 128)`` MXU blocks in the folded basis.
    """

    data: tuple              # per level (D_l, R_l, LANE)
    dinv: tuple              # per level (R_l, LANE)
    coarse: jax.Array        # (Rc, Rc, LANE, LANE)
    offsets: tuple           # per level tuple[int, ...]
    chunk_rows: tuple        # per level R_l
    halos: tuple             # per level H_l (multiple of SUBLANE)
    omegas: tuple            # per level float
    los: tuple
    his: tuple
    wscales: tuple
    smoothed: tuple          # per level bool
    block: int
    degree: int
    num_rows: int            # original (pre-pad) rows
    padded_rows: int


def _fold(vec: np.ndarray, chunk: int) -> np.ndarray:
    """Natural (n,) -> folded (R, 128): lane c holds chunk c."""
    return np.ascontiguousarray(vec.reshape(LANE, chunk).T)


def fused_vcycle_device(
    hierarchy,
    dtype=jnp.float32,
    smoother_degree: int = 3,
    smoother_band=(1.0 / 30.0, 1.1),
) -> FusedVcycle:
    """Push a fused-aligned block hierarchy to the folded layout."""
    from spmv_tpu.models.csr import CsrMatrix
    from spmv_tpu.models.dia import DiaMatrix

    if not hierarchy.levels:
        raise MatrixError("hierarchy has no levels — matrix is "
                          "already coarse; use a dense solve")
    data, dinv, offsets, chunks, halos = [], [], [], [], []
    omegas, los, his, wscales, smoothed = [], [], [], [], []
    for lv in hierarchy.levels:
        if lv.n != lv.n_pad or lv.n_pad % (LANE * lv.block):
            raise MatrixError(
                "hierarchy levels are not fused-aligned — build with "
                "fused_block_setup")
        rp, cols, vals = lv.a
        host = CsrMatrix(lv.n_pad, lv.n_pad, len(vals), 1, rp, cols,
                         vals)
        dia = DiaMatrix.from_csr(host)
        chunk = lv.n_pad // LANE
        offs = tuple(int(o) for o in dia.offsets)
        span = max(abs(o) for o in offs) if offs else 0
        if span > chunk:
            raise MatrixError(
                f"diagonal offset {span} exceeds the {chunk}-row lane "
                "chunk — the halo covers only adjacent lanes; use "
                "block_vcycle for this level structure")
        halo = round_up(max(span, 1), SUBLANE)
        data.append(jnp.asarray(
            dia.data.reshape(len(offs), LANE, chunk).transpose(0, 2, 1),
            dtype))
        dinv.append(jnp.asarray(_fold(lv.dinv, chunk), dtype))
        offsets.append(offs)
        chunks.append(chunk)
        halos.append(halo)
        omegas.append(float(lv.omega))
        los.append(float(smoother_band[0] * lv.lambda_max))
        his.append(float(smoother_band[1] * lv.lambda_max))
        wscales.append(float(1.0 / np.sqrt(lv.block)))
        smoothed.append(bool(lv.smoothed))

    cinv = np.asarray(hierarchy.coarse_inv)
    nc = cinv.shape[0]
    if nc % LANE:
        raise MatrixError("coarse size must be a multiple of 128 — "
                          "build with fused_block_setup")
    rc = nc // LANE
    # folded basis: position (r, c) holds natural index c*rc + r, so
    # blocks[ri, ro][ci, co] = Cinv[co*rc + ro, ci*rc + ri]
    coarse = jnp.asarray(
        cinv.reshape(LANE, rc, LANE, rc).transpose(3, 1, 2, 0), dtype)

    return FusedVcycle(
        data=tuple(data), dinv=tuple(dinv), coarse=coarse,
        offsets=tuple(offsets), chunk_rows=tuple(chunks),
        halos=tuple(halos), omegas=tuple(omegas), los=tuple(los),
        his=tuple(his), wscales=tuple(wscales),
        smoothed=tuple(smoothed), block=hierarchy.block,
        degree=int(smoother_degree),
        num_rows=int(getattr(hierarchy, "original_rows",
                             hierarchy.levels[0].n)),
        padded_rows=hierarchy.levels[0].n_pad,
    )


# ---------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------

def _widen(core, halo, chunk, dtype):
    """(R, 128) core -> (H + R + H, 128) with neighbour-lane halos.

    Lane c's top halo = lane c-1's chunk tail, bottom halo = lane
    c+1's chunk head; the outermost lanes' halos are zero (out-of-range
    x is zero — and the DIA data is zero there anyway)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (halo, LANE), 1)
    zero = jnp.zeros((halo, LANE), dtype)
    top = pltpu.roll(
        jax.lax.slice_in_dim(core, chunk - halo, chunk, axis=0),
        1, axis=1)
    top = jnp.where(lane >= 1, top, zero)
    bot = pltpu.roll(
        jax.lax.slice_in_dim(core, 0, halo, axis=0), LANE - 1, axis=1)
    bot = jnp.where(lane < LANE - 1, bot, zero)
    return jnp.concatenate([top, core, bot], axis=0)


def _matvec(data_ref, offs, halo, chunk, core, dtype):
    wide = _widen(core, halo, chunk, dtype)
    acc = jnp.zeros((chunk, LANE), dtype)
    for k, off in enumerate(offs):
        acc = acc + data_ref[k] * jax.lax.slice_in_dim(
            wide, halo + off, halo + off + chunk, axis=0)
    return acc


def _cheb(mv, dinv, b, x, lo, hi, degree):
    """_cheb_smooth (ops/amg.py) verbatim on folded values."""
    theta = (hi + lo) / 2.0
    delta = (hi - lo) / 2.0
    sigma1 = theta / delta
    r = dinv * (b - mv(x))
    p = r / theta
    rho = 1.0 / sigma1
    for _ in range(degree):
        x = x + p
        r = r - dinv * mv(p)
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        p = rho_new * rho * p + (2.0 * rho_new / delta) * r
        rho = rho_new
    return x


def _fused_kernel(*refs, fv: FusedVcycle, dtype):
    nl = len(fv.data)
    b_ref = refs[0]
    data_refs = refs[1:1 + nl]
    dinv_refs = refs[1 + nl:1 + 2 * nl]
    coarse_ref = refs[1 + 2 * nl]
    y_ref = refs[2 + 2 * nl]
    block = fv.block

    def coarse_solve(b):
        rc = fv.coarse.shape[0]
        rows = []
        for ro in range(rc):
            acc = jnp.zeros((1, LANE), dtype)
            for ri in range(rc):
                acc = acc + jnp.dot(
                    jax.lax.slice_in_dim(b, ri, ri + 1, axis=0),
                    coarse_ref[ri, ro],
                    preferred_element_type=dtype)
            rows.append(acc)
        return rows[0] if rc == 1 else jnp.concatenate(rows, axis=0)

    def cycle(level, b):
        if level == nl:
            return coarse_solve(b)
        offs = fv.offsets[level]
        chunk = fv.chunk_rows[level]
        halo = fv.halos[level]
        dinv = dinv_refs[level][...]
        omega = fv.omegas[level]
        lo, hi = fv.los[level], fv.his[level]
        wscale = fv.wscales[level]

        def mv(v):
            return _matvec(data_refs[level], offs, halo, chunk, v,
                           dtype)

        x = _cheb(mv, dinv, b, jnp.zeros((chunk, LANE), dtype), lo,
                  hi, fv.degree)
        r = b - mv(x)
        rs = r - omega * mv(dinv * r) if fv.smoothed[level] else r
        rcoarse = rs.reshape(chunk // block, block, LANE).sum(
            axis=1) * wscale
        xc = cycle(level + 1, rcoarse)
        y0 = jnp.repeat(xc, block, axis=0) * wscale
        x = x + (y0 - omega * dinv * mv(y0) if fv.smoothed[level]
                 else y0)
        return _cheb(mv, dinv, b, x, lo, hi, fv.degree)

    y_ref[...] = cycle(0, b_ref[...])


def _vmem_limit(fv: FusedVcycle, itemsize: int) -> int:
    fixed = sum(int(np.prod(d.shape)) for d in fv.data)
    fixed += sum(int(np.prod(d.shape)) for d in fv.dinv)
    fixed += int(np.prod(fv.coarse.shape))
    fixed += 2 * fv.chunk_rows[0] * LANE          # b + y
    vecs = sum((r + 2 * h) * LANE
               for r, h in zip(fv.chunk_rows, fv.halos))
    return min(int((fixed + 6 * vecs) * itemsize) + 16 * 1024 * 1024,
               127 * 1024 * 1024)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_vcycle_folded(fv: FusedVcycle, b2d: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """M^-1 b on the folded padded layout: (R0, 128) -> (R0, 128)."""
    dtype = fv.data[0].dtype
    chunk = fv.chunk_rows[0]
    if b2d.shape != (chunk, LANE):
        raise MatrixError(
            f"b2d has shape {b2d.shape}, expected {(chunk, LANE)}")
    kernel = functools.partial(_fused_kernel, fv=fv, dtype=dtype)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_in = 2 + 2 * len(fv.data)
    return pl.pallas_call(
        kernel,
        in_specs=[vm] * n_in,
        out_specs=vm,
        out_shape=jax.ShapeDtypeStruct((chunk, LANE), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(
                fv, jnp.dtype(dtype).itemsize)),
        interpret=interpret,
    )(b2d.astype(dtype), *fv.data, *fv.dinv, fv.coarse)


def fold_vector(fv: FusedVcycle, r: jax.Array) -> jax.Array:
    """Natural (num_rows,) -> folded (R0, 128)."""
    rp = jnp.pad(r, (0, fv.padded_rows - fv.num_rows))
    return rp.reshape(LANE, fv.chunk_rows[0]).T


def unfold_vector(fv: FusedVcycle, y2d: jax.Array) -> jax.Array:
    """Folded (R0, 128) -> natural (num_rows,)."""
    return y2d.T.reshape(-1)[: fv.num_rows]


def fused_vcycle(fv: FusedVcycle, r: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """M^-1 r on the ORIGINAL n-vector (pad/fold -> kernel -> unfold)."""
    return unfold_vector(
        fv, fused_vcycle_folded(fv, fold_vector(fv, r), interpret))


def fused_vcycle_preconditioner(
    m=None,
    hierarchy=None,
    dtype=jnp.float32,
    smoother_degree: int = 3,
    interpret: bool = False,
    **setup_kw,
):
    """(apply, info) closure — drop-in for
    preconditioned_conjugate_gradient, like block_amg_preconditioner
    but applying the whole cycle in one Pallas kernel."""
    if hierarchy is None:
        if m is None:
            raise ValueError("need a host matrix or a hierarchy")
        hierarchy = fused_block_setup(m, **setup_kw)
    fv = fused_vcycle_device(hierarchy, dtype=dtype,
                             smoother_degree=smoother_degree)

    def apply(r):
        return fused_vcycle(fv, r, interpret=interpret)

    info = {
        "kind": "sa-amg-fused",
        "block": fv.block,
        "levels": len(fv.data) + 1,
        "level_rows": [r * LANE for r in fv.chunk_rows]
        + [fv.coarse.shape[0] * LANE],
        "num_diagonals": [len(o) for o in fv.offsets],
        "operator_complexity": hierarchy.operator_complexity,
        "smoother": f"chebyshev(degree={smoother_degree})",
        "vmem_limit_bytes": _vmem_limit(
            fv, jnp.dtype(dtype).itemsize),
    }
    return apply, info
