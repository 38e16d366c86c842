"""Probe 28: chunk-window WELL cost ablation + two-level packing.

Probe 27 landed at 12.3 Gnnz/s (d=4, K=32, B=4, fill 0.24, spill 4%)
on random-banded 1M/bw4096.  Questions:

1. Where does the 20.8 ns/chunk go? Ablate: take_along_axis, the
   where-select, the dynamic window slice, the y scatter.
2. Does K=64/B=8 help (step overhead is 230-330 ns)?
3. Two-level packing: level-1 d=4 cap=2 (dense chunks), overflow
   repacked at d=8 (wide window) instead of spilling — windows tile
   the whole column space at every d, so spill is only multiplicity
   overflow, and a second level absorbs it at ~no cost.
4. How fast is the XLA remainder path actually (the final <2%)?
"""

import functools
import importlib.util
import sys
import time

import numpy as np

spec = importlib.util.spec_from_file_location(
    "p27", "/root/repo/experiments/tpu_probe27_chunk_window.py")
p27 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(p27)

LANE, SUBLANE, GROUP = p27.LANE, p27.SUBLANE, p27.GROUP


def cw_kernel_ablate(blk_ref, ws_ref, grp_ref, x_ref, v_ref, l_ref,
                     y_ref, *, d, k, out_rows, dtype, mode):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    first = jnp.logical_or(
        i == 0, blk_ref[i] != blk_ref[jnp.maximum(i - 1, 0)])
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (out_rows, LANE), 0)
    acc_blk = jnp.zeros((out_rows, LANE), dtype=dtype)
    for kk in range(k):
        a4 = ws_ref[0, 0, kk]
        locv = l_ref[kk]
        llane = locv & (LANE - 1)
        sel = (locv >> 7) & (d - 1)
        val = v_ref[kk]
        acc = jnp.zeros((SUBLANE, LANE), dtype=dtype)
        for p in range(d):
            if mode == "static_slice":
                T = x_ref[p, 0:SUBLANE, :]
            else:
                T = x_ref[p, pl.ds(a4, SUBLANE), :]
            if mode == "no_take":
                gthr = T
            else:
                gthr = jnp.take_along_axis(T, llane, axis=1)
            if mode == "no_where":
                acc = acc + val * gthr
            else:
                acc = acc + jnp.where(sel == p, val * gthr,
                                      jnp.zeros_like(val))
        if mode == "no_scatter":
            acc_blk = acc_blk + jnp.concatenate(
                [acc] * (out_rows // SUBLANE), axis=0)
        else:
            strip = jnp.sum(acc, axis=0, keepdims=True)
            grow = grp_ref[0, 0, kk] % out_rows
            acc_blk = acc_blk + jnp.where(
                row_iota == grow,
                jnp.broadcast_to(strip, (out_rows, LANE)),
                jnp.zeros((out_rows, LANE), dtype=dtype))

    @pl.when(first)
    def _():
        y_ref[:] = acc_blk

    @pl.when(jnp.logical_not(first))
    def _():
        y_ref[:] += acc_blk


def cw_call(value, loc, ws, grp2, blks, x, num_rows, d, xr4, k, b,
            mode="full"):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    steps = value.shape[0] // k
    num_groups = -(-num_rows // GROUP)
    out_rows = SUBLANE * b
    padded_groups = -(-num_groups // out_rows) * out_rows
    x2d = jnp.pad(x, (0, xr4 * d * LANE - x.shape[0])).reshape(
        xr4 * d, LANE)
    xt = jnp.stack([x2d[p::d] for p in range(d)])
    kern = functools.partial(cw_kernel_ablate, d=d, k=k,
                             out_rows=out_rows, dtype=value.dtype,
                             mode=mode)
    y2d = pl.pallas_call(
        kern,
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
            out_specs=pl.BlockSpec((out_rows, LANE),
                                   lambda i, blk: (blk[i], 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((padded_groups, LANE),
                                       value.dtype),
        interpret=False,
    )(jnp.asarray(blks), jnp.asarray(ws), jnp.asarray(grp2),
      xt, jnp.asarray(value), jnp.asarray(loc))
    return y2d.reshape(-1)[:num_rows]


def main():
    import jax.numpy as jnp
    from spmv_tpu.profile.harness import time_kernel

    n = 1 << 20
    print("building random banded n=1M bw=4096...", flush=True)
    num_rows, num_cols, rp, cols, vals = p27.banded_random(n, 4096, 16)
    nnz = int(rp[-1])
    num_groups = -(-num_rows // GROUP)
    x = np.random.default_rng(1).standard_normal(num_cols)
    xj = jnp.asarray(x.astype(np.float32))

    def build(d, cap, mp, k, b, sub=None):
        if sub is None:
            sub = np.arange(nnz)
        rp_s = np.zeros(num_rows + 1, np.int64)
        rows_all = np.repeat(np.arange(num_rows, dtype=np.int64),
                             np.diff(rp))
        np.add.at(rp_s, rows_all[sub] + 1, 1)
        np.cumsum(rp_s, out=rp_s)
        value, loc, a4, grp, spill = p27.pack_cw(
            num_rows, num_cols, rp_s, cols[sub], vals[sub], d=d,
            cap=cap, min_pop=mp)
        value, loc, ws, grp2, blks = p27.pad_steps(
            value, loc, a4, grp, num_groups, k=k, out_rows=SUBLANE * b)
        return value, loc, ws, grp2, blks, sub[spill]

    # ---- part 1+2: ablation on the d=4 cap=6 mp=0.05 packing ----
    d, k, b = 4, 32, 4
    value, loc, ws, grp2, blks, spill = build(d, 6, 0.05, k, b)
    xr4 = int(ws.max()) + SUBLANE + 1
    print(f"pack d={d}: chunks={value.shape[0]} "
          f"spill={spill.size/nnz:.3f}", flush=True)
    jv, jl, jw, jg, jb = map(jnp.asarray, (value, loc, ws, grp2, blks))
    for mode in ("full", "no_take", "no_where", "static_slice",
                 "no_scatter"):
        def step(xx, jv, jl, jw, jg, jb, mode=mode):
            return cw_call(jv, jl, jw, jg, jb, xx, num_rows, d, xr4,
                           k, b, mode)
        t = time_kernel(step, (xj, jv, jl, jw, jg, jb), k_small=2,
                        k_large=8, runs=4).seconds_per_iteration
        print(f"ablate {mode:13s}: {t*1e6:8.1f} us "
              f"({t*1e9/value.shape[0]:5.1f} ns/chunk)", flush=True)
    for kk, bb in ((64, 8), (32, 8)):
        v2, l2, w2, g2, b2, _ = build(d, 6, 0.05, kk, bb)
        j2 = list(map(jnp.asarray, (v2, l2, w2, g2, b2)))
        def step(xx, jv, jl, jw, jg, jb, kk=kk, bb=bb):
            return cw_call(jv, jl, jw, jg, jb, xx, num_rows, d, xr4,
                           kk, bb, "full")
        t = time_kernel(step, (xj, *j2), k_small=2, k_large=8,
                        runs=4).seconds_per_iteration
        print(f"K={kk} B={bb}: {t*1e6:8.1f} us  "
              f"{nnz/t/1e9:5.1f} Gnnz/s", flush=True)

    # ---- part 3: two-level packing ----
    for cap1, d2, cap2 in ((2, 8, 4), (3, 8, 4), (2, 8, 6)):
        v1, l1, w1, g1, b1, sp1 = build(4, cap1, 0.12, 32, 4)
        v2, l2, w2, g2, b2, sp2 = build(8, cap2, 0.04, 32, 4, sub=sp1)
        fill = (nnz - sp2.size) / (v1.size + v2.size)
        print(f"two-level d4cap{cap1}+d8cap{cap2}: chunks="
              f"{v1.shape[0]}+{v2.shape[0]} fill={fill:.3f} "
              f"tail={sp2.size/nnz:.4f}", flush=True)
        xr4b = int(w2.max()) + SUBLANE + 1
        ja = list(map(jnp.asarray, (v1, l1, w1, g1, b1)))
        jb2 = list(map(jnp.asarray, (v2, l2, w2, g2, b2)))

        def step2(xx, *arrs):
            a, bz = arrs[:5], arrs[5:]
            y = cw_call(*a, xx, num_rows, 4, xr4, 32, 4, "full")
            y = y + cw_call(*bz, xx, num_rows, 8, xr4b, 32, 4, "full")
            return y
        t = time_kernel(step2, (xj, *ja, *jb2), k_small=2, k_large=8,
                        runs=4).seconds_per_iteration
        print(f"   chip: {t*1e6:8.1f} us  {nnz/t/1e9:5.1f} Gnnz/s",
              flush=True)

    # ---- part 4: XLA remainder path at ~spill size ----
    import jax
    rows_all = np.repeat(np.arange(num_rows, dtype=np.int64),
                         np.diff(rp))
    for frac in (0.01, 0.05):
        m = int(nnz * frac)
        sel = np.random.default_rng(2).choice(nnz, m, replace=False)
        sel.sort()
        sr = jnp.asarray(rows_all[sel].astype(np.int32))
        sc = jnp.asarray(cols[sel].astype(np.int32))
        sv = jnp.asarray(vals[sel].astype(np.float32))

        def xla_coo(xx, sr, sc, sv):
            return jax.ops.segment_sum(
                sv * xx[sc], sr, num_segments=num_rows,
                indices_are_sorted=True)
        t = time_kernel(xla_coo, (xj, sr, sc, sv), k_small=2,
                        k_large=8, runs=4).seconds_per_iteration
        print(f"xla remainder {m} entries: {t*1e6:8.1f} us "
              f"({m/t/1e9:5.2f} Gnnz/s)", flush=True)


if __name__ == "__main__":
    main()
