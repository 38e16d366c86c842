"""Probe 56: pooled-chunk scatter variants (PLAN item 1, VERDICT r4-4).

The merged WELL-CW grid's pool chunks scatter each slot row to the
group named by its per-lane rowmap: 8 per-slot (64,128) masked adds
per chunk (~5x a level chunk's single strip scatter).  The untried
lever: pack pool chunks so each SLOT's rowmap is CONSTANT (one group
per (chunk, slot)), making the rowmap (kl, 8) scalars.  Two candidate
kernels then exist:

  A. per-lane rowmap, 8 masked adds        (current, baseline)
  B. scalar rowmap,  8 masked adds         (kills the rowmap unpack +
                                            vector compare operand)
  C. scalar rowmap,  8 dynamic-row RMWs    (y_ref[ds(row,1)] += strip;
                                            kills the (64,128) masks)

This probe measures ns/chunk for each on synthetic pool-only grids at
the bench case's geometry (d=4, 16 pool chunks/step, 64-row output
blocks), numerics cross-checked.  The fill-cost side (how many MORE
chunks a slot-constant packing needs) is probe 57; the lever only
wins if (chunks_sorted / chunks_now) < (t_A / t_{B or C}).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import functools

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.profile.harness import time_kernel

LANE = 128
SUBLANE = 8
D = 4
K = 16           # pool chunks per step
STEPS = 512
XR4 = 2048
OUT_ROWS = 64

rng = np.random.default_rng(7)
value = rng.standard_normal((STEPS * K, SUBLANE, LANE)).astype(np.float32)
llane = rng.integers(0, LANE, (STEPS * K, SUBLANE, LANE))
sel = rng.integers(0, D, (STEPS * K, SUBLANE, LANE))
# one group per (chunk, slot): the slot-constant rowmap
rm_scalar = rng.integers(0, OUT_ROWS, (STEPS, 1, K, SUBLANE))
anchor4 = rng.integers(0, XR4 - SUBLANE, (STEPS, 1, K))
xt = rng.standard_normal((D, XR4, LANE)).astype(np.float32)

# local_index encoding: bits 0-6 lane, 7-13 window-row (sel*? here we
# fold sel into bits 7-8 only for the gather; rowmap bits 14+ carry the
# per-lane group for variant A (broadcast of the scalar map so all
# variants compute the same y).
loc_base = (sel.astype(np.int32) << 7) | llane.astype(np.int32)
rm_lane = np.broadcast_to(
    rm_scalar.reshape(STEPS * K, SUBLANE, 1), (STEPS * K, SUBLANE, LANE)
).astype(np.int32)
loc_A = loc_base | (rm_lane << 14)

value_d = jnp.asarray(value)
locA_d = jnp.asarray(loc_A)
locB_d = jnp.asarray(loc_base)
anchor_d = jnp.asarray(anchor4, jnp.int32)
rms_d = jnp.asarray(rm_scalar, jnp.int32)
xt_d = jnp.asarray(xt)


def gather(x_ref, a4, locv, val, dtype):
    ll = locv & (LANE - 1)
    ph = (locv >> 7) & (D - 1)
    g = jnp.zeros((SUBLANE, LANE), dtype=dtype)
    for p in range(D):
        T = x_ref[p, pl.ds(a4, SUBLANE), :]
        gt = jnp.take_along_axis(T, ll, axis=1)
        g = g + jnp.where(ph == p, gt, jnp.zeros_like(gt))
    return val * g


def kernel_A(ws_ref, x_ref, v_ref, l_ref, y_ref, *, dtype):
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, LANE), 0)
    acc_blk = jnp.zeros((OUT_ROWS, LANE), dtype=dtype)
    for kk in range(K):
        locv = l_ref[kk]
        acc = gather(x_ref, ws_ref[0, 0, kk], locv, v_ref[kk], dtype)
        rm = locv >> 14
        for s in range(SUBLANE):
            acc_blk = acc_blk + jnp.where(
                row_iota == rm[s][None, :],
                jnp.broadcast_to(acc[s][None, :], (OUT_ROWS, LANE)),
                jnp.zeros((OUT_ROWS, LANE), dtype=dtype),
            )
    y_ref[:] = acc_blk


def kernel_B(ws_ref, rm_ref, x_ref, v_ref, l_ref, y_ref, *, dtype):
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, LANE), 0)
    acc_blk = jnp.zeros((OUT_ROWS, LANE), dtype=dtype)
    for kk in range(K):
        acc = gather(x_ref, ws_ref[0, 0, kk], l_ref[kk], v_ref[kk],
                     dtype)
        for s in range(SUBLANE):
            acc_blk = acc_blk + jnp.where(
                row_iota == rm_ref[0, kk, s],
                jnp.broadcast_to(acc[s][None, :], (OUT_ROWS, LANE)),
                jnp.zeros((OUT_ROWS, LANE), dtype=dtype),
            )
    y_ref[:] = acc_blk


def kernel_C(ws_ref, rm_ref, x_ref, v_ref, l_ref, y_ref, *, dtype):
    y_ref[:] = jnp.zeros((OUT_ROWS, LANE), dtype=dtype)
    for kk in range(K):
        acc = gather(x_ref, ws_ref[0, 0, kk], l_ref[kk], v_ref[kk],
                     dtype)
        for s in range(SUBLANE):
            row = rm_ref[0, kk, s]
            y_ref[pl.ds(row, 1), :] += acc[s][None, :]


def call_A(xt_d, value_d, locA_d):
    return pl.pallas_call(
        functools.partial(kernel_A, dtype=jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(STEPS,),
            in_specs=[
                pl.BlockSpec((1, 1, K), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((K, SUBLANE, LANE), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, SUBLANE, LANE), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((OUT_ROWS, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((STEPS * OUT_ROWS, LANE),
                                       jnp.float32),
    )(anchor_d, xt_d, value_d, locA_d)


out = {}
yA = call_A(xt_d, value_d, locA_d)

# scalar-rowmap calls: SMEM block (1, K, SUBLANE)
rm3 = jnp.asarray(rm_scalar.reshape(STEPS, K, SUBLANE), jnp.int32)


def call_B(xt_d, value_d, locB_d):
    return pl.pallas_call(
        functools.partial(kernel_B, dtype=jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(STEPS,),
            in_specs=[
                pl.BlockSpec((1, 1, K), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, K, SUBLANE), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((K, SUBLANE, LANE), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, SUBLANE, LANE), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((OUT_ROWS, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((STEPS * OUT_ROWS, LANE),
                                       jnp.float32),
    )(anchor_d, rm3, xt_d, value_d, locB_d)


def call_C(xt_d, value_d, locB_d):
    return pl.pallas_call(
        functools.partial(kernel_C, dtype=jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(STEPS,),
            in_specs=[
                pl.BlockSpec((1, 1, K), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, K, SUBLANE), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((K, SUBLANE, LANE), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, SUBLANE, LANE), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((OUT_ROWS, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((STEPS * OUT_ROWS, LANE),
                                       jnp.float32),
    )(anchor_d, rm3, xt_d, value_d, locB_d)


yB = call_B(xt_d, value_d, locB_d)
yC = call_C(xt_d, value_d, locB_d)
errB = float(jnp.max(jnp.abs(yB - yA)))
errC = float(jnp.max(jnp.abs(yC - yA)))
print("max |B-A| =", errB, " max |C-A| =", errC, flush=True)
assert errB == 0.0, errB
assert errC < 1e-4, errC

for tag, call, loc in (("A_lane_rowmap", call_A, locA_d),
                       ("B_scalar_masked", call_B, locB_d),
                       ("C_scalar_dynrow", call_C, locB_d)):
    def step(xt_d, value_d, loc=loc, call=call):
        y = call(xt_d, value_d, loc)
        # feed a scalar back into xt so the chain can't be elided
        return xt_d + (y[0, 0] * 1e-30).astype(jnp.float32)

    t = time_kernel(step, (xt_d, value_d), k_small=4, k_large=64,
                    runs=6).seconds_per_iteration
    out[tag] = {"seconds_per_call": t,
                "ns_per_chunk": t / (STEPS * K) * 1e9}
    print(tag, out[tag], flush=True)

with open("experiments/probe56_cw_poolsort.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
