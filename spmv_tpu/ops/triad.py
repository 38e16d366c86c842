"""STREAM triad: a[i] = b[i] + q * c[i].

The reference's bandwidth-baseline kernel (src/kernels/triad.cpp:49-80;
"24 bytes and 2 flops per iteration", src/main.cpp:184).  On TPU this is
the pure HBM-streaming roofline probe: 3 vectors moved, 2 flops/element.
The XLA path below fuses into a single streaming loop; a Pallas variant
lives in spmv_tpu.ops.pallas_kernels for explicit control.
"""

from __future__ import annotations

import jax


def triad(b: jax.Array, c: jax.Array, q) -> jax.Array:
    return b + q * c
