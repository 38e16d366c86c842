"""Probe 1b: trustworthy timing on axon — chain K dependent iterations
inside one jitted computation, fetch the result to host, time the whole
thing."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.io.generate import poisson2d
from spmv_tpu.models import CsrMatrix, EllMatrix
from spmv_tpu.models.device import DeviceCsr, DeviceEll
from spmv_tpu.ops import spmv


def timed(fn, *args, reps=5):
    # warmup + compile
    np.asarray(jax.block_until_ready(fn(*args))).ravel()[:1]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        # force a host read so the remote execution definitely finished
        _ = np.asarray(out).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


K = 50


def main():
    n = 1 << 26
    b = jnp.ones(n, jnp.float32)
    c = jnp.ones(n, jnp.float32)

    @jax.jit
    def triad_chain(b, c):
        def body(i, acc):
            return acc + 2.0 * c  # a = b + q*c chained: acc dep
        return jax.lax.fori_loop(0, K, body, b)

    t = timed(triad_chain, b, c)
    bw = K * 3 * 4 * n / t / 1e9
    print(f"triad chain: {t*1e3:.1f} ms for {K} iters -> {bw:.1f} GB/s")

    mm = poisson2d(1024, 1024)
    host = CsrMatrix.from_matrix_market(mm)
    nnz = host.num_entries
    x = jnp.ones((mm.num_columns,), jnp.float32)

    for name, A in [
        ("csr", DeviceCsr.from_host(host, dtype=jnp.float32)),
        ("ell", DeviceEll.from_host(
            EllMatrix.from_matrix_market(mm), dtype=jnp.float32)),
    ]:
        @jax.jit
        def chain(A, x):
            def body(i, v):
                y = spmv(A, v[: A.num_columns])
                return y[: x.shape[0]]
            return jax.lax.fori_loop(0, K, body, x)

        t = timed(chain, A, x)
        per = t / K
        gf = 2 * nnz / per / 1e9
        print(f"{name} spmv: {per*1e3:.3f} ms/iter -> {gf:.2f} GFLOP/s")


if __name__ == "__main__":
    main()
