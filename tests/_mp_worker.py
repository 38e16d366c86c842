"""Worker process for the real multi-process distributed test.

Launched by tests/test_distributed_mp.py as one of two
``jax.distributed`` CPU processes with 4 virtual devices each; runs
the sharded DIA CG over the GLOBAL 8-device mesh to convergence and
prints MP_OK with the relative error.  Usage:

    python tests/_mp_worker.py <coordinator_port> <process_id>
"""

import dataclasses
import os
import sys


def main() -> int:
    port, pid = sys.argv[1], int(sys.argv[2])
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=4"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from jax.sharding import PartitionSpec as P

    from spmv_tpu.io.generate import poisson2d
    from spmv_tpu.models import DiaMatrix
    from spmv_tpu.ops import conjugate_gradient
    from spmv_tpu.parallel import (
        global_device_put,
        global_mesh,
        host_local_info,
        initialize_distributed,
        is_multi_host,
        make_sharded_dia_matvec,
        shard_dia,
        stack_dia_vector,
    )
    from spmv_tpu.parallel.mesh import AXIS_SHARDS

    multi = initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert multi and is_multi_host(), "expected a 2-process runtime"
    info = host_local_info()
    assert info["process_count"] == 2
    assert info["global_device_count"] == 8, info

    mesh = global_mesh(8)

    mm = poisson2d(16, 16)
    dia = DiaMatrix.from_matrix_market(mm)
    A = shard_dia(dia, 8)
    # Re-place the (identically computed on every process) host data
    # over the global mesh: each process materializes its local shards.
    A = dataclasses.replace(
        A,
        data=global_device_put(
            np.asarray(A.data), mesh, P(AXIS_SHARDS, None, None)
        ),
    )

    rng = np.random.default_rng(0)
    x_true = rng.standard_normal(dia.num_rows)
    b = dia.spmv(x_true)
    xs_true = global_device_put(
        np.asarray(stack_dia_vector(np.asarray(x_true, dtype=np.float32),
                                    A)),
        mesh, P(AXIS_SHARDS, None),
    )
    bs = global_device_put(
        np.asarray(stack_dia_vector(np.asarray(b, dtype=np.float32), A)),
        mesh, P(AXIS_SHARDS, None),
    )

    # Pass the global arrays as ARGUMENTS: a jitted closure would embed
    # them as constants, which is impossible for arrays spanning
    # non-addressable devices.
    @jax.jit
    def solve(data, bv):
        Ad = dataclasses.replace(A, data=data)
        matvec = make_sharded_dia_matvec(Ad, mesh)
        return conjugate_gradient(matvec, bv, tol=1e-6,
                                  max_iterations=500)

    res = solve(A.data, bs)
    jax.block_until_ready(res)

    # Replicated scalars are safe to fetch on every process.
    import jax.numpy as jnp

    @jax.jit
    def rel_err(xa, xb):
        return jnp.linalg.norm(xa - xb) / jnp.linalg.norm(xb)

    err = float(rel_err(res.x, xs_true))
    assert err < 1e-3, f"CG rel err {err}"
    print(
        f"MP_OK pid={pid} iters={int(res.iterations)} rel_err={err:.2e}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
