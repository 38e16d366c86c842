"""Pick a format, run SpMV on the attached device, time it honestly.

Runs anywhere: on CPU hosts set JAX_PLATFORMS=cpu (Pallas kernels
switch to interpret mode automatically in the kernels used here via
the CLI; library calls below use the XLA paths on CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.io.generate import banded_random, poisson2d
from spmv_tpu.models import auto_format
from spmv_tpu.models.device import device_put_matrix
from spmv_tpu.ops import spmv
from spmv_tpu.profile.harness import time_kernel

# auto_format inspects the sparsity structure: stencils -> DIA,
# clustered general -> WELL, scattered -> WELL-CW, block structure
# (SpMM workloads) -> BSR.
for name, mm in [("poisson 5-point", poisson2d(256, 256)),
                 ("scattered banded", banded_random(
                     1 << 14, half_bandwidth=256, nnz_per_row=8))]:
    host, rationale = auto_format(mm)
    A = device_put_matrix(host)
    x = jnp.ones((mm.num_columns,))
    y = spmv(A, x)                       # XLA path, any format
    want = host.spmv(np.ones(mm.num_columns))
    rel = float(jnp.linalg.norm(y - want) / np.linalg.norm(want))
    # chained-slope timing: robust to dispatch overhead/tunnels
    t = time_kernel(lambda v: spmv(A, v[: A.num_columns]),
                    (x,)).seconds_per_iteration
    print(f"{name:18s} -> {rationale['format']:9s} "
          f"{mm.num_entries / t / 1e9:8.2f} Gnnz/s  rel_err {rel:.1e}")
