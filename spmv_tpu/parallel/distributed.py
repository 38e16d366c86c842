"""Multi-host initialization and mesh construction.

The reference is single-process (SURVEY.md §5: "Distributed
communication backend: none"); its NUMA-domain miss matrices only
*model* remote traffic.  On TPU pods the real thing is:

- every host runs the same program and calls
  :func:`initialize_distributed` once before any JAX call;
- ``jax.devices()`` then returns the *global* device list, and a mesh
  built over it routes collectives over ICI within a slice and DCN
  across slices;
- arrays are addressed per-shard (each host materializes only its
  addressable shards via ``jax.make_array_from_callback`` /
  ``jax.device_put`` with a ``NamedSharding``).

This module wraps that bootstrap with the same degrade-gracefully
policy as the rest of the framework: on a single host (or in tests on
the virtual CPU mesh) everything is a no-op and the local devices are
used.  The collectives in spmv_tpu.parallel.{shard,dia_shard} are
topology-agnostic — the same shard_map runs on 8 virtual CPU devices,
8 chips of one host, or a multi-host slice.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from spmv_tpu.parallel.mesh import make_mesh

__all__ = [
    "initialize_distributed",
    "is_multi_host",
    "global_mesh",
    "global_device_put",
    "host_local_info",
]

_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed for a multi-host run.

    Arguments default to the standard environment variables
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or
    the TPU metadata when running on a real pod slice, where
    ``jax.distributed.initialize()`` autodetects everything).

    Returns True when a multi-process runtime was initialized, False
    when running single-process (no-op).  Idempotent.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None
    )
    env_pid = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None
    )

    if coordinator_address is None and num_processes is None:
        # Single host, or a TPU pod slice where initialize()
        # autodetects from the metadata server.  Only call into
        # jax.distributed when the environment demands it.
        _initialized = True
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return jax.process_count() > 1


def is_multi_host() -> bool:
    return jax.process_count() > 1


def global_mesh(num_shards: Optional[int] = None):
    """A 1-D mesh over the global device list (all hosts)."""
    return make_mesh(num_shards=num_shards, devices=jax.devices())


def global_device_put(arr, mesh, spec):
    """Place a host array over a (possibly multi-process) mesh.

    ``jax.device_put`` requires every target device to be addressable;
    on a multi-host mesh each process owns only its local devices, so
    the global array must be assembled from per-process shards.
    ``make_array_from_callback`` materializes exactly this process's
    addressable shards from the host data (every process passes the
    same logical array — the tiny-metadata regime of SpMV, where hosts
    share the matrix and the mesh partitions the work).  On a single
    process this is equivalent to ``device_put`` with the same
    ``NamedSharding``.
    """
    import numpy as np
    from jax.sharding import NamedSharding

    arr = np.asarray(arr)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def host_local_info() -> dict:
    """JSON-able description of this process's place in the job."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }
