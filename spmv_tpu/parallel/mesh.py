"""Device mesh construction.

The mesh is the TPU-native machine model: where the reference's JSON
trace config declares threads, their CPUs, caches and NUMA domains
(src/trace-config.cpp:198-343), a JAX program declares a
``jax.sharding.Mesh`` over the slice's chips and lets XLA route
collectives over ICI.  ``make_mesh`` builds the 1-D "shards" mesh used
by the row-partitioned SpMV; multi-host slices initialize through
``jax.distributed`` (see spmv_tpu.parallel.distributed).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "mesh_info", "AXIS_SHARDS"]

AXIS_SHARDS = "shards"


def make_mesh(
    num_shards: Optional[int] = None,
    devices: Optional[Sequence] = None,
    axis_name: str = AXIS_SHARDS,
) -> Mesh:
    """A 1-D mesh over ``num_shards`` devices (default: all devices)."""
    if devices is None:
        devices = jax.devices()
    if num_shards is None:
        num_shards = len(devices)
    if num_shards > len(devices):
        raise ValueError(
            f"requested {num_shards} shards but only "
            f"{len(devices)} devices are available"
        )
    return Mesh(np.array(devices[:num_shards]), (axis_name,))


def mesh_info(mesh: Mesh) -> dict:
    """JSON-able description of the mesh (for reports)."""
    devs = mesh.devices.ravel()
    return {
        "axis_names": list(mesh.axis_names),
        "shape": dict(mesh.shape),
        "num_devices": devs.size,
        "device_kinds": sorted({d.device_kind for d in devs}),
        "num_processes": len({d.process_index for d in devs}),
    }
