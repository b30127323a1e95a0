"""Device-mesh helpers.

The reference's process model — one MPI rank per node, `MPI_Init` in
main.cpp:36-48 — maps to a 1-D `jax.sharding.Mesh` over all addressable TPU
chips (ICI within a host/slice, DCN across slices via jax.distributed).
"nodes" in engine code = devices on this axis.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "nodes") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_spec(mesh: Mesh, axis: str = "nodes") -> NamedSharding:
    """Row-sharded (the engine's relation layout: tuples split over nodes)."""
    return NamedSharding(mesh, P(axis))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
