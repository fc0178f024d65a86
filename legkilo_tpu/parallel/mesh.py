"""Device mesh + sharding helpers for fleet-scale batched replay.

The reference is a single-robot, single-process estimator (SURVEY.md §2:
no distributed computing of any kind).  The TPU-native scale-out axis is
**replica data-parallelism**: B independent filter instances (bags, noise
realizations, parameter sweeps) batched on the leading axis, sharded over a
``('replica',)`` mesh with jax.sharding; fleet statistics reduce over ICI
via jnp means/quantiles of sharded arrays (XLA inserts the collectives).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

REPLICA_AXIS = "replica"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (REPLICA_AXIS,))


def replica_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (replica) axis across the mesh."""
    return NamedSharding(mesh, P(REPLICA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Device_put a [B, ...] pytree with the leading axis sharded."""
    sh = replica_sharding(mesh)

    def put(x):
        spec = P(REPLICA_AXIS) if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)
