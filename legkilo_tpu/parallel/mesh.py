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
    """Shard the leading (replica) axis across ALL mesh axes — on a 1-D
    ('replica',) mesh this is plain DP; on a hierarchical (dcn, ici) mesh
    the leading axis splits across hosts first, local devices second."""
    return NamedSharding(mesh, P(mesh.axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Materialize a [B, ...] pytree with the leading axis sharded.

    Multi-process safe: when this process addresses only part of the mesh
    (jax.distributed), each process contributes its local shards via
    make_array_from_callback instead of device_put."""
    names = mesh.axis_names
    multi = jax.process_count() > 1

    def put(x):
        spec = P(names) if getattr(x, "ndim", 0) >= 1 else P()
        sh = NamedSharding(mesh, spec)
        if not multi:
            return jax.device_put(x, sh)
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])

    return jax.tree.map(put, tree)
