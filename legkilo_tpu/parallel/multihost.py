"""Multi-host initialization + DCN x ICI mesh construction.

The reference has no distributed layer (SURVEY.md §2).  For pod-scale
Monte-Carlo replay the TPU-native stack is:

* `jax.distributed.initialize()` per host (SPMD, one process per host),
* a 2-D mesh `(dcn, ici)` where the slow cross-host dimension carries
  coarse replica groups and the fast in-slice dimension carries the rest,
* replica data-parallelism over the flattened mesh — XLA routes the fleet
  statistics reductions hierarchically (ICI first, DCN once per host).

This module is exercised in CI on a virtual single-host mesh; on real
multi-host slices call :func:`initialize` before any jax usage.
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

log = logging.getLogger(__name__)

DCN_AXIS = "dcn"
ICI_AXIS = "ici"


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up jax.distributed (no-op on a single host with no env config)."""
    if num_processes is None and coordinator_address is None:
        log.info("single-host run: skipping jax.distributed.initialize")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def hierarchical_mesh() -> Mesh:
    """(dcn, ici) mesh: hosts on the slow axis, local devices on the fast
    axis.  Collapses to (1, n_devices) on one host."""
    n_hosts = jax.process_count()
    devs = np.asarray(jax.devices())
    per_host = len(devs) // n_hosts
    return Mesh(devs.reshape(n_hosts, per_host), (DCN_AXIS, ICI_AXIS))


def replica_axes() -> Tuple[str, str]:
    return DCN_AXIS, ICI_AXIS
