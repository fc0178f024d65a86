"""Scaling-efficiency harness: replica throughput vs device count.

BASELINE.md target: >= 80% scaling efficiency at N >= 2 hosts for batched
bag replay.  This harness measures replica-scans/second on meshes of
1..N devices with a fixed per-device replica load (weak scaling) and
reports efficiency = throughput(N) / (N * throughput(1)).
"""

from __future__ import annotations

import time
from typing import Dict, List, Sequence

import jax
from ..utils.timing import sync as _sync

from ..core.filter import FilterParams, StaticConfig
from .mesh import make_mesh, shard_batch
from .sweep import batched_carry, broadcast_packets, make_fleet_step, perturb_params


def measure_scaling(
    scfg: StaticConfig,
    params: FilterParams,
    packets: Sequence,
    device_counts: Sequence[int],
    replicas_per_device: int = 1,
    warmup: int = 1,
) -> List[Dict]:
    """Weak-scaling sweep over device subsets.  Returns one record per
    device count: replicas, wall seconds, replica-scans/s, efficiency."""
    results = []
    base_rate = None
    for n in device_counts:
        if n > len(jax.devices()):
            break
        mesh = make_mesh(n)
        b = n * replicas_per_device
        step = make_fleet_step(scfg, mesh=mesh)
        carry = shard_batch(batched_carry(scfg, b), mesh)
        bparams = shard_batch(perturb_params(params, b, scale=0.05), mesh)

        dev_packets = [
            shard_batch(broadcast_packets(p, b), mesh) for p in packets
        ]
        stats = None
        for p in dev_packets[:warmup]:
            carry, _, stats = step(carry, p, bparams)
        _sync(stats)
        t0 = time.perf_counter()
        for p in dev_packets[warmup:]:
            carry, _, stats = step(carry, p, bparams)
        _sync(stats)
        wall = time.perf_counter() - t0
        n_steps = len(dev_packets) - warmup
        rate = b * n_steps / wall
        if base_rate is None:
            base_rate = rate / n  # per-device baseline at the first count
        results.append(
            dict(
                devices=n,
                replicas=b,
                wall_s=round(wall, 3),
                replica_scans_per_s=round(rate, 2),
                efficiency=round(rate / (n * base_rate), 3),
            )
        )
    return results
