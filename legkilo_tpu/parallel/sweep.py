"""Monte-Carlo fleet replay: B filter replicas sharded over a device mesh.

BASELINE.json's north star: thousands of batched bag replays / noise-
parameter sweeps per step across chips and hosts, with fleet statistics
reduced over ICI.  A replica is one full filter instance (state, covariance,
its own voxel map); the per-scan step is ``vmap(process_scan_any)`` (the
configured pipeline — deferred fast path or reference-faithful) jitted with
replica-sharded inputs — XLA partitions everything on the leading axis and
inserts collectives only for the final statistics reductions.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.filter import (
    FilterCarry,
    FilterParams,
    ScanPacket,
    StaticConfig,
    init_carry,
    process_scan_any,
    process_scan_chunk,
)
from .mesh import REPLICA_AXIS


class FleetStats(NamedTuple):
    """Per-step fleet statistics (reduced across replicas/chips)."""

    mean_pos: jnp.ndarray     # [3]
    pos_spread: jnp.ndarray   # [] max pairwise deviation from the mean
    mean_matched: jnp.ndarray  # []
    min_matched: jnp.ndarray   # []


def batched_carry(scfg: StaticConfig, batch: int, dtype=jnp.float32) -> FilterCarry:
    """B independent filter instances stacked on the leading axis."""
    one = init_carry(scfg, dtype=dtype)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape).copy(), one)


def make_fleet_step(scfg: StaticConfig, mesh=None, with_stats: bool = True):
    """Build the jitted sharded fleet step:

        (carry [B,...], packet [B,...], params [B,...]) -> (carry, out, stats)

    ``params`` is batched too so noise-parameter sweeps shard for free.
    """

    def step(carry, packet, params):
        carry, out = jax.vmap(process_scan_any, in_axes=(0, 0, 0, None))(
            carry, packet, params, scfg
        )
        if with_stats:
            stats = FleetStats(
                mean_pos=jnp.mean(out.pos, axis=0),
                pos_spread=jnp.max(
                    jnp.linalg.norm(out.pos - jnp.mean(out.pos, axis=0), axis=-1)
                ),
                mean_matched=jnp.mean(out.n_matched.astype(jnp.float32)),
                min_matched=jnp.min(out.n_matched),
            )
        else:
            stats = None
        return carry, out, stats

    if mesh is None:
        return jax.jit(step)

    # Shard the replica axis over every mesh axis: plain DP on a 1-D
    # ('replica',) mesh, hosts-then-devices on a hierarchical (dcn, ici)
    # mesh — XLA reduces the fleet statistics over ICI first, DCN once.
    shard = NamedSharding(mesh, P(mesh.axis_names))
    repl = NamedSharding(mesh, P())

    def spec_like(tree, leading_spec):
        return jax.tree.map(lambda _: leading_spec, tree)

    return jax.jit(
        step,
        in_shardings=(shard, shard, shard),
        out_shardings=(shard, shard, repl if with_stats else None),
    )


def make_fleet_chunk_step(scfg: StaticConfig, mesh=None, with_stats: bool = True):
    """Chunked fleet step: every replica advances K scans per dispatch.

        (carry [B,...], packets [B,K,...], params [B,...]) -> (carry, outs, stats)

    ``vmap(process_scan_chunk)``: the fleet step time is ~flat in B on the
    measured rigs (host/dispatch-bound, docs/PERF_NOTES.md fleet table),
    so per-scan fleet stepping leaves a K-fold amortization on the table
    for offline sweeps — one dispatch advances B replicas by K scans,
    bit-identical to K per-scan fleet steps (tests/test_fleet_chunk.py).
    ``outs`` come back stacked [B, K, ...]; stats reduce over the
    replicas' final scan of the chunk.
    """

    def step(carry, packets, params):
        carry, outs = jax.vmap(process_scan_chunk, in_axes=(0, 0, 0, None))(
            carry, packets, params, scfg
        )
        if with_stats:
            pos_end = outs.pos[:, -1]                       # [B, 3]
            nm_end = outs.n_matched[:, -1]
            stats = FleetStats(
                mean_pos=jnp.mean(pos_end, axis=0),
                pos_spread=jnp.max(
                    jnp.linalg.norm(pos_end - jnp.mean(pos_end, axis=0), axis=-1)
                ),
                mean_matched=jnp.mean(nm_end.astype(jnp.float32)),
                min_matched=jnp.min(nm_end),
            )
        else:
            stats = None
        return carry, outs, stats

    if mesh is None:
        return jax.jit(step)
    shard = NamedSharding(mesh, P(mesh.axis_names))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(shard, shard, shard),
        out_shardings=(shard, shard, repl if with_stats else None),
    )


def stack_fleet_chunks(step_packets: list, chunk: int) -> list:
    """Per-step [B, ...] packets (stack_packets output) -> per-chunk
    [B, K, ...] pytrees for make_fleet_chunk_step.  Trailing steps that
    do not fill a chunk are dropped (offline-sweep semantics: every
    dispatch advances the whole fleet by exactly K scans)."""
    return [
        jax.tree.map(
            lambda *xs: jnp.stack(xs, axis=1), *step_packets[i : i + chunk]
        )
        for i in range(0, len(step_packets) - chunk + 1, chunk)
    ]


def broadcast_packets(packet: ScanPacket, batch: int) -> ScanPacket:
    """Replicate one packet across the batch axis (same data per replica)."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + jnp.shape(x)).copy(), packet
    )


def stack_packets(packet_seqs) -> list:
    """B per-replica ScanPacket sequences -> per-step [B, ...] packets.

    The distinct-bag fleet path (BASELINE.json north star: *batched bag
    replays*, not parameter jitter): every replica advances through its OWN
    packet stream each step.  Sequences are truncated to the shortest
    replica so every step has a full batch."""
    t_min = min(len(s) for s in packet_seqs)
    return [
        jax.tree.map(lambda *xs: jnp.stack(xs), *[s[t] for s in packet_seqs])
        for t in range(t_min)
    ]


def fleet_init(
    scfg: StaticConfig,
    params: FilterParams,
    first_scan_points,   # list of B [Ni, 3] raw (decimated) first clouds
    mean_acc: np.ndarray,   # [B, 3]
    mean_gyr: np.ndarray,   # [B, 3]
    end_offsets: np.ndarray,  # [B]
    gravity: float,
    pad: int = 8192,
) -> Tuple[FilterCarry, FilterParams]:
    """Batched first-frame initialization: the runner's per-filter init
    (init_state_from_imu + BuildVoxelMap, runner.py:_initialize) vmapped
    over B replicas with per-replica sensor statistics and first clouds."""
    from ..core.filter import first_frame_map, init_state_from_imu

    B = len(first_scan_points)
    carry = batched_carry(scfg, B)
    acc = jnp.asarray(np.stack(mean_acc), dtype=jnp.float32)
    gyr = jnp.asarray(np.stack(mean_gyr), dtype=jnp.float32)
    eo = jnp.asarray(np.asarray(end_offsets, np.float32))

    carry, acc_norm = jax.vmap(
        lambda c, a, g, e: init_state_from_imu(c, a, g, float(gravity), e)
    )(carry, acc, gyr, eo)

    bparams = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)).copy(), params
    )
    bparams = bparams._replace(
        g_over_acc_norm=(gravity / acc_norm).astype(jnp.float32)
    )

    buf = np.zeros((B, pad, 3), dtype=np.float32)
    mask = np.zeros((B, pad), dtype=bool)
    for i, pts in enumerate(first_scan_points):
        n = min(len(pts), pad)
        buf[i, :n] = pts[:n]
        mask[i, :n] = True
    carry = jax.vmap(
        lambda c, p, pt, m: first_frame_map(c, scfg, p, pt, m)
    )(carry, bparams, jnp.asarray(buf), jnp.asarray(mask))
    return carry, bparams


def perturb_params(
    params: FilterParams, batch: int, scale: float = 0.0, seed: int = 0
) -> FilterParams:
    """Batch params with optional log-normal noise-parameter perturbation
    (parameter-sweep mode)."""
    base = jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + jnp.shape(x)).copy(), params)
    if scale <= 0.0:
        return base
    key = jax.random.PRNGKey(seed)
    k1, _ = jax.random.split(key)
    q = base.noise.q_diag * jnp.exp(
        scale * jax.random.normal(k1, (batch, 1), dtype=base.noise.q_diag.dtype)
    )
    return base._replace(noise=base.noise._replace(q_diag=q))
