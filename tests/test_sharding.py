"""Multi-device replica sharding: fleet step on an 8-device CPU mesh.

SURVEY.md §4d: fake an N-device mesh with xla_force_host_platform_device_count
(set in conftest) — the standard JAX substitute for multi-chip tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legkilo_tpu.core import eskf as eskf_mod
from legkilo_tpu.core.filter import FilterParams, StaticConfig, init_carry, process_scan
from legkilo_tpu.core.voxel_map import MapConfig
from legkilo_tpu.parallel.mesh import make_mesh, shard_batch
from legkilo_tpu.parallel.sweep import (
    batched_carry,
    broadcast_packets,
    make_fleet_step,
    perturb_params,
)
from legkilo_tpu.config import EskfConfig


def tiny_scfg():
    return StaticConfig(
        map_cfg=MapConfig(
            levels=2, capacity=512, probe=4, voxel_size=0.5,
            planer_threshold=0.01, sigma_num=3.0, max_points_num=50,
            init_num=(5, 5),
        ),
        use_kin=False, dept_err=0.04, beam_err=0.2,
    )


def tiny_packet(rng, nb=4, p=16, k=2):
    from legkilo_tpu.core.filter import ScanPacket

    bt = np.arange(nb, dtype=np.float32) * 0.002
    pts = rng.uniform(1, 4, size=(nb, p, 3)).astype(np.float32)
    pts[..., 2] = rng.normal(scale=0.005, size=(nb, p)).astype(np.float32) - 0.3
    acc = np.zeros((nb, k, 3), dtype=np.float32)
    acc[..., 2] = 9.81
    return ScanPacket(
        rebase=jnp.float32(0.0),
        end_offset=jnp.float32(nb * 0.002),
        bucket_time=jnp.asarray(bt),
        bucket_mask=jnp.ones(nb, dtype=bool),
        points=jnp.asarray(pts),
        point_mask=jnp.ones((nb, p), dtype=bool),
        imu_time=jnp.asarray(np.tile(bt[:, None], (1, k)).astype(np.float32)),
        imu_mask=jnp.asarray(np.tile([True] + [False] * (k - 1), (nb, 1))),
        imu_acc=jnp.asarray(acc),
        imu_gyr=jnp.zeros((nb, k, 3), dtype=jnp.float32),
        foot_pos=jnp.zeros((nb, k, 4, 3), dtype=jnp.float32),
        foot_vel=jnp.zeros((nb, k, 4, 3), dtype=jnp.float32),
        contact=jnp.zeros((nb, k, 4), dtype=bool),
    )


def default_params():
    return FilterParams(
        noise=eskf_mod.make_noise_params(EskfConfig()),
        ext_r=jnp.eye(3),
        ext_t=jnp.asarray([0.0, 0.0, 0.2]),
        g_over_acc_norm=jnp.asarray(1.0),
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_fleet_step_sharded_matches_single(rng):
    """The sharded 8-replica step must reproduce the single-replica result
    bit-for-bit-ish when every replica has identical inputs."""
    scfg = tiny_scfg()
    params = default_params()
    pkt = tiny_packet(rng)
    mesh = make_mesh(8)

    carry1 = init_carry(scfg)
    carry1, out1 = jax.jit(process_scan, static_argnums=3)(carry1, pkt, params, scfg)

    B = 8
    carry = shard_batch(batched_carry(scfg, B), mesh)
    packet = shard_batch(broadcast_packets(pkt, B), mesh)
    bparams = shard_batch(perturb_params(params, B, scale=0.0), mesh)
    step = make_fleet_step(scfg, mesh=mesh)
    carry, out, stats = step(carry, packet, bparams)

    pos = np.asarray(out.pos)
    for b in range(B):
        np.testing.assert_allclose(pos[b], np.asarray(out1.pos), atol=1e-5)
    assert float(stats.pos_spread) < 1e-5
    assert int(out.n_matched.min()) == int(out1.n_matched)

    # Sharding actually spans the mesh.
    assert len(out.pos.sharding.device_set) == 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_fleet_step_param_perturbation_diverges(rng):
    """Per-replica parameter perturbations must produce diverging replicas
    (the Monte-Carlo sweep mechanism)."""
    scfg = tiny_scfg()
    params = default_params()
    mesh = make_mesh(8)
    B = 8
    carry = shard_batch(batched_carry(scfg, B), mesh)
    bparams = shard_batch(perturb_params(params, B, scale=1.0, seed=1), mesh)
    step = make_fleet_step(scfg, mesh=mesh)
    out = None
    for i in range(3):
        packet = shard_batch(broadcast_packets(tiny_packet(rng), B), mesh)
        carry, out, stats = step(carry, packet, bparams)
    pos = np.asarray(out.pos)
    spreads = np.linalg.norm(pos - pos.mean(0), axis=-1)
    assert spreads.max() > 1e-6  # replicas actually differ


def test_vmap_process_scan_matches_loop(rng):
    """vmap over replicas == per-replica loop (core correctness of DP)."""
    scfg = tiny_scfg()
    params = default_params()
    B = 3
    pkts = [tiny_packet(np.random.default_rng(i)) for i in range(B)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *pkts)
    carry = batched_carry(scfg, B)
    bparams = perturb_params(params, B, scale=0.0)

    vout = jax.vmap(process_scan, in_axes=(0, 0, 0, None))(
        carry, stacked, bparams, scfg
    )[1]
    for b in range(B):
        _, out1 = process_scan(init_carry(scfg), pkts[b], params, scfg)
        np.testing.assert_allclose(np.asarray(vout.pos[b]), np.asarray(out1.pos), atol=1e-5)
        assert int(vout.n_matched[b]) == int(out1.n_matched)


def test_vmap_deferred_matches_loop(rng):
    """Deferred pipeline under vmap == per-replica loop."""
    from legkilo_tpu.core.filter_deferred import process_scan_deferred

    scfg = tiny_scfg()._replace(pipeline="deferred")
    params = default_params()
    B = 2
    pkts = [tiny_packet(np.random.default_rng(10 + i)) for i in range(B)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *pkts)
    carry = batched_carry(scfg, B)
    bparams = perturb_params(params, B, scale=0.0)

    vout = jax.vmap(process_scan_deferred, in_axes=(0, 0, 0, None))(
        carry, stacked, bparams, scfg
    )[1]
    for b in range(B):
        _, out1 = process_scan_deferred(init_carry(scfg), pkts[b], params, scfg)
        np.testing.assert_allclose(
            np.asarray(vout.pos[b]), np.asarray(out1.pos), atol=1e-5
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_scaling_harness(rng):
    """Weak-scaling harness runs and reports sane efficiency numbers."""
    from legkilo_tpu.parallel.scaling import measure_scaling

    scfg = tiny_scfg()
    params = default_params()
    packets = [tiny_packet(np.random.default_rng(i)) for i in range(4)]
    res = measure_scaling(scfg, params, packets, device_counts=[1, 4], warmup=1)
    assert len(res) == 2
    assert res[0]["devices"] == 1 and res[1]["devices"] == 4
    assert res[1]["replicas"] == 4
    for r in res:
        assert r["replica_scans_per_s"] > 0
        assert 0 < r["efficiency"] <= 2.0


def test_hierarchical_mesh_single_host():
    from legkilo_tpu.parallel.multihost import hierarchical_mesh

    mesh = hierarchical_mesh()
    assert mesh.devices.shape[0] == 1  # one host
    assert mesh.devices.size == len(jax.devices())


def test_dryrun_multichip_exercises_matching():
    """The driver's multichip dryrun must run the full filter loop — map
    bootstrap + chained scans so the match/point-update/insert/refit path
    executes across all 8 devices (it asserts mean_matched > 0 itself)."""
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    try:
        import __graft_entry__ as graft
    finally:
        sys.path.pop(0)
    graft.dryrun_multichip(8)
