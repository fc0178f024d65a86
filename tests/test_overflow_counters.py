"""Overflow counters must come from measurement and reach the operator.

Round-3 review (weak #7): sequential-mode ``n_cap_dropped`` was hardwired
zero — correct but unfalsifiable.  It is now measured (valid points minus
points the bucket loop consumed), and these tests prove the whole
surfacing chain: a deliberately undersized cap/capacity produces nonzero
counters AND the runner warning, in both pipelines; healthy configs
measure zero.  The reference has no fixed caps (unbounded
std::unordered_map, voxel_map.h:186) so any nonzero counter marks a
TPU-build capacity knob to raise.
"""

import logging

import jax.numpy as jnp
import numpy as np
import pytest

from legkilo_tpu.config import Config
from legkilo_tpu.models import sim
from legkilo_tpu.runner import OdometryRunner


@pytest.fixture(scope="module")
def data():
    return sim.simulate(sim.SimConfig(duration=1.5, scan_points=2000, seed=3))


def base_cfg(pipeline):
    cfg = Config()
    cfg.only_imu_use = True
    cfg.lidar.filter_num = 1
    cfg.lidar.blind = 0.3
    cfg.lidar.voxel_grid_resolution = 0.4
    cfg.voxel_map.capacity_log2 = 13
    cfg.voxel_map.max_layer = 1
    cfg.tpu.max_buckets = 56
    cfg.tpu.max_points_per_bucket = 96
    cfg.tpu.max_imu_per_bucket = 3
    cfg.tpu.pipeline = pipeline
    return cfg


def replay(cfg, data):
    runner = OdometryRunner(cfg)
    ev = iter(sorted(data.imu, key=lambda e: e.time))
    pending = next(ev, None)
    for scan in data.scans:
        while pending is not None and pending.time <= scan.end_time + 0.5:
            runner.add_imu(pending)
            pending = next(ev, None)
        runner.add_scan(scan)
    runner.flush()
    return runner


def test_deferred_undersized_cap_counts_and_warns(data, caplog):
    cfg = base_cfg("deferred")
    cfg.tpu.match_cap = 128
    cfg.tpu.insert_cap = 128
    with caplog.at_level(logging.WARNING, logger="legkilo_tpu.runner"):
        replay(cfg, data)
    assert any("cap overflow" in r.message for r in caplog.records), (
        "undersized match/insert cap must reach the operator"
    )


@pytest.mark.parametrize("pipeline", ["sequential", "deferred"])
def test_undersized_map_capacity_counts_and_warns(data, caplog, pipeline):
    cfg = base_cfg(pipeline)
    cfg.voxel_map.capacity_log2 = 6          # 64 slots/level: guaranteed full
    cfg.voxel_map.probe_length = 4
    with caplog.at_level(logging.WARNING, logger="legkilo_tpu.runner"):
        runner = replay(cfg, data)
    ocnt = np.asarray(runner.carry.vm.ocnt)
    assert ocnt[2] > 0, f"claim-failure counter should be nonzero: {ocnt}"
    assert any("map overflow" in r.message for r in caplog.records)


def test_sequential_healthy_config_measures_zero(data):
    """The measured counter agrees with the constructed zero it replaced."""
    from legkilo_tpu.core.filter import process_scan_any
    from legkilo_tpu.io.dataset import PacketBuilder, to_device_packet
    from legkilo_tpu.runner import make_static_config
    import jax

    cfg = base_cfg("sequential")
    runner = OdometryRunner(cfg)   # reuse init machinery for carry/params
    b = PacketBuilder(cfg)
    for e in data.imu:
        b.add_imu(e)
    pkts = []
    for scan in data.scans:
        b.add_scan(scan)
        while b.ready():
            pkts.append(b.pop())
    scfg = make_static_config(cfg)
    step = jax.jit(process_scan_any, static_argnums=3)
    carry = runner.carry
    # bootstrap init like the runner would
    runner2 = replay(base_cfg("sequential"), data)
    carry = runner2.carry
    total = 0
    for p in pkts[-3:]:
        carry, out = step(carry, to_device_packet(p), runner2.params, scfg)
        total += int(out.n_cap_dropped)
    assert total == 0
