"""End-to-end map sliding: a long excursion actually triggers eviction.

Round-3 review: ``slide_map`` was unit-tested only — every e2e replay
stayed inside a ~5 m circle, below the 8 m ``sliding_thresh``, so the
eviction -> slot-reuse -> hinted-insert interplay had never run inside a
real replay (the stale ``own_slot`` concern: a freed slot must not be
resurrected by a later hinted insert without a proper claim).

Scenario: a 40 m room, straight-line walk ~30 m (>3x sliding_thresh),
small half_map_size so each slide really evicts the space behind.
Reference: mapSliding / clearMemOutOfMap (voxel_map.cc:552-594) — never
invoked by the reference's own launch files either, but claimed as a
capability by both.
"""

import numpy as np
import pytest

from legkilo_tpu.config import Config
from legkilo_tpu.io.tum import ate_rmse
from legkilo_tpu.models import sim
from legkilo_tpu.runner import OdometryRunner


DUR = 15.0          # ~28 m path at 2 m/s -> slides at 8/16/24 m
HALF_VOXELS = 8     # 8 m level-0 box (voxel 1.0 m)
VOXEL = 1.0


def long_room():
    """35 m room; 18 m LiDAR range keeps an end wall visible throughout
    (x observable) while the surviving local map is a fraction of it."""
    e = np.eye(3)
    return [
        sim.Plane(np.array([0.0, 0.0, 0.0]), e[2]),
        sim.Plane(np.array([0.0, 0.0, 3.0]), -e[2]),
        sim.Plane(np.array([0.0, 4.0, 0.0]), -e[1]),
        sim.Plane(np.array([0.0, -4.0, 0.0]), e[1]),
        sim.Plane(np.array([-5.0, 0.0, 0.0]), e[0]),
        sim.Plane(np.array([30.0, 0.0, 0.0]), -e[0]),
    ]


@pytest.fixture(scope="module")
def excursion_data():
    traj = sim.Trajectory(speed=2.0, radius=5000.0, roll_amp=0.04,
                          pitch_amp=0.03, bob=0.02)
    return sim.simulate(
        sim.SimConfig(duration=DUR, scan_points=2000, seed=21, max_range=18.0),
        world=long_room(), traj=traj,
    )


def make_cfg(pipeline, sliding):
    cfg = Config()
    cfg.only_imu_use = True
    cfg.lidar.filter_num = 1
    cfg.lidar.blind = 0.3
    cfg.lidar.voxel_grid_resolution = 0.4
    cfg.voxel_map.voxel_size = VOXEL
    cfg.voxel_map.capacity_log2 = 13
    cfg.voxel_map.max_layer = 1
    cfg.voxel_map.map_sliding_en = sliding
    cfg.voxel_map.half_map_size = HALF_VOXELS
    cfg.voxel_map.sliding_thresh = 8.0
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
    res = runner.results
    t = np.array([r.time for r in res])
    p = np.stack([r.pos for r in res])
    return runner, t, p


def gt_ate(data, t, p):
    _, gt_pos_f = data.gt_in_filter_frame()
    gtm = {round(tt, 6): i for i, tt in enumerate(data.gt_times)}
    sel = [i for i, tt in enumerate(t) if round(tt, 6) in gtm]
    idx = [gtm[round(t[i], 6)] for i in sel]
    return ate_rmse(p[sel], gt_pos_f[idx], align=False)


@pytest.fixture(scope="module")
def runs(excursion_data):
    out = {}
    out["def_slide"] = replay(make_cfg("deferred", True), excursion_data)
    out["def_keep"] = replay(make_cfg("deferred", False), excursion_data)
    out["seq_slide"] = replay(make_cfg("sequential", True), excursion_data)
    return out


def test_sliding_triggers_and_bounds_occupancy(runs):
    r_slide, _, p = runs["def_slide"]
    r_keep, _, _ = runs["def_keep"]
    # A slide actually happened (the trigger moved off the origin) ...
    assert float(np.linalg.norm(np.asarray(r_slide.carry.last_slide_pos))) >= 8.0
    # ... and occupancy stays bounded vs the unbounded-map run.
    occ_s = int(np.asarray(r_slide.carry.vm.occ).sum())
    occ_k = int(np.asarray(r_keep.carry.vm.occ).sum())
    assert occ_s < 0.75 * occ_k, f"slide {occ_s} vs keep {occ_k}"


def test_evicted_space_stays_evicted(runs):
    """All surviving level-0 voxels lie within the local box of the last
    slide position (+ up to sliding_thresh of post-slide travel) — space
    behind the robot was evicted and never resurrected by hinted inserts."""
    runner, _, p = runs["def_slide"]
    vm = runner.carry.vm
    C = runner.scfg.map_cfg.capacity
    occ0 = np.asarray(vm.occ[:C])
    keys0 = np.asarray(vm.key[:C])[occ0]                   # [n, 3]
    slide_pos = np.asarray(runner.carry.last_slide_pos)
    center = np.floor(slide_pos / VOXEL).astype(np.int32)
    # Post-slide inserts extend up to LiDAR range (18 m = 18 voxels)
    # ahead of the moving robot, which itself travels < sliding_thresh
    # past the slide point before the next slide would fire.
    margin = HALF_VOXELS + int(8.0 / VOXEL) + int(18.0 / VOXEL) + 2
    d = np.abs(keys0 - center[None, :]).max(axis=-1)
    assert d.max() <= margin, (
        f"resurrected/stale voxel at |delta|={d.max()} > {margin}"
    )


def test_cleared_slots_hold_no_stats(runs):
    """occ == 0 rows must have zero meta/moments: a stale own_slot hint
    writing into a cleared row without re-claiming it would break this."""
    runner, _, _ = runs["def_slide"]
    vm = runner.carry.vm
    occ = np.asarray(vm.occ)
    meta = np.asarray(vm.meta)
    mom = np.asarray(vm.mom)
    assert np.abs(meta[~occ]).max() == 0.0
    assert np.abs(mom[~occ]).max() == 0.0


def test_sliding_matches_no_slide_trajectory(runs, excursion_data):
    _, t_s, p_s = runs["def_slide"]
    _, t_k, p_k = runs["def_keep"]
    _, t_q, p_q = runs["seq_slide"]
    # Eviction only removes geometry behind the robot; the trajectory over
    # the shared (local) region must match the unbounded-map run.
    m = {round(tt, 6): i for i, tt in enumerate(t_k)}
    d = np.array([np.linalg.norm(p_s[i] - p_k[m[round(tt, 6)]])
                  for i, tt in enumerate(t_s) if round(tt, 6) in m])
    assert np.sqrt((d ** 2).mean()) < 0.05, f"slide-vs-keep RMSE {d}"
    # Both pipelines track ground truth through 3+ slides.
    assert gt_ate(excursion_data, t_s, p_s) < 0.30
    assert gt_ate(excursion_data, t_q, p_q) < 0.30
