"""Legged-robot-regime golden-sequence tests (rich simulator).

Round-2 review: every trajectory test used a yaw-only constant-speed walk.
These tests exercise the regimes where the reference earns its keep
(/root/reference/legkilo/src/core/slam/KILO.cc:260-314 — contact-velocity
fusion): roll/pitch gait oscillation, vertical bob, speed changes,
stop-and-go, and a geometrically degenerate corridor where forward motion
is unobservable from LiDAR alone.
"""

import numpy as np
import pytest

from legkilo_tpu.config import Config
from legkilo_tpu.io.tum import ate_rmse
from legkilo_tpu.models import sim
from legkilo_tpu.runner import run_offline


def small_config(only_imu=True):
    cfg = Config()
    cfg.only_imu_use = only_imu
    cfg.lidar.filter_num = 1
    cfg.lidar.blind = 0.3
    cfg.lidar.voxel_grid_resolution = 0.4
    cfg.voxel_map.capacity_log2 = 13
    cfg.voxel_map.max_layer = 2
    cfg.tpu.max_buckets = 56
    cfg.tpu.max_points_per_bucket = 96
    cfg.tpu.max_imu_per_bucket = 3
    return cfg


def rich_trajectory():
    """Gait attitude oscillation + bob + speed-up, full stop, restart."""
    return sim.Trajectory(
        speed=0.8, roll_amp=0.06, pitch_amp=0.04, gait_freq=2.0, bob=0.03,
        speed_segments=[(2.5, 1.4), (4.0, 0.0), (5.5, 0.9)],
    )


def run_ate(cfg, data, events):
    results = run_offline(cfg, data.scans, events)
    est_t = np.array([r.time for r in results])
    est_p = np.stack([r.pos for r in results])
    _, gt_pos_f = data.gt_in_filter_frame()
    gt_map = {round(t, 6): i for i, t in enumerate(data.gt_times)}
    sel = [i for i, t in enumerate(est_t) if round(t, 6) in gt_map]
    idx = [gt_map[round(est_t[i], 6)] for i in sel]
    return ate_rmse(est_p[sel], gt_pos_f[idx], align=False), results


# -- trajectory-model unit checks -----------------------------------------

def test_speed_profile_reaches_targets_and_stops():
    traj = rich_trajectory()
    eps = 1e-4

    def speed_at(t):
        _, p0 = traj.pose(t - eps)
        _, p1 = traj.pose(t + eps)
        return np.linalg.norm((p1 - p0) / (2 * eps))

    assert speed_at(0.3) < 1e-9                  # stationary init window
    assert abs(speed_at(2.2) - 0.8) < 0.1        # first plateau
    assert abs(speed_at(3.9) - 1.4) < 0.1        # after speed-up
    assert speed_at(5.3) < 0.05                  # full stop
    assert abs(speed_at(7.0) - 0.9) < 0.1        # restart


def test_arc_length_matches_numeric_integral():
    traj = rich_trajectory()
    ts = np.linspace(0.0, 8.0, 4001)
    v = np.array([traj._arc(t)[0] for t in ts])
    # s(t) must be the integral of a C1 speed: check monotone + smooth.
    ds = np.diff(v)
    assert (ds >= -1e-12).all()
    # numeric speed from s matches numeric speed from pose
    for t in (1.7, 3.0, 4.7, 6.5):
        s_dot = (traj._arc(t + 1e-4)[0] - traj._arc(t - 1e-4)[0]) / 2e-4
        _, p0 = traj.pose(t - 1e-4)
        _, p1 = traj.pose(t + 1e-4)
        pose_speed = np.linalg.norm((p1 - p0) / 2e-4)
        # pose speed includes the bob component; allow its amplitude
        assert abs(s_dot - pose_speed) < 0.5


def test_gait_attitude_oscillates_but_starts_identity():
    traj = rich_trajectory()
    r0, _ = traj.pose(0.2)
    assert np.allclose(r0, np.eye(3), atol=1e-12)  # stationary window
    # once walking, roll/pitch excursions appear
    tilts = []
    for t in np.linspace(2.0, 3.0, 21):
        r, _ = traj.pose(t)
        tilts.append(abs(r[2, 2] - 1.0))
    assert max(tilts) > 1e-4


# -- end-to-end filter tracking in rich regimes ----------------------------

@pytest.fixture(scope="module")
def rich_data():
    return sim.simulate(
        sim.SimConfig(duration=7.0, scan_points=3000, seed=11),
        traj=rich_trajectory(),
    )


def test_rich_gait_imu_only(rich_data):
    err, _ = run_ate(small_config(True), rich_data, rich_data.imu)
    assert err < 0.05, f"ATE {err:.3f} m"


def test_rich_gait_kin_imu(rich_data):
    err, _ = run_ate(small_config(False), rich_data, rich_data.kin)
    assert err < 0.05, f"ATE {err:.3f} m"


def test_corridor_kin_fusion_beats_imu_only():
    """Degenerate corridor: LiDAR observes nothing along x, so IMU-only
    drifts (measured ~1.2 m in 5 s) while contact-velocity fusion pins the
    velocity and holds ~0.08 m — the system's namesake capability."""
    traj = sim.Trajectory(speed=0.6, radius=1e6, roll_amp=0.05, pitch_amp=0.03)
    data = sim.simulate(
        sim.SimConfig(duration=5.0, scan_points=3000, seed=12),
        world=sim.corridor_world(), traj=traj,
    )
    err_kin, _ = run_ate(small_config(False), data, data.kin)
    err_imu, _ = run_ate(small_config(True), data, data.imu)
    assert err_kin < 0.25, f"kin ATE {err_kin:.3f} m"
    assert err_imu > 2 * err_kin, (
        f"corridor should separate the modes: imu {err_imu:.3f} "
        f"vs kin {err_kin:.3f}"
    )
