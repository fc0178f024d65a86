"""Dynamics-envelope stress tests: aggressive quadruped gait.

Round-3 review flagged that the richest committed validation used gentle
gait (0.05 rad at 2 Hz, <=1.3 m/s) while real trot/bound reaches
+-0.1-0.3 rad attitude at 2.5-4 Hz with >1.5 rad/s yaw — exactly where
the deferred pipeline's per-bucket match-pose extrapolation is stressed
(core/filter_deferred.py phase 1; the product claim is the reference's
per-bucket pose interleave, KILO.cc:108-233, 373-395).

These tests pin the measured envelope (tools/refemu/run_parity.py
--traj aggressive|extreme; committed table in docs/PARITY.md):

* aggressive (0.2 rad @ 3 Hz, 1.7 rad/s yaw, 2 m/s + stop-and-go):
  one-pass deferred with IMU-propagated match poses tracks the
  sequential rollout; const-vel extrapolation is measurably worse.
* extreme (0.3 rad @ 4 Hz, 2 rad/s yaw): one-pass deferred diverges
  (any match-pose model); iterated matching (tpu_match_iters >= 3)
  restores sequential-quality association without adding sequential
  structure.
"""

import numpy as np
import pytest

from legkilo_tpu.config import Config
from legkilo_tpu.io.tum import ate_rmse
from legkilo_tpu.models import sim
from legkilo_tpu.runner import run_offline


def make_cfg(pipeline, match_pose="imu", match_iters=1, auto_escalate=False):
    cfg = Config()
    cfg.only_imu_use = True
    cfg.lidar.filter_num = 1
    cfg.lidar.blind = 0.3
    cfg.lidar.voxel_grid_resolution = 0.4
    cfg.voxel_map.capacity_log2 = 13
    cfg.voxel_map.max_layer = 2
    cfg.tpu.max_buckets = 56
    cfg.tpu.max_points_per_bucket = 96
    cfg.tpu.max_imu_per_bucket = 3
    cfg.tpu.pipeline = pipeline
    cfg.tpu.match_pose = match_pose
    cfg.tpu.match_iters = match_iters
    if not auto_escalate:
        # These tests document the raw pipeline envelope; the runner's
        # auto-escalation safety net (default-on) is exercised separately
        # by test_extreme_auto_escalation_recovers_without_operator.
        cfg.tpu.escalate_after = 0
    return cfg


def run_ate(cfg, data):
    results = run_offline(cfg, data.scans, data.imu)
    est_t = np.array([r.time for r in results])
    est_p = np.stack([r.pos for r in results])
    _, gt_pos_f = data.gt_in_filter_frame()
    gt_map = {round(t, 6): i for i, t in enumerate(data.gt_times)}
    sel = [i for i, t in enumerate(est_t) if round(t, 6) in gt_map]
    idx = [gt_map[round(est_t[i], 6)] for i in sel]
    return ate_rmse(est_p[sel], gt_pos_f[idx], align=False), est_t, est_p


def cross_rmse(t1, p1, t2, p2):
    m2 = {round(t, 6): i for i, t in enumerate(t2)}
    d = np.array(
        [np.linalg.norm(p1[i] - p2[m2[round(t, 6)]])
         for i, t in enumerate(t1) if round(t, 6) in m2]
    )
    return float(np.sqrt((d ** 2).mean()))


@pytest.fixture(scope="module")
def aggressive_data():
    """Trot regime: +-0.2/0.12 rad at 3 Hz, 1.7 rad/s yaw, 2 m/s sprint
    with a hard stop-and-go (gait-impact jerk via 3 Hz bob)."""
    traj = sim.Trajectory(
        speed=2.0, radius=1.2, roll_amp=0.20, pitch_amp=0.12,
        gait_freq=3.0, bob=0.04, bob_freq=3.0,
        speed_segments=[(4.0, 0.0), (5.5, 2.0)], ramp=0.6,
    )
    return sim.simulate(
        sim.SimConfig(duration=6.0, scan_points=2000, seed=5), traj=traj
    )


@pytest.fixture(scope="module")
def extreme_data():
    """Bound/pronk envelope edge: +-0.3/0.2 rad at 4 Hz, 2 rad/s yaw."""
    traj = sim.Trajectory(
        speed=2.0, radius=1.0, roll_amp=0.30, pitch_amp=0.20,
        gait_freq=4.0, bob=0.05, bob_freq=4.0, ramp=0.6,
    )
    return sim.simulate(
        sim.SimConfig(duration=6.0, scan_points=2000, seed=5), traj=traj
    )


def test_aggressive_deferred_imu_tracks_sequential(aggressive_data):
    err_s, t_s, p_s = run_ate(make_cfg("sequential"), aggressive_data)
    err_d, t_d, p_d = run_ate(make_cfg("deferred", "imu"), aggressive_data)
    assert err_s < 0.10, f"sequential ATE {err_s:.3f} m"
    # One-pass deferred with IMU-propagated poses stays in the sequential
    # band (measured 0.034 vs 0.032 on the 8 s run; bound is 3x slack).
    assert err_d < 3.0 * max(err_s, 0.02), (
        f"deferred/imu ATE {err_d:.3f} vs sequential {err_s:.3f}"
    )
    assert cross_rmse(t_d, p_d, t_s, p_s) < 0.15


def test_aggressive_imu_pose_beats_const_vel(aggressive_data):
    _, t_s, p_s = run_ate(make_cfg("sequential"), aggressive_data)
    _, t_i, p_i = run_ate(make_cfg("deferred", "imu"), aggressive_data)
    _, t_c, p_c = run_ate(make_cfg("deferred", "const_vel"), aggressive_data)
    rmse_imu = cross_rmse(t_i, p_i, t_s, p_s)
    rmse_cv = cross_rmse(t_c, p_c, t_s, p_s)
    # The IMU-propagated match poses track the sequential chain closer
    # than const-vel extrapolation under gait (measured 0.023 vs 0.030
    # at 8 s); allow equality-with-noise but not inversion.
    assert rmse_imu < rmse_cv * 1.15, (
        f"imu match poses should not be worse: {rmse_imu:.4f} vs "
        f"const_vel {rmse_cv:.4f}"
    )


def test_extreme_auto_escalation_recovers_without_operator(extreme_data):
    """With match_iters: 1 CONFIGURED and no operator action, the runner's
    auto-escalation must catch the soft divergence (match rate rotting at
    35-60% — never tripping the 20% collapse alarm) and recover iterated-
    matching accuracy end-to-end.  Replaces the round-4 log-alarm-plus-
    manual-knob story; the reference needs no operator either (per-bucket
    in-scan feedback, KILO.cc:108-233).

    Measured: auto 0.108 m ATE vs it-3's 0.108 vs one-pass 1.21 diverged;
    aggressive/benign regimes never escalate (runs identical to one-pass).
    """
    err_auto, t_a, p_a = run_ate(
        make_cfg("deferred", "imu", 1, auto_escalate=True), extreme_data
    )
    err_3, t_3, p_3 = run_ate(make_cfg("deferred", "imu", 3), extreme_data)
    err_1, _, _ = run_ate(make_cfg("deferred", "imu", 1), extreme_data)
    assert err_1 > 3.0 * err_3, "one-pass no longer diverges; retune test"
    assert err_auto < 1.5 * max(err_3, 0.05), (
        f"auto-escalated ATE {err_auto:.3f} vs it-3 {err_3:.3f}"
    )
    assert cross_rmse(t_a, p_a, t_3, p_3) < 2.0 * max(err_3, 0.05)


def test_benign_run_never_escalates(aggressive_data):
    """False-positive guard: on in-envelope dynamics the auto-escalation
    trigger must stay silent — the run must be bit-identical to the
    escalation-disabled run (no hidden +20%-latency passes)."""
    _, t_a, p_a = run_ate(
        make_cfg("deferred", "imu", 1, auto_escalate=True), aggressive_data
    )
    _, t_0, p_0 = run_ate(make_cfg("deferred", "imu", 1), aggressive_data)
    np.testing.assert_array_equal(p_a, p_0)


def test_extreme_iterated_matching_restores_sequential(extreme_data):
    err_s, t_s, p_s = run_ate(make_cfg("sequential"), extreme_data)
    err_1, _, _ = run_ate(make_cfg("deferred", "imu", 1), extreme_data)
    err_3, t_3, p_3 = run_ate(make_cfg("deferred", "imu", 3), extreme_data)
    assert err_s < 0.25, f"sequential ATE {err_s:.3f} m"
    # One-pass deferred is KNOWN-divergent here (measured 3.6 m at 8 s /
    # ~0.6 m by 6 s) — this guard documents the envelope edge; if a
    # future change makes one-pass work, tighten the docs instead.
    assert err_1 > err_3, "one-pass unexpectedly matched iterated quality"
    # Three-pass iterated matching restores sequential-band accuracy
    # (measured 0.124 vs 0.128 at 8 s).
    assert err_3 < 2.0 * max(err_s, 0.05), (
        f"deferred/it3 ATE {err_3:.3f} vs sequential {err_s:.3f}"
    )
    assert cross_rmse(t_3, p_3, t_s, p_s) < 2.0 * max(err_s, 0.05)


def test_extreme_auto_escalation_with_pallas_kernels(extreme_data):
    """Auto-escalation on the full round-5 Pallas kernel set: the runner
    must pre-declare and switch onto the it-N Pallas variant exactly as
    it does for the XLA lowering (the escalated step is a separately
    compiled executable either way)."""
    cfg = make_cfg("deferred", "imu", 1, auto_escalate=True)
    cfg.tpu.use_pallas = True
    cfg.tpu.use_pallas_match = True
    cfg.tpu.use_pallas_insert = True
    cfg.tpu.use_pallas_pose = True
    cfg.tpu.match_cap = 2560
    cfg.tpu.insert_cap = 2560
    cfg.voxel_map.insert_row_cap = 2560
    err_auto, _, _ = run_ate(cfg, extreme_data)
    assert err_auto < 0.5, (
        f"auto-escalated pallas run diverged: ATE {err_auto:.3f} m"
    )
