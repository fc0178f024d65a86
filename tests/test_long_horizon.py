"""Long-horizon f32 covariance stability (SURVEY.md §7 hard-parts plan).

Measured (tools/longrun_stability.py, 600 scans / 60 s, committed in
docs/PERF_NOTES.md "Long-horizon f32 stability"): without symmetrization
the f32 asymmetry of P stays BOUNDED at ~3e-8 (not drifting), min eig
stays positive, and f32 ATE equals the f64 yardstick to 4 digits.  With
the per-scan symmetrization (default on) the asymmetry is exactly zero.

This test replays a 300-scan rich sim in CI and asserts those bounds so
a regression in the downdate algebra (P -= KHP, eskf.cc:91-145) or an
accidentally-disabled symmetrization cannot land silently.
"""

import numpy as np
import pytest

from legkilo_tpu.config import Config
from legkilo_tpu.models import sim
from legkilo_tpu.runner import OdometryRunner


def _run(symmetrize: bool, duration: float = 30.0, mode: str = "imu"):
    traj = sim.Trajectory(
        speed=0.8, roll_amp=0.05, pitch_amp=0.03, bob=0.03,
        speed_segments=[(10.0, 1.3), (18.0, 0.0), (23.0, 0.9)],
    )
    data = sim.simulate(
        sim.SimConfig(duration=duration, scan_points=1500, seed=5), traj=traj
    )
    cfg = Config()
    cfg.only_imu_use = mode == "imu"
    cfg.lidar.filter_num = 1
    cfg.lidar.blind = 0.3
    cfg.lidar.voxel_grid_resolution = 0.4
    cfg.voxel_map.capacity_log2 = 15
    cfg.tpu.max_buckets = 56
    cfg.tpu.max_points_per_bucket = 96
    cfg.tpu.max_imu_per_bucket = 3
    cfg.tpu.pipeline_depth = 0
    cfg.tpu.symmetrize_cov = symmetrize
    runner = OdometryRunner(cfg)
    events = data.imu if mode == "imu" else data.kin
    add = runner.add_imu if mode == "imu" else runner.add_kin_imu
    ev = iter(sorted(events, key=lambda e: e.time))
    pending = next(ev, None)
    asyms, errs = [], []
    _, gt_pos = data.gt_in_filter_frame()
    gtm = {round(t, 6): i for i, t in enumerate(data.gt_times)}
    n = 0
    for scan in data.scans:
        while pending is not None and pending.time <= scan.end_time + 0.5:
            add(pending)
            pending = next(ev, None)
        runner.add_scan(scan)
        runner.flush()
        n += 1
        if n % 25 == 0:
            P = np.asarray(runner.carry.cov, dtype=np.float64)
            asyms.append(np.abs(P - P.T).max())
            eigs = np.linalg.eigvalsh(0.5 * (P + P.T))
            assert eigs[0] > 0.0, f"P lost positive-definiteness at scan {n}"
            r = runner.results[-1]
            gi = gtm.get(round(r.time, 6))
            if gi is not None:
                errs.append(np.linalg.norm(r.pos - gt_pos[gi]))
    return np.array(asyms), np.array(errs), n


def test_f32_asymmetry_bounded_without_symmetrization():
    asyms, errs, n = _run(symmetrize=False)
    assert n >= 290
    # Measured ceiling 3e-8 over 600 scans; 100x headroom for the bound.
    assert asyms.max() < 1e-6, f"asymmetry drifted to {asyms.max():.2e}"
    # No late-run blowup: the last quarter must not be worse than 10x the
    # overall median (catches exponential drift while allowing noise).
    assert asyms[-len(asyms) // 4 :].max() < 10 * max(np.median(asyms), 1e-9)
    assert np.sqrt((errs**2).mean()) < 0.05


def test_f32_symmetrized_is_exact_and_equal_ate():
    asyms, errs, n = _run(symmetrize=True)
    assert n >= 290
    assert asyms.max() == 0.0
    assert np.sqrt((errs**2).mean()) < 0.05


def test_f32_kin_mode_long_horizon_stable():
    """The namesake leg-fusion mode (KILO.cc:260-314): the 18-row
    contact-velocity update adds its own downdates — guard its long-run
    f32 stability alongside the IMU-only arms (shorter horizon to bound
    CI time; asymmetry bounds scale-free)."""
    asyms, errs, n = _run(symmetrize=False, duration=20.0, mode="kin")
    assert n >= 190
    assert asyms.max() < 1e-6, f"asymmetry drifted to {asyms.max():.2e}"
    assert np.sqrt((errs**2).mean()) < 0.05
