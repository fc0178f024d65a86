"""End-to-end golden-sequence test: synthetic world, known trajectory.

SURVEY.md §4b: tiny synthetic worlds with simulated IMU/kinematics where the
true trajectory is known analytically — the filter must track it.
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


@pytest.fixture(scope="module")
def simdata():
    return sim.simulate(sim.SimConfig(duration=5.0, scan_points=3000, seed=3))


def run_and_compare(cfg, simdata, events):
    results = run_offline(cfg, simdata.scans, events)
    assert len(results) >= 45, f"only {len(results)} scans processed"

    est_t = np.array([r.time for r in results])
    est_p = np.stack([r.pos for r in results])
    _, gt_pos_f = simdata.gt_in_filter_frame()
    gt_map = {round(t, 6): i for i, t in enumerate(simdata.gt_times)}
    sel = [i for i, t in enumerate(est_t) if round(t, 6) in gt_map]
    idx = [gt_map[round(est_t[i], 6)] for i in sel]
    est_sel, gt_sel = est_p[sel], gt_pos_f[idx]

    # Matching sanity: most downsampled points should find planes.
    late = results[len(results) // 2 :]
    ratios = [r.n_matched / max(r.n_points, 1) for r in late]
    assert np.mean(ratios) > 0.5, f"match ratio {np.mean(ratios):.2f}"

    err = ate_rmse(est_sel, gt_sel, align=False)
    return err, est_sel, gt_sel


def test_imu_only_tracks_ground_truth(simdata):
    cfg = small_config(only_imu=True)
    err, est, gt = run_and_compare(cfg, simdata, simdata.imu)
    assert err < 0.08, f"ATE {err:.3f} m"


def test_kin_imu_mode_tracks_ground_truth(simdata):
    cfg = small_config(only_imu=False)
    err, est, gt = run_and_compare(cfg, simdata, simdata.kin)
    assert err < 0.08, f"ATE {err:.3f} m"
