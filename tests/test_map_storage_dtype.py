"""Reduced-precision voxel-map storage (MapConfig.storage_dtype).

The mom/plane tables dominate fleet HBM (100 floats of 436 bytes/slot);
f16 storage halves them, raising replicas-per-chip.  Moments are
voxel-center-relative so f16 accumulation must stay mm-accurate: these
tests assert trajectory equivalence with f32 storage and that the arrays
really are narrow.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from legkilo_tpu.config import Config
from legkilo_tpu.core.voxel_map import make_map, map_config_from
from legkilo_tpu.io.tum import ate_rmse
from legkilo_tpu.models import sim
from legkilo_tpu.runner import run_offline


def _cfg(storage, pipeline="sequential"):
    cfg = Config()
    cfg.only_imu_use = True
    cfg.lidar.filter_num = 1
    cfg.lidar.blind = 0.3
    cfg.lidar.voxel_grid_resolution = 0.4
    cfg.voxel_map.capacity_log2 = 14
    cfg.voxel_map.max_layer = 2
    cfg.voxel_map.storage_dtype = storage
    cfg.tpu.max_buckets = 56
    cfg.tpu.max_points_per_bucket = 96
    cfg.tpu.max_imu_per_bucket = 3
    cfg.tpu.pipeline = pipeline
    return cfg


def test_storage_dtype_array_width():
    cfg = _cfg("f16")
    vm = make_map(map_config_from(cfg.voxel_map))
    # Split-precision layout: geometry moments (m1/m2) stay f32 — the
    # plane fit's m2/n - c c^T cancellation cannot survive f16 — while the
    # uncertainty stats and fitted plane rows go narrow.
    assert vm.mom.dtype == jnp.float32
    assert vm.moms.dtype == jnp.float16
    assert vm.plane.dtype == jnp.float16
    assert vm.meta.dtype == jnp.float32
    vm32 = make_map(map_config_from(_cfg("f32").voxel_map))
    assert vm32.moms.nbytes == 2 * vm.moms.nbytes
    assert vm32.plane.nbytes == 2 * vm.plane.nbytes
    # Whole-map float bytes shrink by ~45%.
    def fbytes(v):
        return v.meta.nbytes + v.mom.nbytes + v.moms.nbytes + v.plane.nbytes
    assert fbytes(vm) < 0.62 * fbytes(vm32)


@pytest.fixture(scope="module")
def storage_sim():
    traj = sim.Trajectory(speed=0.8, roll_amp=0.05, pitch_amp=0.03)
    return sim.simulate(
        sim.SimConfig(duration=4.0, scan_points=2500, seed=3), traj=traj
    )


def _ate(data, results):
    rt = np.array([r.time for r in results])
    rp = np.stack([r.pos for r in results])
    _, gt = data.gt_in_filter_frame()
    gm = {round(t, 6): i for i, t in enumerate(data.gt_times)}
    sel = [i for i, t in enumerate(rt) if round(t, 6) in gm]
    idx = [gm[round(rt[i], 6)] for i in sel]
    return float(np.sqrt(np.mean(np.sum((rp[sel] - gt[idx]) ** 2, axis=1))))


@pytest.mark.parametrize("pipeline", ["sequential", "deferred"])
def test_f16_storage_ate_equivalent(storage_sim, pipeline):
    data = storage_sim
    r32 = run_offline(_cfg("f32", pipeline), data.scans, data.imu)
    r16 = run_offline(_cfg("f16", pipeline), data.scans, data.imu)
    ate32, ate16 = _ate(data, r32), _ate(data, r16)
    assert ate32 < 0.05
    # Equal-ATE requirement: f16 storage must not cost accuracy beyond
    # sub-mm noise (measured deltas ~1e-4 m on this workload).
    assert ate16 < ate32 + 0.005, f"f16 {ate16:.4f} vs f32 {ate32:.4f}"
    # Matching behavior stays intact too.
    mr16 = np.mean(
        [r.n_matched / max(r.n_points, 1) for r in r16[len(r16) // 2 :]]
    )
    assert mr16 > 0.5
