"""Host-feed pipelining (runner pipeline_depth): bounded in-flight window.

The PP analog of the reference's producer threads + consumer main loop
(ros_interface.cc:125-172, 380-404): dispatch of scan k+1 overlaps device
compute of scan k.  Pipelining must change WHEN results materialize, never
WHAT they are — depth 0 (fully synchronous) and depth N must produce
bit-identical trajectories in identical order.
"""

import numpy as np

from legkilo_tpu.config import Config
from legkilo_tpu.models import sim
from legkilo_tpu.runner import run_offline


def _cfg(depth: int) -> Config:
    cfg = Config()
    cfg.only_imu_use = True
    cfg.lidar.filter_num = 1
    cfg.lidar.blind = 0.3
    cfg.lidar.voxel_grid_resolution = 0.4
    cfg.voxel_map.capacity_log2 = 12
    cfg.tpu.max_buckets = 28
    cfg.tpu.max_points_per_bucket = 64
    cfg.tpu.max_imu_per_bucket = 2
    cfg.tpu.bucket_quantum_ms = 4.0
    cfg.tpu.pipeline_depth = depth
    return cfg


def test_pipeline_depth_equivalence():
    data = sim.simulate(sim.SimConfig(duration=2.0, scan_points=1500, seed=3))
    res = {
        d: run_offline(_cfg(d), data.scans, data.imu, return_cloud=(d != 1))
        for d in (0, 3)
    }
    r0, r3 = res[0], res[3]
    assert len(r0) == len(r3) >= 15
    for a, b in zip(r0, r3):
        assert a.time == b.time
        np.testing.assert_array_equal(a.pos, b.pos)
        np.testing.assert_array_equal(a.rot, b.rot)
        assert a.n_matched == b.n_matched
        assert a.n_points == b.n_points


def test_flush_is_idempotent_and_ordered():
    data = sim.simulate(sim.SimConfig(duration=1.5, scan_points=1200, seed=4))
    from legkilo_tpu.runner import OdometryRunner

    runner = OdometryRunner(_cfg(depth=8))
    ev_iter = iter(sorted(data.imu, key=lambda e: e.time))
    pending = next(ev_iter, None)
    for scan in data.scans:
        while pending is not None and pending.time <= scan.end_time + 0.5:
            runner.add_imu(pending)
            pending = next(ev_iter, None)
        runner.add_scan(scan)
    n_before = len(runner.results)
    flushed = runner.flush()
    assert len(flushed) > 0  # depth 8 window was actually holding scans
    assert runner.flush() == []
    assert len(runner.results) == n_before + len(flushed)
    times = [r.time for r in runner.results]
    assert times == sorted(times)


def test_chunked_run_offline_matches_streaming():
    """run_offline(chunk=4) must reproduce the streaming trajectory
    bit-for-bit (including the ragged per-scan tail)."""
    data = sim.simulate(sim.SimConfig(duration=2.0, scan_points=1500, seed=6))
    r_stream = run_offline(_cfg(2), data.scans, data.imu)
    r_chunk = run_offline(_cfg(0), data.scans, data.imu, chunk=4)
    assert len(r_stream) == len(r_chunk) >= 15
    for a, b in zip(r_stream, r_chunk):
        assert a.time == b.time
        np.testing.assert_array_equal(a.pos, b.pos)
        np.testing.assert_array_equal(a.rot, b.rot)
        assert a.n_matched == b.n_matched


def test_checkpoint_preserves_escalation_state(tmp_path):
    """Escalation is sticky by design (de-escalating on a corrupted map
    re-accrues drift — config.py rationale); a checkpoint/resume cycle
    must come back escalated with its counters intact."""
    from legkilo_tpu.runner import OdometryRunner

    cfg = _cfg(0)
    cfg.tpu.pipeline = "deferred"
    data = sim.simulate(sim.SimConfig(duration=1.0, scan_points=1200, seed=4))
    runner = OdometryRunner(cfg)
    ev = iter(sorted(data.imu, key=lambda e: e.time))
    pending = next(ev, None)
    for scan in data.scans[:5]:
        while pending is not None and pending.time <= scan.end_time + 0.5:
            runner.add_imu(pending)
            pending = next(ev, None)
        runner.add_scan(scan)
    runner.flush()

    # Force the escalated regime as the collapse detector would.
    assert runner._esc_enabled
    runner._esc_active = True
    runner._esc_latched = True
    runner._esc_streak = 2
    runner._scfg_active = runner._scfg_esc
    path = runner.save_checkpoint(str(tmp_path / "esc_ckpt"))

    fresh = OdometryRunner(cfg)
    fresh.load_checkpoint(path)
    assert fresh._esc_active and fresh._esc_latched
    assert fresh._esc_streak == 2
    assert fresh._n_done == runner._n_done
    assert fresh._scfg_active.match_iters == runner._scfg_esc.match_iters
