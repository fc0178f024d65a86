"""Fault-injection robustness: the filter degrades gracefully and recovers.

The reference's failure story is thin but real: sensor time-regression
clears the affected cache and continues (ros_interface.cc:179-182,
209-212, 236-239), incomplete packets are skipped with a warning
(KILO.cc:326-329), and nothing else is guarded.  These tests drive the
same fault classes through ``OdometryRunner`` end-to-end and assert the
TPU build's contract: never NaN, never crash, keep matching after the
fault clears, and re-track ground truth within a bounded error.

Faults: mid-stream IMU dropout (1.5 s), missing scans (1 s), duplicated
events, out-of-order events (cache-clear path), a forward wall-clock
jump, and a backward scan-time jump.
"""

import numpy as np
import pytest

from legkilo_tpu.config import Config
from legkilo_tpu.models import sim
from legkilo_tpu.runner import OdometryRunner


DUR = 6.0


@pytest.fixture(scope="module")
def data():
    traj = sim.Trajectory(speed=0.8, roll_amp=0.05, pitch_amp=0.03, bob=0.02)
    return sim.simulate(
        sim.SimConfig(duration=DUR, scan_points=2000, seed=9), traj=traj
    )


def make_cfg(pipeline="deferred"):
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


def replay(cfg, scans, events):
    runner = OdometryRunner(cfg)
    ev = iter(events)                       # delivered in the given order
    pending = next(ev, None)
    for scan in scans:
        while pending is not None and pending.time <= scan.end_time + 0.5:
            runner.add_imu(pending)
            pending = next(ev, None)
        runner.add_scan(scan)
    runner.flush()
    return runner.results


def check_health(data, results, final_err_bound, min_results=20):
    """Common graceful-degradation contract."""
    assert len(results) >= min_results, f"only {len(results)} scans emerged"
    for r in results:
        assert np.isfinite(r.pos).all() and np.isfinite(np.asarray(r.rot)).all()
    # Still matching after the fault cleared (the map/filter stayed sane).
    tail = results[-5:]
    assert max(r.n_matched for r in tail) > 100, (
        f"post-fault matching collapsed: {[r.n_matched for r in tail]}"
    )
    _, gt_pos_f = data.gt_in_filter_frame()
    gtm = {round(t, 6): i for i, t in enumerate(data.gt_times)}
    errs = [
        np.linalg.norm(r.pos - gt_pos_f[gtm[round(r.time, 6)]])
        for r in results if round(r.time, 6) in gtm
    ]
    assert errs and errs[-1] < final_err_bound, (
        f"final error {errs[-1]:.3f} m > {final_err_bound}"
    )
    return errs


@pytest.mark.parametrize("pipeline", ["sequential", "deferred"])
def test_imu_dropout_recovers(data, pipeline):
    """1.5 s IMU gap at t in [3.0, 4.5): gap scans queue until the stream
    resumes (the reference's lock-step syncPackage blocks identically,
    ros_interface.cc:271-332), pop with zero events, and the filter rides
    LiDAR-only prediction through the gap."""
    events = [e for e in data.imu if not (3.0 <= e.time < 4.5)]
    res = replay(make_cfg(pipeline), data.scans, events)
    check_health(data, res, final_err_bound=0.8)


def test_missing_scans_recover(data):
    """1 s of dropped LiDAR: IMU keeps the state; the next scan rebases
    the clocks over the hole."""
    scans = [s for s in data.scans if not (3.0 <= s.begin_time < 4.0)]
    res = replay(make_cfg(), scans, data.imu)
    errs = check_health(data, res, final_err_bound=0.5,
                        min_results=len(scans) - 2)
    assert len(res) >= len(scans) - 1


def test_duplicate_events_are_noops(data):
    """Every IMU event in [2, 3) delivered twice (500->50 Hz republish
    glitches; the reference's redundancy filter exists for this,
    ros_interface.cc:198-204).  Equal stamps must not clear the cache;
    dt = 0 re-updates are near-no-ops."""
    events = []
    for e in data.imu:
        events.append(e)
        if 2.0 <= e.time < 3.0:
            events.append(e)
    res = replay(make_cfg(), data.scans, events)
    check_health(data, res, final_err_bound=0.3)


def test_out_of_order_events_clear_and_recover(data):
    """Adjacent IMU events swapped in [2, 3): each regression clears the
    event cache (ros_interface.cc:209-212 semantics) — losing part of the
    window is acceptable, divergence is not."""
    events = list(data.imu)
    for i in range(len(events) - 1):
        if 2.0 <= events[i].time < 3.0 and i % 2 == 0:
            events[i], events[i + 1] = events[i + 1], events[i]
    res = replay(make_cfg(), data.scans, events)
    check_health(data, res, final_err_bound=0.8)


def test_forward_time_jump_stays_finite(data):
    """Wall clock jumps +30 s mid-stream (bag splice).  The reference has
    no guard either — the contract is finite outputs and continued
    operation, not accuracy across the splice."""
    import dataclasses

    def shift(o, dt):
        return dataclasses.replace(o, time=o.time + dt) if hasattr(o, "time") \
            else o

    scans = []
    for s in data.scans:
        if s.begin_time >= 3.0:
            s = dataclasses.replace(
                s, begin_time=s.begin_time + 30.0, end_time=s.end_time + 30.0
            )
        scans.append(s)
    events = [
        dataclasses.replace(e, time=e.time + 30.0) if e.time >= 3.0 else e
        for e in data.imu
    ]
    res = replay(make_cfg(), scans, events)
    assert len(res) >= 20
    for r in res:
        assert np.isfinite(r.pos).all() and np.isfinite(np.asarray(r.rot)).all()
    # Matching continues on the far side of the splice.
    assert max(r.n_matched for r in res[-5:]) > 100


def test_match_collapse_warns_operator(data):
    """A genuinely diverged run must raise the sustained match-rate-
    collapse warning.  Deterministic divergence: a +30 s wall-clock
    splice with the soft-reset guard DISABLED (tpu_gap_reset_s=0 — the
    reference-faithful no-guard behavior) dead-reckons the whole gap and
    never matches again."""
    import dataclasses
    import logging as _l

    scans = []
    for s in data.scans:
        if s.begin_time >= 3.0:
            s = dataclasses.replace(
                s, begin_time=s.begin_time + 30.0, end_time=s.end_time + 30.0
            )
        scans.append(s)
    events = [
        dataclasses.replace(e, time=e.time + 30.0) if e.time >= 3.0 else e
        for e in data.imu
    ]
    cfg = make_cfg("deferred")
    cfg.tpu.gap_reset_s = 0.0
    runner = OdometryRunner(cfg)
    ev = iter(events)
    pending = next(ev, None)
    records = []

    class Grab(_l.Handler):
        def emit(self, r):
            records.append(r.getMessage())

    h = Grab()
    _l.getLogger("legkilo_tpu.runner").addHandler(h)
    try:
        for scan in scans:
            while pending is not None and pending.time <= scan.end_time + 0.5:
                runner.add_imu(pending)
                pending = next(ev, None)
            runner.add_scan(scan)
        runner.flush()
    finally:
        _l.getLogger("legkilo_tpu.runner").removeHandler(h)
    assert any("match rate below" in m for m in records), (
        "diverged run should alarm the operator"
    )


def test_gap_soft_reset_chunked_matches_streaming(data):
    """The tpu_gap_reset_s soft reset must fire in CHUNKED replay exactly
    where streaming replay fires it: chunks split at gap packets, so a
    +30 s splice produces the same trajectory in both modes (the chunked
    step itself is bit-identical to per-scan stepping)."""
    import dataclasses

    from legkilo_tpu.runner import run_offline

    scans = []
    for s in data.scans:
        if s.begin_time >= 3.0:
            s = dataclasses.replace(
                s, begin_time=s.begin_time + 30.0, end_time=s.end_time + 30.0
            )
        scans.append(s)
    events = [
        dataclasses.replace(e, time=e.time + 30.0) if e.time >= 3.0 else e
        for e in data.imu
    ]
    cfg = make_cfg("deferred")
    cfg.tpu.pipeline_depth = 0
    assert cfg.tpu.gap_reset_s > 0  # the guard under test is on
    res_s = run_offline(cfg, scans, events)
    res_c = run_offline(cfg, scans, events, chunk=4)
    assert len(res_s) == len(res_c)
    for a, b in zip(res_s, res_c):
        np.testing.assert_allclose(a.pos, b.pos, atol=1e-5)
        np.testing.assert_allclose(a.rot, b.rot, atol=1e-5)
    # and both stay matched on the far side of the splice (reset worked)
    assert max(r.n_matched for r in res_c[-5:]) > 100


def test_backward_scan_jump_clears_and_recovers(data):
    """Scan timestamps regress 5 s mid-stream, then resume monotone: the
    scan cache clears (ros_interface.cc:175-182) and replay continues on
    the still-monotone remainder."""
    import dataclasses

    scans = list(data.scans)
    # Inject one stale (regressed) scan copy at t=3.0s position.
    k = next(i for i, s in enumerate(scans) if s.begin_time >= 3.0)
    stale = dataclasses.replace(
        scans[k], begin_time=scans[k].begin_time - 5.0,
        end_time=scans[k].end_time - 5.0,
    )
    scans.insert(k, stale)
    res = replay(make_cfg(), scans, data.imu)
    check_health(data, res, final_err_bound=0.8, min_results=20)


def test_nonfinite_imu_samples_dropped(data):
    """A NaN accelerometer sample (sensor glitch / truncated message)
    must be dropped at ingestion — one NaN reaching the filter poisons
    the state permanently.  The reference has no such guard."""
    import dataclasses

    events = []
    for i, e in enumerate(data.imu):
        events.append(e)
        if 2.0 <= e.time < 2.5 and i % 3 == 0:
            bad = np.array(e.acc, dtype=float).copy()
            bad[1] = np.nan
            events.append(dataclasses.replace(e, time=e.time + 1e-4, acc=bad))
    res = replay(make_cfg(), data.scans, events)
    check_health(data, res, final_err_bound=0.3)
