"""Host packetizer: decimation, quantization, downsample, event assignment."""

import numpy as np

from legkilo_tpu.config import Config
from legkilo_tpu.io import dataset as ds


def make_cfg(nb=16, pmax=32, kmax=3):
    cfg = Config()
    cfg.lidar.filter_num = 2
    cfg.lidar.blind = 1.0
    cfg.lidar.voxel_grid_resolution = 0.4
    cfg.tpu.max_buckets = nb
    cfg.tpu.max_points_per_bucket = pmax
    cfg.tpu.max_imu_per_bucket = kmax
    cfg.only_imu_use = True
    return cfg


def test_decimate_blind(rng):
    pts = rng.uniform(-5, 5, size=(100, 3)).astype(np.float32)
    pts[5] = [0.1, 0.1, 0.1]  # inside blind radius
    toff = np.linspace(0, 0.1, 100).astype(np.float32)
    out_p, out_t, _ = ds.decimate_blind(pts, toff, filter_num=2, blind=1.0)
    # Every kept point has even index and is outside the blind radius
    # (lidar_processing.cc:40-41).
    assert len(out_p) <= 50
    assert (np.linalg.norm(out_p, axis=1) > 1.0).all()


def test_quantize_times():
    t = np.array([0.0, 0.0012, 0.0011, 0.0030, 0.0999])
    q = ds.quantize_times(t)
    np.testing.assert_allclose(q, [0.0, 0.002, 0.002, 0.004, 0.1], atol=1e-9)


def test_voxel_downsample_centroid(rng):
    pts = np.array(
        [[0.1, 0.1, 0.1], [0.3, 0.3, 0.3], [1.1, 0.1, 0.1]], dtype=np.float32
    )
    toff = np.array([0.0, 0.002, 0.004], dtype=np.float32)
    out_p, out_t, out_i = ds.voxel_downsample(
        pts, toff, leaf=0.5, intensity=np.array([10.0, 20.0, 7.0], np.float32)
    )
    assert len(out_p) == 2
    order = np.argsort(out_p[:, 0])
    np.testing.assert_allclose(out_p[order[0]], [0.2, 0.2, 0.2], atol=1e-6)
    np.testing.assert_allclose(out_t[order[0]], 0.001, atol=1e-7)
    np.testing.assert_allclose(out_p[order[1]], [1.1, 0.1, 0.1], atol=1e-6)
    np.testing.assert_allclose(out_i[order[0]], 15.0, atol=1e-6)
    np.testing.assert_allclose(out_i[order[1]], 7.0, atol=1e-6)


def test_packet_shapes_and_event_assignment(rng):
    cfg = make_cfg()
    b = ds.PacketBuilder(cfg)
    n = 600
    pts = rng.uniform(2, 5, size=(n, 3)).astype(np.float32)
    toff = np.sort(rng.uniform(0, 0.03, n)).astype(np.float32)
    scan = ds.RawScan(begin_time=100.0, end_time=100.03, points=pts, time_offset=toff)
    # IMU events: one before the first bucket, one mid-scan, one exactly at a
    # bucket time (must go to the NEXT bucket: strict <, KILO.cc:381), one
    # after the last bucket (dropped).
    events = [
        ds.ImuEvent(time=99.999, acc=np.ones(3), gyr=np.zeros(3)),
        ds.ImuEvent(time=100.0101, acc=np.ones(3) * 2, gyr=np.zeros(3)),
        ds.ImuEvent(time=100.029999, acc=np.ones(3) * 3, gyr=np.zeros(3)),
    ]
    pkt = b.build_packet(scan, events)
    assert pkt.points.shape == (16, 32, 3)
    assert pkt.bucket_mask.sum() >= 10
    # Event 0 (before scan start) must be in bucket 0.
    assert pkt.imu_mask[0, 0]
    np.testing.assert_allclose(pkt.imu_time[0, 0], 99.999 - 100.0, atol=1e-6)
    # All masked events have times strictly below their bucket's time.
    for i in range(16):
        if not pkt.bucket_mask[i]:
            continue
        for k in range(3):
            if pkt.imu_mask[i, k]:
                assert pkt.imu_time[i, k] < pkt.bucket_time[i] + 1e-9
    # Total assigned + dropped == 3
    assert pkt.imu_mask.sum() + pkt.dropped_events == 3


def test_builder_lockstep_sync(rng):
    """A scan is only released once events pass its end time
    (syncPackage, ros_interface.cc:271-332)."""
    cfg = make_cfg()
    b = ds.PacketBuilder(cfg)
    pts = rng.uniform(2, 4, size=(50, 3)).astype(np.float32)
    toff = np.sort(rng.uniform(0, 0.02, 50)).astype(np.float32)
    b.add_scan(ds.RawScan(begin_time=0.0, end_time=0.02, points=pts, time_offset=toff))
    assert not b.ready()
    b.add_imu(ds.ImuEvent(time=0.01, acc=np.zeros(3), gyr=np.zeros(3)))
    assert not b.ready()
    b.add_imu(ds.ImuEvent(time=0.03, acc=np.zeros(3), gyr=np.zeros(3)))
    assert b.ready()
    pkt = b.pop()
    assert pkt is not None
    # The 0.03 event stays queued for the next scan.
    assert len(b._events) == 1


def test_time_regression_clears_cache(rng):
    """Monotonicity check clears the affected cache
    (ros_interface.cc:175-182)."""
    cfg = make_cfg()
    b = ds.PacketBuilder(cfg)
    pts = rng.uniform(2, 4, size=(10, 3)).astype(np.float32)
    toff = np.zeros(10, dtype=np.float32)
    b.add_scan(ds.RawScan(begin_time=5.0, end_time=5.02, points=pts, time_offset=toff))
    b.add_scan(ds.RawScan(begin_time=1.0, end_time=1.02, points=pts, time_offset=toff))
    assert len(b._scans) == 1  # regression cleared the earlier scan
    assert b._scans[0].begin_time == 1.0

def test_custom_bucket_quantum(rng):
    """tpu_bucket_quantum_ms=4 puts every bucket on the 4 ms grid and takes
    the numpy path (native library hardcodes the reference's 2 ms)."""
    cfg = make_cfg()
    cfg.tpu.bucket_quantum_ms = 4.0
    b = ds.PacketBuilder(cfg)
    n = 600
    pts = rng.uniform(2, 5, size=(n, 3)).astype(np.float32)
    toff = np.sort(rng.uniform(0, 0.03, n)).astype(np.float32)
    scan = ds.RawScan(begin_time=100.0, end_time=100.03, points=pts, time_offset=toff)
    pkt = b.build_packet(scan, [])
    bt = pkt.bucket_time[pkt.bucket_mask] - pkt.bucket_time[pkt.bucket_mask][0]
    steps = np.diff(np.sort(bt))
    assert (np.abs(steps / 0.004 - np.round(steps / 0.004)) < 1e-6).all()
    # Coarser buckets => at most ceil(30ms/4ms)+1 of them.
    assert pkt.bucket_mask.sum() <= 9


def _scan(t0, rng, n=64):
    pts = rng.uniform(2.0, 5.0, size=(n, 3)).astype(np.float32)
    return ds.RawScan(
        begin_time=t0, end_time=t0 + 0.1, points=pts,
        time_offset=np.linspace(0, 0.1, n, endpoint=False).astype(np.float32),
    )


def test_event_spill_packets_preserve_every_event(rng):
    """A sensor gap queues more pre-scan events than kmax bucket-0 slots:
    pop() must emit event-only packets carrying ALL of them, in order
    (the reference's unbounded MeasGroup deque, KILO.cc:380-390)."""
    cfg = make_cfg(nb=8, pmax=32, kmax=2)
    b = ds.PacketBuilder(cfg)
    # First scan establishes _last_begin.
    for k in range(7):
        b.add_imu(ds.ImuEvent(time=0.02 * k, acc=np.zeros(3), gyr=np.zeros(3)))
    b.add_scan(_scan(0.0, rng))
    b.add_imu(ds.ImuEvent(time=0.14, acc=np.zeros(3), gyr=np.zeros(3)))
    assert b.ready()
    first = b.pop()
    assert first.bucket_mask.any()
    # Gap: no scans for 1 s; 50 events queue, then a scan + closer event.
    times = [0.15 + 0.02 * k for k in range(50)]
    for t in times:
        b.add_imu(ds.ImuEvent(time=t, acc=np.full(3, t), gyr=np.zeros(3)))
    b.add_scan(_scan(1.2, rng))
    b.add_imu(ds.ImuEvent(time=1.35, acc=np.zeros(3), gyr=np.zeros(3)))

    got, kinds = [], []
    while b.ready():
        p = b.pop()
        kinds.append("scan" if p.bucket_mask.any() else "events")
        et = (p.begin_time + p.imu_time)[p.imu_mask]
        got.extend(np.round(et, 6).tolist())
        if kinds[-1] == "scan":
            break
    assert kinds.count("events") >= 3, kinds  # 50 events / (8*2) per packet
    # Every gap event (< scan begin) was delivered, in order — the 50
    # injected ones plus the two leftovers (0.12, 0.14) queued after the
    # first scan's end.
    gap = [t for t in got if t < 1.2]
    assert len(gap) == 52
    assert gap == sorted(gap)
    np.testing.assert_allclose(gap[2:], times, atol=1e-6)


def test_event_spill_at_exactly_kmax_preserves_bucket0_room(rng):
    """n_pre == kmax must ALSO spill: bucket-0's kmax slots have to hold the
    scan's own in-window events, so a backlog that exactly fills them would
    silently drop those (the round-4 advisor finding).  With >= spill
    semantics no event is lost."""
    cfg = make_cfg(nb=8, pmax=32, kmax=2)
    b = ds.PacketBuilder(cfg)
    for k in range(7):
        b.add_imu(ds.ImuEvent(time=0.02 * k, acc=np.zeros(3), gyr=np.zeros(3)))
    b.add_scan(_scan(0.0, rng))
    b.add_imu(ds.ImuEvent(time=0.14, acc=np.zeros(3), gyr=np.zeros(3)))
    assert b.pop() is not None  # establishes _last_begin
    # Exactly kmax=2 pre-scan stragglers (the 0.12/0.14 leftovers), plus a
    # scan whose FIRST bucket starts 10 ms in (early points blind-filtered
    # away), so events in (begin, begin+0.01) belong to bucket 0 as well.
    pts = rng.uniform(2.0, 5.0, size=(64, 3)).astype(np.float32)
    scan = ds.RawScan(
        begin_time=0.2, end_time=0.3, points=pts,
        time_offset=np.linspace(0.01, 0.1, 64, endpoint=False).astype(np.float32),
    )
    b.add_scan(scan)
    in_window = [0.203, 0.207]  # both precede the first bucket => bucket 0
    for t in in_window:
        b.add_imu(ds.ImuEvent(time=t, acc=np.full(3, t), gyr=np.zeros(3)))
    b.add_imu(ds.ImuEvent(time=0.35, acc=np.zeros(3), gyr=np.zeros(3)))
    got, kinds = [], []
    while b.ready():
        p = b.pop()
        kinds.append("scan" if p.bucket_mask.any() else "events")
        et = (p.begin_time + p.imu_time)[p.imu_mask]
        got.extend(np.round(et, 6).tolist())
        assert p.dropped_events == 0, "spill gate must leave bucket-0 room"
        if kinds[-1] == "scan":
            break
    assert kinds[0] == "events", "kmax pre-events must spill, not squeeze"
    # both stragglers AND every in-window event that precedes the last
    # bucket survive (f32 storage: compare with tolerance)
    for t in [0.12, 0.14] + in_window:
        assert any(abs(g - t) < 1e-4 for g in got), f"event {t} was dropped"


def test_stale_scan_rejected(rng):
    cfg = make_cfg()
    b = ds.PacketBuilder(cfg)
    for k in range(9):
        b.add_imu(ds.ImuEvent(time=0.02 * k, acc=np.zeros(3), gyr=np.zeros(3)))
    b.add_scan(_scan(0.0, rng))
    assert b.pop() is not None
    b.add_scan(_scan(-5.0, rng))          # entirely in the emitted past
    assert not b._scans                    # dropped, not queued
