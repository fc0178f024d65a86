"""Native scanprep library vs the NumPy reference implementation."""

import subprocess

import numpy as np
import pytest

from legkilo_tpu.config import Config
from legkilo_tpu.io import dataset as ds, native


def _ensure_built():
    if not native.available():
        subprocess.run(["make", "-C", "native"], check=True, capture_output=True)
        native._TRIED = False  # re-probe
    return native.available()


@pytest.mark.skipif(not _ensure_built(), reason="native lib unavailable")
def test_native_matches_numpy_pipeline(rng):
    cfg = Config()
    cfg.lidar.filter_num = 2
    cfg.lidar.blind = 1.0
    cfg.lidar.voxel_grid_resolution = 0.4
    cfg.tpu.max_buckets = 32
    cfg.tpu.max_points_per_bucket = 256

    n = 3000
    pts = rng.uniform(-6, 6, size=(n, 3)).astype(np.float32)
    toff = np.sort(rng.uniform(0, 0.05, n)).astype(np.float32)

    inten = rng.uniform(0, 255, n).astype(np.float32)
    out = native.process_scan(
        pts, toff, cfg.lidar.filter_num, cfg.lidar.blind,
        cfg.lidar.voxel_grid_resolution, True,
        cfg.tpu.max_buckets, cfg.tpu.max_points_per_bucket, intensity=inten,
    )
    assert out is not None
    bt_n, bm_n, p_n, pm_n, ndown_n, dropped_n, int_n = out

    # NumPy reference path.
    p2, t2, i2 = ds.decimate_blind(
        pts, toff, cfg.lidar.filter_num, cfg.lidar.blind, intensity=inten
    )
    t2 = ds.quantize_times(t2)
    p2, t2, i2 = ds.voxel_downsample(p2, t2, cfg.lidar.voxel_grid_resolution, i2)
    t2 = ds.quantize_times(t2)

    assert ndown_n == len(p2)
    # Same bucket times.
    uniq = np.unique(t2)
    nb = min(len(uniq), cfg.tpu.max_buckets)
    np.testing.assert_allclose(bt_n[:nb], uniq[:nb], atol=1e-7)
    assert bm_n[:nb].all()
    # Same per-bucket point SET (order within a bucket may differ:
    # hash-map iteration vs stable sort).
    for i in range(nb):
        ours = np.sort(p_n[i][pm_n[i]], axis=0)
        ref = np.sort(p2[t2 == uniq[i]][: cfg.tpu.max_points_per_bucket], axis=0)
        assert len(ours) == len(ref), f"bucket {i}: {len(ours)} vs {len(ref)}"
        np.testing.assert_allclose(ours, ref, atol=1e-5)
        # Intensity is carried and centroid-averaged identically.
        np.testing.assert_allclose(
            np.sort(int_n[i][pm_n[i]]),
            np.sort(i2[t2 == uniq[i]][: cfg.tpu.max_points_per_bucket]),
            atol=1e-4,
        )
    # Total point count matches (modulo identical overflow counting).
    assert pm_n.sum() + dropped_n == len(p2)


@pytest.mark.skipif(not _ensure_built(), reason="native lib unavailable")
def test_native_decimate_blind(rng):
    pts = rng.uniform(-5, 5, size=(500, 3)).astype(np.float32)
    out_native = native.decimate_blind(pts, 3, 1.5)
    out_np, _, _ = ds.decimate_blind(pts, np.zeros(500, np.float32), 3, 1.5)
    np.testing.assert_allclose(out_native, out_np, atol=1e-7)


@pytest.mark.skipif(not _ensure_built(), reason="native lib unavailable")
def test_packet_builder_uses_native(rng):
    """End-to-end PacketBuilder equality: native on vs off."""
    base = dict(
        filter_num=1, blind=0.5, resolution=0.4,
    )
    cfgs = []
    for use_native in (True, False):
        cfg = Config()
        cfg.lidar.filter_num = base["filter_num"]
        cfg.lidar.blind = base["blind"]
        cfg.lidar.voxel_grid_resolution = base["resolution"]
        cfg.tpu.max_buckets = 20
        cfg.tpu.max_points_per_bucket = 192
        cfg.tpu.use_native = use_native
        cfgs.append(cfg)

    n = 1200
    pts = rng.uniform(1, 5, size=(n, 3)).astype(np.float32)
    toff = np.sort(rng.uniform(0, 0.03, n)).astype(np.float32)
    scan = ds.RawScan(begin_time=7.0, end_time=7.03, points=pts, time_offset=toff)
    ev = [ds.ImuEvent(time=7.001, acc=np.ones(3), gyr=np.zeros(3))]

    pkt_a = ds.PacketBuilder(cfgs[0]).build_packet(scan, ev)
    pkt_b = ds.PacketBuilder(cfgs[1]).build_packet(scan, ev)
    np.testing.assert_allclose(pkt_a.bucket_time, pkt_b.bucket_time, atol=1e-7)
    np.testing.assert_array_equal(pkt_a.bucket_mask, pkt_b.bucket_mask)
    np.testing.assert_array_equal(pkt_a.point_mask.sum(1), pkt_b.point_mask.sum(1))
    np.testing.assert_array_equal(pkt_a.imu_mask, pkt_b.imu_mask)
    # Bucket contents equal as sets.
    for i in range(20):
        a = np.sort(pkt_a.points[i][pkt_a.point_mask[i]], axis=0)
        b = np.sort(pkt_b.points[i][pkt_b.point_mask[i]], axis=0)
        np.testing.assert_allclose(a, b, atol=1e-5)
