"""Full bag-replay integration: synthetic world -> ROS1 bag bytes -> CLI
pipeline (reader -> decode -> redundancy filter -> packetize -> filter ->
TUM) -> ATE vs ground truth.

This is the closest hermetic equivalent of the reference's dataset-replay
validation (SURVEY.md §4.1) — the entire L4->L0 stack runs, just without a
physical robot.
"""

import numpy as np
import pytest

from legkilo_tpu import cli
from legkilo_tpu.config import Config
from legkilo_tpu.io.tum import ate_rmse, read_tum
from legkilo_tpu.models import sim
import test_rosbag as baggen


@pytest.fixture(scope="module")
def bag_path(tmp_path_factory):
    data = sim.simulate(sim.SimConfig(duration=3.0, scan_points=2500, seed=5))
    msgs = []
    for ev in data.imu:
        raw = baggen.serialize_imu(ev.time + 1000.0, ev.acc, ev.gyr)
        msgs.append(("/points_imu_test", None, 0, None))  # placeholder
        msgs[-1] = ("/imu_raw", "sensor_msgs/Imu", ev.time + 1000.0, raw)
    for scan in data.scans:
        raw = baggen.serialize_pointcloud2(
            scan.begin_time + 1000.0, scan.points, scan.time_offset
        )
        msgs.append(("/points_raw", "sensor_msgs/PointCloud2",
                     scan.begin_time + 1000.0, raw))
    msgs.sort(key=lambda m: m[2])
    path = tmp_path_factory.mktemp("bags") / "sim.bag"
    baggen.write_bag(str(path), msgs)
    return str(path), data


def test_cli_run_bag_to_trajectory(bag_path, tmp_path):
    path, data = bag_path
    traj = tmp_path / "traj.txt"
    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(
        "only_imu_use: true\nredundancy: false\nfilter_num: 1\nblind: 0.3\n"
        "voxel_grid_resolution: 0.4\ntpu_map_capacity_log2: 13\n"
        "tpu_max_buckets: 56\ntpu_max_points_per_bucket: 96\n"
        "tpu_max_imu_per_bucket: 3\n"
    )
    rc = cli.main([
        "run", "--config_file", str(cfg_file), "--bag", path,
        "--traj_out", str(traj),
        "--export_planes", str(tmp_path / "planes.ply"),
    ])
    assert rc == 0
    t, p, q = read_tum(str(traj))
    assert len(t) >= 25

    # The bag path derives scan end times from the last point stamp
    # (lidar_processing.cc:34-35), so associate by nearest time.
    from legkilo_tpu.io.tum import associate

    _, gt_pos_f = data.gt_in_filter_frame()
    ia, ib = associate(t, data.gt_times + 1000.0, max_dt=0.01)
    assert len(ia) >= 20
    err = ate_rmse(p[ia], gt_pos_f[ib], align=False)
    assert err < 0.08, f"bag-replay ATE {err:.3f} m"

    ply = (tmp_path / "planes.ply").read_text()
    assert ply.startswith("ply")
    assert int(
        [l for l in ply.splitlines() if l.startswith("element vertex")][0].split()[-1]
    ) > 100
