"""Distinct-bag fleet replay: per-replica packets through make_fleet_step.

BASELINE.json's north star is *batched bag replays* — replicas advancing
through genuinely different trajectories, not one bag with jittered
parameters.  These tests drive `sweep --distinct` end-to-end and prove the
fleet path is equivalent to replaying each bag individually.
"""

import json

import numpy as np

from legkilo_tpu import cli
from legkilo_tpu.config import Config
from legkilo_tpu.io.tum import read_tum
from legkilo_tpu.models import sim
from legkilo_tpu.runner import run_offline


def test_distinct_fleet_per_replica_ate(tmp_path, capsys):
    rc = cli.main([
        "sweep", "--distinct", "4", "--duration", "2.0",
        "--traj_out", str(tmp_path),
    ])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    report = json.loads(lines[-1])
    assert report["replicas"] == 4
    ates = report["ate_per_replica_m"]
    assert len(ates) == 4
    for name, ate in ates.items():
        assert ate < 0.08, f"{name}: ATE {ate} m"
    # Genuinely different trajectories: final positions must differ between
    # replicas (parameter jitter on one bag would keep them ~identical).
    finals = [read_tum(str(tmp_path / f"sim{r}.tum"))[1][-1] for r in range(4)]
    d01 = np.linalg.norm(finals[0] - finals[1])
    assert d01 > 0.05, f"replica trajectories not distinct ({d01:.3f} m apart)"

    # Fleet replay == individual replay: replica 0's fleet trajectory must
    # match running the same bag through the plain runner.
    traj = sim.Trajectory(speed=0.6, radius=2.0, bob_freq=1.5)
    data = sim.simulate(sim.SimConfig(duration=2.0, seed=100), traj=traj)
    cfg = Config()
    cfg.only_imu_use = True
    cfg.lidar.filter_num = 1
    cfg.lidar.blind = 0.3
    res = run_offline(cfg, data.scans, data.imu)
    t_fleet, p_fleet, _ = read_tum(str(tmp_path / "sim0.tum"))
    by_time = {round(r.time, 6): r.pos for r in res}
    n_matched = 0
    for t, p in zip(t_fleet, p_fleet):
        key = round(float(t), 6)
        if key in by_time:
            # vmapped vs single execution differ by XLA reduction order
            # only — sub-mm; 2 mm bound.
            np.testing.assert_allclose(p, by_time[key], atol=2e-3)
            n_matched += 1
    assert n_matched >= len(t_fleet) - 1


def test_sweep_bags_directory(tmp_path, capsys):
    """`sweep --bags <dir>`: one replica per .bag file, batched replay."""
    import test_rosbag as baggen

    bag_dir = tmp_path / "bags"
    bag_dir.mkdir()
    for r in range(2):
        traj = sim.Trajectory(speed=0.6 + 0.2 * r, radius=2.0 + 0.5 * r)
        data = sim.simulate(
            sim.SimConfig(duration=2.0, scan_points=2000, seed=30 + r),
            traj=traj,
        )
        msgs = []
        for ev in data.imu:
            raw = baggen.serialize_imu(ev.time + 1000.0, ev.acc, ev.gyr)
            msgs.append(("/imu_raw", "sensor_msgs/Imu", ev.time + 1000.0, raw))
        for scan in data.scans:
            raw = baggen.serialize_pointcloud2(
                scan.begin_time + 1000.0, scan.points, scan.time_offset
            )
            msgs.append(("/points_raw", "sensor_msgs/PointCloud2",
                         scan.begin_time + 1000.0, raw))
        msgs.sort(key=lambda m: m[2])
        baggen.write_bag(str(bag_dir / f"run{r}.bag"), msgs)

    out_dir = tmp_path / "tum"
    rc = cli.main([
        "sweep", "--bags", str(bag_dir), "--traj_out", str(out_dir),
    ])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    report = json.loads(lines[-1])
    assert report["replicas"] == 2
    assert report["mean_matched"] > 0
    t0, p0, _ = read_tum(str(out_dir / "run0.bag.tum"))
    t1, p1, _ = read_tum(str(out_dir / "run1.bag.tum"))
    assert len(p0) == len(p1) == report["scans"]
    assert np.linalg.norm(p0[-1] - p1[-1]) > 0.05  # distinct trajectories
