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


def test_cli_run_kin_bag_to_trajectory(tmp_path):
    """Leg-fusion end-to-end from bag bytes: sim kin streams -> leg IK ->
    HighState messages -> CLI run (HighState decode -> Schmitt contact ->
    FK -> packetize -> 18-row kin update) -> TUM -> ATE.

    The IK here is a test-local Newton solve against models/unitree's FK
    and analytic Jacobian, so the round trip (IK -> serialize -> decode ->
    FK) also cross-checks the Jacobian.
    """
    from legkilo_tpu.config import KinematicsConfig
    from legkilo_tpu.models import unitree as ut

    kcfg = KinematicsConfig()

    def leg_jacobian(q, leg):
        lc, lt, d = (kcfg.leg_calf_length, kcfg.leg_thigh_length,
                     kcfg.leg_thigh_offset)
        lf = ut._LFOOT[leg]
        s1, s2 = np.sin(q[0]), np.sin(q[1])
        s23, c1 = np.sin(q[1] + q[2]), np.cos(q[0])
        c2, c23 = np.cos(q[1]), np.cos(q[1] + q[2])
        return np.array([
            [0.0, -lc * c23 - lt * c2, -lc * c23],
            [lt * c1 * c2 - lf * d * s1 + lc * c1 * c23,
             -s1 * (lc * s23 + lt * s2), -lc * s23 * s1],
            [lt * c2 * s1 + lf * d * c1 + lc * s1 * c23,
             c1 * (lc * s23 + lt * s2), lc * s23 * c1],
        ])

    def fk_all(q_all):
        fp, _ = ut.foot_pos_vel(q_all[None], np.zeros((1, 4, 3)), kcfg)
        return fp[0]                                     # [4, 3]

    def ik_all(targets, q0_all):
        q = np.array(q0_all, dtype=float)                # [4, 3]
        for _ in range(12):
            r = targets - fk_all(q)                      # [4, 3]
            if np.abs(r).max() < 1e-10:
                break
            for leg in range(4):
                q[leg] = q[leg] + np.linalg.solve(
                    leg_jacobian(q[leg], leg), r[leg]
                )
        return q

    data = sim.simulate(sim.SimConfig(duration=3.0, scan_points=2500, seed=6))
    msgs = []
    last_q = np.tile(np.array([0.0, 0.8, -1.6]), (4, 1))
    t_on = kcfg.contact_force_threshold_up
    for ev in data.kin:
        motor_q = np.zeros(20)
        motor_dq = np.zeros(20)
        force_u = np.zeros(4, dtype=int)
        q_all = ik_all(ev.foot_pos, last_q)
        assert np.abs(fk_all(q_all) - ev.foot_pos).max() < 1e-8, "IK diverged"
        last_q = q_all
        for leg in range(4):
            dq = np.linalg.solve(leg_jacobian(q_all[leg], leg),
                                 ev.foot_vel[leg])
            base = ut._MOTOR_BASE[leg]
            motor_q[base:base + 3] = q_all[leg]
            motor_dq[base:base + 3] = dq
            force_u[ut._FORCE_INDEX[leg]] = int(2 * t_on) if ev.contact[leg] else 0
        raw = baggen.serialize_high_state(
            ev.time + 1000.0, ev.acc, ev.gyr, motor_q, motor_dq, force_u
        )
        msgs.append(("/high_state", "unitree_legged_msgs/HighState",
                     ev.time + 1000.0, raw))
    for scan in data.scans:
        raw = baggen.serialize_pointcloud2(
            scan.begin_time + 1000.0, scan.points, scan.time_offset
        )
        msgs.append(("/points_raw", "sensor_msgs/PointCloud2",
                     scan.begin_time + 1000.0, raw))
    msgs.sort(key=lambda m: m[2])
    path = tmp_path / "kin.bag"
    baggen.write_bag(str(path), msgs)

    traj = tmp_path / "traj.txt"
    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(
        "only_imu_use: false\nredundancy: false\nfilter_num: 1\nblind: 0.3\n"
        "voxel_grid_resolution: 0.4\ntpu_map_capacity_log2: 13\n"
        "tpu_max_buckets: 56\ntpu_max_points_per_bucket: 96\n"
        "tpu_max_imu_per_bucket: 3\n"
    )
    rc = cli.main([
        "run", "--config_file", str(cfg_file), "--bag", str(path),
        "--traj_out", str(traj),
    ])
    assert rc == 0
    t, p, q = read_tum(str(traj))
    assert len(t) >= 25
    _, gt_pos_f = data.gt_in_filter_frame()
    gtm = {round(tt + 1000.0, 5): i for i, tt in enumerate(data.gt_times)}
    errs = []
    for i, tt in enumerate(t):
        gi = gtm.get(round(float(tt), 5))
        if gi is not None:
            errs.append(np.linalg.norm(p[i] - gt_pos_f[gi]))
    if len(errs) < 10:   # end-times derived from last point stamp: nearest
        gt_t = data.gt_times + 1000.0
        idx = np.argmin(np.abs(gt_t[None, :] - np.asarray(t)[:, None]), axis=1)
        errs = [np.linalg.norm(p[i] - gt_pos_f[j]) for i, j in enumerate(idx)]
    ate = float(np.sqrt(np.mean(np.array(errs) ** 2)))
    assert ate < 0.12, f"kin bag e2e ATE {ate:.3f} m"
