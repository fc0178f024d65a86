"""Close the shared-sensor-model loophole (round-3 missing #2).

The repo pipelines AND the float64 emulator both consume models/sim.py,
so a common-mode error in its measurement conventions (e.g. the
acc_norm/g scaling of KILO.cc:248, the foot-velocity constraint of
KILO.cc:292-309) could fool the parity study.  These tests check the
simulator's raw streams against closed-form kinematics written HERE,
from first principles — and add a second, independently-written stream
generator for one short scenario, fed through the real filter.

Reference measurement models being pinned:
  raw_acc = (acc_norm/g) (R^T (a_w - grav) + ba) + noise   KILO.cc:248
  raw_gyr = w_body + bw + noise                            KILO.cc:249
  0 = v_w + R (w x p_foot + v_foot)  for stance feet       KILO.cc:292-309
"""

import numpy as np
import pytest

from legkilo_tpu.models import sim


G = 9.81
V, RAD = 0.8, 2.5
T0, RAMP = 0.5, 1.0


def clean_cfg(**kw):
    return sim.SimConfig(
        acc_noise=0.0, gyr_noise=0.0, lidar_range_noise=0.0, kin_noise=0.0,
        acc_bias=(0.0, 0.0, 0.0), gyr_bias=(0.0, 0.0, 0.0), seed=1, **kw
    )


def closed_form_state(t):
    """Steady-state circle kinematics, derived independently of
    Trajectory: for t past the ramp, s = V (t - T0 - RAMP/2)."""
    s = V * (t - T0 - RAMP / 2.0)
    a = s / RAD
    pos = np.array([RAD * np.sin(a), RAD * (1 - np.cos(a)), 0.35])
    c, sn = np.cos(a), np.sin(a)
    rot = np.array([[c, -sn, 0.0], [sn, c, 0.0], [0.0, 0.0, 1.0]])
    vel = V * np.array([c, sn, 0.0])
    acc_w = (V * V / RAD) * np.array([-sn, c, 0.0])   # centripetal
    w_body = np.array([0.0, 0.0, V / RAD])
    return rot, pos, vel, acc_w, w_body


@pytest.fixture(scope="module")
def circle_data():
    traj = sim.Trajectory(speed=V, radius=RAD, bob=0.0)
    return sim.simulate(clean_cfg(duration=6.0, scan_points=2000), traj=traj)


def test_imu_stream_matches_closed_form(circle_data):
    """raw_gyr = w_body; raw_acc = R^T(a_w - grav) at zero noise/bias and
    acc_norm = g.  Closed form: gyr (0,0,V/R); acc (0, V^2/R, g)."""
    checked = 0
    for ev in circle_data.imu:
        if not (2.0 <= ev.time <= 5.5):
            continue
        np.testing.assert_allclose(
            ev.gyr, [0.0, 0.0, V / RAD], atol=2e-4,
            err_msg=f"gyr at t={ev.time}"
        )
        np.testing.assert_allclose(
            ev.acc, [0.0, V * V / RAD, G], atol=5e-4,
            err_msg=f"acc at t={ev.time}"
        )
        checked += 1
    assert checked > 100


def test_kin_stream_satisfies_contact_constraint(circle_data):
    """0 = v_w + R (w x p_foot + v_foot) with v_w, R, w from the CLOSED
    FORM, not from the simulator's own derivatives."""
    checked = 0
    for ev in circle_data.kin:
        if not (2.0 <= ev.time <= 5.5):
            continue
        rot, _, vel, _, w = closed_form_state(ev.time)
        for leg in range(4):
            resid = vel + rot @ (
                np.cross(w, ev.foot_pos[leg]) + ev.foot_vel[leg]
            )
            assert np.linalg.norm(resid) < 2e-3, (
                f"foot {leg} at t={ev.time}: |resid|={np.linalg.norm(resid)}"
            )
        checked += 1
    assert checked > 100


def test_lidar_points_lie_on_world_planes(circle_data):
    """Each (noise-free) scan point, transformed with the closed-form pose
    at its own per-point timestamp, lies on a wall of the box world."""
    planes = sim.box_world()
    scan = circle_data.scans[30]                       # t = 3.0 s, steady
    ext_t = np.array([0.0, 0.0, 0.2])
    checked = 0
    for i in range(0, len(scan.points), 37):
        t = scan.begin_time + float(scan.time_offset[i])
        rot, pos, _, _, _ = closed_form_state(t)
        p_w = rot @ (ext_t + scan.points[i]) + pos
        d = min(abs(np.dot(p_w - pl.point, pl.normal)) for pl in planes)
        assert d < 2e-3, f"point {i} off-plane by {d}"
        checked += 1
    assert checked > 40


# --- second, independently-written generator ------------------------------

def _independent_straight_line(duration=4.0, speed=0.5):
    """A from-scratch stream generator (no models/sim.py code paths):
    straight-line walk along +x in a box room, ramped velocity, IMU and
    ray-cast LiDAR written independently."""
    from legkilo_tpu.io.dataset import ImuEvent, RawScan

    z0 = 0.4
    t_ramp0, t_ramp1 = 1.0, 2.0

    def vx(t):
        return speed * np.clip((t - t_ramp0) / (t_ramp1 - t_ramp0), 0.0, 1.0)

    def ax(t):
        return (speed / (t_ramp1 - t_ramp0)
                if t_ramp0 < t < t_ramp1 else 0.0)

    def px(t):
        u = np.clip((t - t_ramp0) / (t_ramp1 - t_ramp0), 0.0, 1.0)
        s = speed * (t_ramp1 - t_ramp0) * 0.5 * u * u
        return s + speed * max(0.0, t - t_ramp1)

    planes = [  # (point, normal), interior-facing
        (np.array([0.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0])),
        (np.array([0.0, 0.0, 2.5]), np.array([0.0, 0.0, -1.0])),
        (np.array([5.0, 0.0, 0.0]), np.array([-1.0, 0.0, 0.0])),
        (np.array([-3.0, 0.0, 0.0]), np.array([1.0, 0.0, 0.0])),
        (np.array([0.0, 3.0, 0.0]), np.array([0.0, -1.0, 0.0])),
        (np.array([0.0, -3.0, 0.0]), np.array([0.0, 1.0, 0.0])),
    ]
    ext_t = np.array([0.0, 0.0, 0.2])

    imu = [
        ImuEvent(
            time=k * 0.02,
            acc=np.array([ax(k * 0.02), 0.0, G]),
            gyr=np.zeros(3),
        )
        for k in range(int(duration / 0.02) + 2)
    ]

    az = np.linspace(0, 2 * np.pi, 60, endpoint=False)
    el = np.deg2rad(np.linspace(-14, 14, 8))
    dirs = np.stack([
        np.array([np.cos(e) * np.cos(a), np.cos(e) * np.sin(a), np.sin(e)])
        for e in el for a in az
    ])
    n_rays = len(dirs)
    scans = []
    for si in range(int(duration / 0.1)):
        tb = si * 0.1
        toff = np.linspace(0.0, 0.1, n_rays, endpoint=False)
        pts, offs = [], []
        for d, u in zip(dirs, toff):
            origin = np.array([px(tb + u), 0.0, z0]) + ext_t
            best = np.inf
            for p0, n in planes:
                dn = d @ n
                if dn < -1e-9:
                    tt = (p0 - origin) @ n / dn
                    if 0.1 < tt < best:
                        best = tt
            if best < 25.0:
                pts.append(d * best)
                offs.append(u)
        scans.append(RawScan(
            begin_time=tb, end_time=tb + 0.1,
            points=np.asarray(pts, np.float32),
            time_offset=np.asarray(offs, np.float32),
        ))
    gt = [(s.end_time, np.array([px(s.end_time), 0.0, z0])) for s in scans]
    return scans, imu, gt


def test_filter_tracks_independent_generator():
    """The full filter on streams from the second generator: if
    models/sim.py had a convention error that core/ happened to share,
    this independently-written scenario would expose it."""
    from legkilo_tpu.config import Config
    from legkilo_tpu.runner import run_offline

    scans, imu, gt = _independent_straight_line()
    cfg = Config()
    cfg.only_imu_use = True
    cfg.lidar.filter_num = 1
    cfg.lidar.blind = 0.3
    cfg.lidar.voxel_grid_resolution = 0.3
    cfg.voxel_map.capacity_log2 = 13
    cfg.voxel_map.max_layer = 1
    cfg.tpu.max_buckets = 56
    cfg.tpu.max_points_per_bucket = 96
    cfg.tpu.max_imu_per_bucket = 3
    res = run_offline(cfg, scans, imu)
    gtm = {round(t, 6): p for t, p in gt}
    errs = [
        np.linalg.norm(r.pos - (gtm[round(r.time, 6)] - gt[0][1]))
        for r in res if round(r.time, 6) in gtm
    ]
    assert len(errs) > 20
    assert np.sqrt(np.mean(np.array(errs) ** 2)) < 0.05, (
        f"independent-generator ATE {np.sqrt(np.mean(np.array(errs)**2)):.3f}"
    )
