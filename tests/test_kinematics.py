"""Leg kinematics: FK Jacobian consistency, contact Schmitt trigger,
Unitree ordering."""

import numpy as np

from legkilo_tpu.config import KinematicsConfig
from legkilo_tpu.models import unitree


def test_foot_vel_is_fk_derivative(rng):
    """The analytic Jacobian velocity must equal the numeric FK derivative —
    validates caculateFootPosVel's closed forms (kinematics.cc:54-90)."""
    cfg = KinematicsConfig()
    q = rng.uniform(-0.8, 0.8, size=(4, 3))
    dq = rng.normal(size=(4, 3))
    eps = 1e-6
    p0, v = unitree.foot_pos_vel(q, dq, cfg)
    p1, _ = unitree.foot_pos_vel(q + eps * dq, dq, cfg)
    v_num = (p1 - p0) / eps
    np.testing.assert_allclose(v, v_num, atol=1e-4)


def test_fk_nominal_stance():
    """Zero hip/knee angles put feet under the hips at -lt-lc height."""
    cfg = KinematicsConfig()
    q = np.zeros((4, 3))
    p, v = unitree.foot_pos_vel(q, np.zeros((4, 3)), cfg)
    np.testing.assert_allclose(np.abs(p[:, 0]), cfg.leg_offset_x, atol=1e-9)
    np.testing.assert_allclose(
        p[:, 2], -(cfg.leg_thigh_length + cfg.leg_calf_length), atol=1e-9
    )
    np.testing.assert_allclose(v, 0.0, atol=1e-12)


def test_contact_schmitt_trigger():
    det = unitree.ContactDetector(t_on=220.0, t_off=200.0)
    # Starts in contact (kinematics.h:12 default true).
    assert det.update(np.array([210.0, 210, 210, 210])).all()
    # Below t_off: releases.
    c = det.update(np.array([150.0, 210, 210, 210]))
    assert not c[0] and c[1:].all()
    # Between thresholds: stays released (hysteresis).
    c = det.update(np.array([210.0, 210, 210, 210]))
    assert not c[0]
    # Above t_on: re-engages.
    c = det.update(np.array([230.0, 210, 210, 210]))
    assert c[0]


def test_highstate_processing_leg_reorder(rng):
    """Unitree FL,FR,RL,RR force order -> internal FR,FL,RR,RL
    (kinematics.cc:17-20); motor base indices 3,0,9,6 (kinematics.cc:24-33)."""
    cfg = KinematicsConfig()
    kin = unitree.Kinematics(cfg)
    mq = np.arange(20, dtype=np.float64) * 0.01
    mdq = np.arange(20, dtype=np.float64) * 0.1
    hs = unitree.HighState(
        stamp=1.5,
        accelerometer=np.array([0.0, 0.0, 9.8]),
        gyroscope=np.array([0.1, 0.2, 0.3]),
        motor_q=mq,
        motor_dq=mdq,
        foot_force=np.array([100.0, 250.0, 90.0, 240.0]),  # Unitree order
    )
    ev = kin.processing(hs)
    assert ev.time == 1.5
    # Internal FR gets Unitree index 1 force (250 -> contact stays engaged),
    # FL gets index 0 (100 < 200 -> released).
    assert ev.contact[0] and not ev.contact[1]
    assert ev.contact[2] and not ev.contact[3]
    # FK uses motors 3:6 for internal leg 0 (FR).
    p_direct, _ = unitree.foot_pos_vel(
        np.stack([mq[3:6], mq[0:3], mq[9:12], mq[6:9]]),
        np.stack([mdq[3:6], mdq[0:3], mdq[9:12], mdq[6:9]]),
        cfg,
    )
    np.testing.assert_allclose(ev.foot_pos, p_direct)


def test_kin_event_consistency_with_filter_model(rng):
    """Simulated stance feet satisfy v + R(w x p + v_f) = 0 — the measurement
    model the filter applies (KILO.cc:303)."""
    from legkilo_tpu.models import sim

    data = sim.simulate(sim.SimConfig(duration=1.0, scan_points=800, kin_noise=0.0,
                                      acc_noise=0.0, gyr_noise=0.0))
    traj = sim.Trajectory()
    for ev in data.kin[::7]:
        rot, pos, vel, acc, w = traj.derivatives(ev.time)
        for f in range(4):
            if not ev.contact[f]:
                continue
            resid = vel + rot @ (np.cross(w, ev.foot_pos[f]) + ev.foot_vel[f])
            # foot_pos carries 5mm simulated noise; residual stays small.
            assert np.linalg.norm(resid) < 0.02, (ev.time, f, resid)
