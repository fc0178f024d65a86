"""NumPy float64 oracles implementing the reference ESKF algebra literally.

These re-derive, in plain NumPy, the exact formulas of
/root/reference/legkilo/src/core/slam/eskf.cc (predict, the three updates)
and voxel_map.cc (plane fit with 6x6 plane covariance) so the f32 JAX
implementations can be validated against double-precision ground truth.
"""

from __future__ import annotations

import numpy as np

DIM = 30


def skew(v):
    return np.array(
        [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], dtype=np.float64
    )


def exp_so3(w):
    t = np.linalg.norm(w)
    K = skew(w)
    if t < 1e-12:
        return np.eye(3) + K
    return np.eye(3) + np.sin(t) / t * K + (1 - np.cos(t)) / t**2 * (K @ K)


def log_so3(R):
    tr = np.trace(R)
    theta = np.arccos(np.clip((tr - 1) / 2, -1, 1))
    ax = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    if theta < 1e-12:
        return 0.5 * ax
    return theta / (2 * np.sin(theta)) * ax


class OracleState:
    """Mirror of the reference State struct (eskf.cc:5-45)."""

    def __init__(self):
        self.rot = np.eye(3)
        self.pos = np.zeros(3)
        self.vel = np.zeros(3)
        self.ba = np.zeros(3)
        self.bw = np.zeros(3)
        self.grav = np.array([0.0, 0.0, -9.81])
        self.imu_a = np.zeros(3)
        self.imu_w = np.zeros(3)
        self.bv = np.zeros(3)
        self.contact = np.zeros(3)

    _ORDER = ["pos", "vel", "ba", "bw", "grav", "imu_a", "imu_w", "bv", "contact"]

    def boxplus(self, delta):
        self.rot = self.rot @ exp_so3(delta[0:3])
        for i, name in enumerate(self._ORDER):
            setattr(self, name, getattr(self, name) + delta[3 + 3 * i : 6 + 3 * i])

    def boxminus(self, other):
        delta = np.zeros(DIM)
        delta[0:3] = log_so3(other.rot.T @ self.rot)
        for i, name in enumerate(self._ORDER):
            delta[3 + 3 * i : 6 + 3 * i] = getattr(self, name) - getattr(other, name)
        return delta

    def copy(self):
        s = OracleState()
        s.rot = self.rot.copy()
        for name in self._ORDER:
            setattr(s, name, getattr(self, name).copy())
        return s


def function_f(s: OracleState, dt: float):
    vec = np.zeros(DIM)
    vec[0:3] = dt * s.imu_w
    vec[3:6] = dt * s.vel
    vec[6:9] = dt * (s.rot @ s.imu_a + s.grav)
    return vec


def fx(s: OracleState, dt: float):
    F = np.eye(DIM)
    F[0:3, 0:3] = exp_so3(-dt * s.imu_w)
    F[0:3, 21:24] = dt * np.eye(3)
    F[3:6, 6:9] = dt * np.eye(3)
    F[6:9, 0:3] = -dt * s.rot @ skew(s.imu_a)
    F[6:9, 15:18] = dt * np.eye(3)
    F[6:9, 18:21] = dt * s.rot
    return F


def predict(s: OracleState, cov, q_diag, dt, prop_state=True, prop_cov=True):
    """eskf.cc:83-89."""
    new_cov = cov
    if prop_cov:
        F = fx(s, dt)
        new_cov = F @ cov @ F.T + dt * dt * np.diag(q_diag)
    if prop_state:
        s.boxplus(function_f(s, dt))
    return new_cov


def update_by_points(s: OracleState, cov, h6, z, r):
    """eskf.cc:91-123 (N-row branch; jitter folded into r like the jax impl)."""
    n = h6.shape[0]
    r = r + 1e-4
    pht = cov[:, 0:6] @ h6.T  # [30, N]
    hpht = h6 @ pht[0:6, :]  # [N, N]
    hpht_r = hpht + np.diag(r)
    K = pht @ np.linalg.inv(hpht_r)
    dx = K @ z
    s.boxplus(dx)
    new_cov = cov - K @ h6 @ cov[0:6, :]
    return new_cov


def update_by_imu(s: OracleState, cov, z6, r6):
    """eskf.cc:125-135."""
    pht = cov[:, 9:15] + cov[:, 18:24]
    hp = cov[9:15, :] + cov[18:24, :]
    hpht = pht[9:15, :] + pht[18:24, :]
    hpht = hpht + np.diag(r6)
    K = pht @ np.linalg.inv(hpht)
    s.boxplus(K @ z6)
    return cov - K @ hp


def update_by_kin_imu(s: OracleState, cov, h, z, r):
    """eskf.cc:137-145 (dense)."""
    pht = cov @ h.T
    hpht = h @ pht + np.diag(r)
    K = pht @ np.linalg.inv(hpht)
    s.boxplus(K @ z)
    return cov - K @ h @ cov


def build_kin_obs(s: OracleState, acc, gyr, foot_pos, foot_vel, contact, cfg, g_over_an):
    """KILO.cc:273-309 — dynamic-row observation assembly."""
    ncontact = int(np.sum(contact))
    rows = 6 + 3 * ncontact
    h = np.zeros((rows, DIM))
    z = np.zeros(rows)
    r = np.zeros(rows)
    h[0:3, 9:12] = np.eye(3)
    h[0:3, 18:21] = np.eye(3)
    h[3:6, 12:15] = np.eye(3)
    h[3:6, 21:24] = np.eye(3)
    z[0:3] = g_over_an * acc - s.imu_a - s.ba
    z[3:6] = gyr - s.imu_w - s.bw
    r[0:6] = [
        cfg.imu_acc_meas_noise,
        cfg.imu_acc_meas_noise,
        cfg.imu_acc_z_meas_noise,
        cfg.imu_gyr_meas_noise,
        cfg.imu_gyr_meas_noise,
        cfg.imu_gyr_meas_noise,
    ]
    w_skew = skew(s.imu_w)
    idx = 0
    for i in range(4):
        if not contact[i]:
            continue
        p, v = foot_pos[i], foot_vel[i]
        wxp_v = w_skew @ p + v
        rr = slice(6 + 3 * idx, 9 + 3 * idx)
        h[rr, 0:3] = -s.rot @ skew(wxp_v)
        h[rr, 6:9] = np.eye(3)
        h[rr, 21:24] = -s.rot @ skew(p)
        z[rr] = -s.vel - s.rot @ wxp_v
        r[rr] = cfg.kin_meas_noise
        idx += 1
    return h, z, r


def calc_body_cov(pb, range_inc, degree_inc):
    """voxel_map.cc:22-40."""
    pb = pb.copy()
    if pb[2] == 0:
        pb[2] = 0.0001
    rng = np.linalg.norm(pb)
    range_var = range_inc**2
    tangent_var = np.sin(np.deg2rad(degree_inc)) ** 2
    direction = pb / rng
    dhat = skew(direction)
    base1 = np.array([1.0, 1.0, -(direction[0] + direction[1]) / direction[2]])
    base1 /= np.linalg.norm(base1)
    base2 = np.cross(base1, direction)
    base2 /= np.linalg.norm(base2)
    N = np.stack([base1, base2], axis=1)
    A = rng * dhat @ N
    return (
        np.outer(direction, direction) * range_var
        + A @ (tangent_var * np.eye(2)) @ A.T
    )


def plane_fit(points_w, point_vars, planer_threshold):
    """init_plane (voxel_map.cc:42-117): eigen fit + 6x6 plane covariance.

    Returns dict with center, normal, d, radius, eigenvalues, plane_var,
    is_plane.
    """
    pts = np.asarray(points_w)
    n = len(pts)
    center = pts.mean(axis=0)
    cov = pts.T @ pts / n - np.outer(center, center)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    i_min, i_mid, i_max = 0, 1, 2
    plane_var = np.zeros((6, 6))
    is_plane = evals[i_min] < planer_threshold
    if is_plane:
        J_Q = np.eye(3) / n
        for i in range(n):
            F = np.zeros((3, 3))
            for m in range(3):
                if m == i_min:
                    continue
                fm = (
                    (pts[i] - center).T
                    / (n * (evals[i_min] - evals[m]))
                    @ (
                        np.outer(evecs[:, m], evecs[:, i_min])
                        + np.outer(evecs[:, i_min], evecs[:, m])
                    )
                )
                F[m, :] = fm
            J = np.zeros((6, 3))
            J[0:3, :] = evecs @ F
            J[3:6, :] = J_Q
            plane_var += J @ point_vars[i] @ J.T
    normal = evecs[:, i_min]
    d = -normal @ center
    return dict(
        center=center,
        normal=normal,
        d=d,
        radius=np.sqrt(evals[i_max]),
        evals=evals,
        plane_var=plane_var,
        is_plane=is_plane,
    )
