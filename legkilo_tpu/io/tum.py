"""TUM-format trajectory writer + ATE/RPE evaluation helpers.

Parity: TrajectorySaver (/root/reference/legkilo/src/common/trajectory_saver.hpp:43-50)
writes ``time x y z qx qy qz qw`` lines for offline evaluation with evo-style
tools; we additionally ship the ATE computation itself (the reference relies
on external tools — SURVEY.md §4.2).
"""

from __future__ import annotations

import os
import time as _time
from typing import Optional, Tuple

import numpy as np


def quat_xyzw_from_rot(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), numpy, batched."""
    R = np.asarray(R, dtype=np.float64)
    w = np.sqrt(np.maximum(1.0 + R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2], 0.0)) / 2
    w = np.maximum(w, 1e-12)
    x = (R[..., 2, 1] - R[..., 1, 2]) / (4 * w)
    y = (R[..., 0, 2] - R[..., 2, 0]) / (4 * w)
    z = (R[..., 1, 0] - R[..., 0, 1]) / (4 * w)
    return np.stack([x, y, z, w], axis=-1)


class TrajectoryWriter:
    """Streaming TUM writer (trajectory_saver.hpp analog)."""

    def __init__(self, path: Optional[str] = None, directory: str = "result/traj"):
        if path is None:
            os.makedirs(directory, exist_ok=True)
            stamp = _time.strftime("%Y%m%d_%H%M%S")
            path = os.path.join(directory, f"traj_{stamp}.txt")
        self.path = path
        self._f = open(path, "w")

    def write(self, t: float, rot: np.ndarray, pos: np.ndarray) -> None:
        q = quat_xyzw_from_rot(np.asarray(rot))
        p = np.asarray(pos, dtype=np.float64)
        self._f.write(
            f"{t:.9f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
            f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n"
        )

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_tum(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Read a TUM file -> (times [N], pos [N,3], quat_xyzw [N,4])."""
    data = np.loadtxt(path, comments="#").reshape(-1, 8)
    return data[:, 0], data[:, 1:4], data[:, 4:8]


def umeyama_align(src: np.ndarray, dst: np.ndarray, with_scale: bool = False):
    """SE(3) (optionally Sim(3)) alignment of src onto dst (Umeyama)."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    xs, xd = src - mu_s, dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    s = (D * S.diagonal()).sum() / (xs**2).sum() * len(src) if with_scale else 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(
    est_pos: np.ndarray, gt_pos: np.ndarray, align: bool = True
) -> float:
    """Absolute trajectory error (RMSE) after optional SE(3) alignment."""
    est, gt = np.asarray(est_pos, np.float64), np.asarray(gt_pos, np.float64)
    if align:
        s, R, t = umeyama_align(est, gt)
        est = (s * (R @ est.T)).T + t
    return float(np.sqrt(np.mean(np.sum((est - gt) ** 2, axis=-1))))


def associate(
    t_a: np.ndarray, t_b: np.ndarray, max_dt: float = 0.02
) -> Tuple[np.ndarray, np.ndarray]:
    """Nearest-timestamp association of two trajectories."""
    idx_b = np.searchsorted(t_b, t_a)
    idx_b = np.clip(idx_b, 1, len(t_b) - 1)
    left, right = t_b[idx_b - 1], t_b[idx_b]
    choose_left = (t_a - left) < (right - t_a)
    nearest = np.where(choose_left, idx_b - 1, idx_b)
    ok = np.abs(t_b[nearest] - t_a) <= max_dt
    return np.nonzero(ok)[0], nearest[ok]
