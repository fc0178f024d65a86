"""Float64 reference-semantics emulator of Leg-KILO 2.0.

A NumPy re-implementation of the *reference's own algorithm* — pointer
octrees with subdivision-and-replay, the recursive residual search with the
reference's (unit-mixed) neighbor retry, per-bucket map insertion, and the
N x N-innovation point update — so trajectory-level parity of the TPU
framework can be quantified against the reference's semantics without the
(unavailable) dataset bags or a ROS build.  Double precision throughout,
matching Eigen's defaults.

Every method cites the /root/reference/legkilo file:line whose behavior it
reproduces.  This module is an *oracle*: clarity and fidelity over speed
(pure Python + NumPy, no JAX).  It is intentionally structured like the
reference (stateful classes, per-point recursion) — the exact opposite of
the TPU-native design in legkilo_tpu/ — so that agreement between the two
is meaningful evidence.

Deviation toggles (EmuParams) let each documented legkilo_tpu deviation be
costed individually by flipping the emulator to the TPU-side semantics:

  point_update    "nxn" (eskf.cc:91-123)  | "information" (the 6x6 Woodbury
                  form legkilo_tpu uses; algebraically equal, different fp)
  neighbor_retry  "reference" (KILO.cc:156-178: compares voxel-unit
                  loc_xyz against meter-unit voxel_center +- quater_length)
                  | "fixed" (consistent meters — legkilo_tpu semantics)
  insert_timing   "per_bucket" (KILO.cc:216-231) | "scan_end" (the
                  deferred-pipeline timing: all inserts after the last
                  bucket's update)
  bucket_quantum_s  per-point time quantization (lidar_processing.cc:48;
                  reference 0.002; legkilo_tpu bench uses 0.004)
  requantize_after_downsample  snap voxel-grid-averaged times back onto
                  the quantum grid (legkilo_tpu does; PCL's VoxelGrid
                  averages the curvature field, producing off-grid
                  singleton buckets — the reference's actual behavior)
  init_imu_a_from_grav  seed imu_a = -grav at init (legkilo_tpu
                  improvement; reference leaves imu_a = 0, eskf.cc:12)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import numpy as np

DIM = 30


# ---------------------------------------------------------------------------
# SO(3) (math_utils.hpp:19-76)
# ---------------------------------------------------------------------------

def skew(v: np.ndarray) -> np.ndarray:
    return np.array(
        [[0.0, -v[2], v[1]], [v[2], 0.0, -v[0]], [-v[1], v[0], 0.0]]
    )


def exp_so3(v: np.ndarray) -> np.ndarray:
    theta = float(np.linalg.norm(v))
    if theta < 1e-11:
        return np.eye(3) + skew(v)
    a = v / theta
    K = skew(a)
    return np.eye(3) + math.sin(theta) * K + (1.0 - math.cos(theta)) * (K @ K)


def log_so3(R: np.ndarray) -> np.ndarray:
    tr = np.trace(R)
    theta = math.acos(min(1.0, max(-1.0, (tr - 1.0) / 2.0)))
    ax = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    if theta < 1e-10:
        return 0.5 * ax
    return theta / (2.0 * math.sin(theta)) * ax


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class EmuParams:
    """Reference parameters (KILO.cc:25-84) + deviation toggles."""

    # ESKF process/measurement noise (eskf.h:49-65)
    vel_process_cov: float = 20.0
    imu_acc_process_cov: float = 500.0
    imu_gyr_process_cov: float = 1000.0
    contact_process_cov: float = 20.0
    acc_bias_process_cov: float = 0.001
    gyr_bias_process_cov: float = 0.001
    kin_bias_process_cov: float = 0.001
    imu_acc_meas_noise: float = 0.1
    imu_acc_z_meas_noise: float = 1.0
    imu_gyr_meas_noise: float = 0.01
    kin_meas_noise: float = 0.1
    lidar_point_meas_ratio: float = 10.0
    gravity: float = 9.81

    # Extrinsics
    ext_r: np.ndarray = dataclasses.field(default_factory=lambda: np.eye(3))
    ext_t: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, 0.0, 0.2])
    )

    # LiDAR preprocessing (lidar_processing.cc:25-52)
    filter_num: int = 3
    blind: float = 1.5
    voxel_grid_resolution: float = 0.3

    # Voxel map (voxel_map.h:41-57)
    voxel_size: float = 0.5
    max_layer: int = 2
    layer_init_num: Tuple[int, ...] = (5, 5, 5, 5, 5)
    max_points_num: int = 50
    planner_threshold: float = 0.01  # min_eigen_value
    sigma_num: float = 3.0
    dept_err: float = 0.04
    beam_err: float = 0.2

    only_imu_use: bool = True

    # --- deviation toggles (reference semantics by default) ---------------
    point_update: str = "nxn"           # "nxn" | "information"
    neighbor_retry: str = "reference"   # "reference" | "fixed"
    insert_timing: str = "per_bucket"   # "per_bucket" | "scan_end"
    bucket_quantum_s: float = 0.002
    requantize_after_downsample: bool = False
    init_imu_a_from_grav: bool = False

    @classmethod
    def from_config(cls, cfg) -> "EmuParams":
        """Build from a legkilo_tpu Config so both systems share knobs."""
        e, v, l = cfg.eskf, cfg.voxel_map, cfg.lidar
        return cls(
            vel_process_cov=e.vel_process_cov,
            imu_acc_process_cov=e.imu_acc_process_cov,
            imu_gyr_process_cov=e.imu_gyr_process_cov,
            contact_process_cov=e.contact_process_cov,
            acc_bias_process_cov=e.acc_bias_process_cov,
            gyr_bias_process_cov=e.gyr_bias_process_cov,
            kin_bias_process_cov=e.kin_bias_process_cov,
            imu_acc_meas_noise=e.imu_acc_meas_noise,
            imu_acc_z_meas_noise=e.imu_acc_z_meas_noise,
            imu_gyr_meas_noise=e.imu_gyr_meas_noise,
            kin_meas_noise=e.kin_meas_noise,
            lidar_point_meas_ratio=e.lidar_point_meas_ratio,
            gravity=cfg.gravity,
            ext_r=np.asarray(cfg.extrinsic_R, dtype=np.float64).reshape(3, 3),
            ext_t=np.asarray(cfg.extrinsic_T, dtype=np.float64),
            filter_num=l.filter_num,
            blind=l.blind,
            voxel_grid_resolution=l.voxel_grid_resolution,
            voxel_size=v.voxel_size,
            max_layer=v.max_layer,
            layer_init_num=tuple(v.layer_init_num),
            max_points_num=v.max_points_num,
            planner_threshold=v.min_eigen_value,
            sigma_num=v.sigma_num,
            dept_err=v.dept_err,
            beam_err=v.beam_err,
            only_imu_use=cfg.only_imu_use,
        )


# ---------------------------------------------------------------------------
# ESKF (eskf.cc)
# ---------------------------------------------------------------------------

class RefEskf:
    """30-dim error-state KF, double precision (eskf.{h,cc})."""

    def __init__(self, p: EmuParams):
        self.p = p
        self.rot = np.eye(3)
        self.lin = np.zeros(27)  # pos vel ba bw grav imu_a imu_w bv contact
        self.lin[12:15] = [0.0, 0.0, -9.81]  # grav (eskf.cc:11)
        self.cov = np.zeros((DIM, DIM))
        self.q_diag = np.zeros(DIM)

    # lin layout: [pos, vel, ba, bw, grav, imu_a, imu_w, bv, contact]
    #   indices in the 30-vec: 3,6,9,12,15,18,21,24,27
    @property
    def pos(self):
        return self.lin[0:3]

    @property
    def vel(self):
        return self.lin[3:6]

    @property
    def ba(self):
        return self.lin[6:9]

    @property
    def bw(self):
        return self.lin[9:12]

    @property
    def grav(self):
        return self.lin[12:15]

    @property
    def imu_a(self):
        return self.lin[15:18]

    @property
    def imu_w(self):
        return self.lin[18:21]

    def init_process_q(self):
        """initProcessCovQ (eskf.cc:47-62)."""
        p = self.p
        q = np.zeros(DIM)
        q[6:9] = p.vel_process_cov
        q[9:12] = p.acc_bias_process_cov
        q[12:15] = p.gyr_bias_process_cov
        q[18:21] = p.imu_acc_process_cov
        q[21:24] = p.imu_gyr_process_cov
        q[24:27] = p.kin_bias_process_cov
        q[27:30] = p.contact_process_cov
        self.q_diag = q

    def boxplus(self, delta: np.ndarray):
        """State::operator+= (eskf.cc:18-29)."""
        self.rot = self.rot @ exp_so3(delta[0:3])
        self.lin = self.lin + delta[3:30]

    def predict(self, dt: float, prop_state: bool, prop_cov: bool):
        """ESKF::predict (eskf.cc:64-89)."""
        if prop_state:
            f = np.zeros(DIM)
            f[0:3] = dt * self.imu_w
            f[3:6] = dt * self.vel
            f[6:9] = dt * (self.rot @ self.imu_a + self.grav)
            self.boxplus(f)
        if prop_cov:
            F = np.eye(DIM)
            F[0:3, 0:3] = exp_so3(-dt * self.imu_w)
            F[0:3, 21:24] = dt * np.eye(3)
            F[3:6, 6:9] = dt * np.eye(3)
            F[6:9, 0:3] = -dt * self.rot @ skew(self.imu_a)
            F[6:9, 15:18] = dt * np.eye(3)
            F[6:9, 18:21] = dt * self.rot
            self.cov = F @ self.cov @ F.T + (dt * dt) * np.diag(self.q_diag)

    def update_by_points(self, h: np.ndarray, z: np.ndarray, r: np.ndarray):
        """updateByPoints (eskf.cc:91-123): K = PH^T(HPH^T+R)^-1 with the
        N x N innovation inverse; N==1 fast path adds 1e-4 jitter.

        point_update="information" switches to the 6x6 Woodbury form used
        by legkilo_tpu (the commented-out alternative at eskf.cc:115-122),
        with the jitter folded into every row's R as legkilo_tpu does."""
        n = h.shape[0]
        if self.p.point_update == "information":
            w = 1.0 / (r + 1e-4)
            A = h.T @ (h * w[:, None])
            b = h.T @ (w * z)
            p66 = self.cov[0:6, 0:6]
            g6 = np.linalg.inv(np.eye(6) + A @ p66)
            p_left = self.cov[:, 0:6]
            dx = p_left @ (g6 @ b)
            self.boxplus(dx)
            self.cov = self.cov - p_left @ (g6 @ A) @ self.cov[0:6, :]
            return
        pht = self.cov[:, 0:6] @ h.T                      # [30, N]
        if n == 1:
            s = 1e-4 + float(h[0] @ pht[0:6, 0]) + float(r[0])
            K = pht / s                                    # [30, 1]
        else:
            hpht = h @ pht[0:6, :]                         # [N, N]
            hpht[np.arange(n), np.arange(n)] += r
            K = pht @ np.linalg.inv(hpht)
        dx = K @ z
        self.boxplus(dx)
        self.cov = self.cov - K @ h @ self.cov[0:6, :]

    def update_by_imu(self, z6: np.ndarray, r6: np.ndarray):
        """updateByImu (eskf.cc:125-135): H = [I3 at ba & imu_a (acc rows);
        I3 at bw & imu_w (gyr rows)], hand-simplified gain."""
        pht = self.cov[:, 9:15] + self.cov[:, 18:24]       # [30, 6]
        hp = self.cov[9:15, :] + self.cov[18:24, :]        # [6, 30]
        hpht = pht[9:15, :] + pht[18:24, :]                # [6, 6]
        hpht = hpht + np.diag(r6)
        K = pht @ np.linalg.inv(hpht)
        self.boxplus(K @ z6)
        self.cov = self.cov - K @ hp

    def update_by_kin_imu(self, h: np.ndarray, z: np.ndarray, r: np.ndarray):
        """updateByKinImu (eskf.cc:137-145): generic dense update."""
        pht = self.cov @ h.T
        hpht = h @ pht
        hpht = hpht + np.diag(r)
        K = pht @ np.linalg.inv(hpht)
        self.boxplus(K @ z)
        self.cov = self.cov - K @ h @ self.cov


# ---------------------------------------------------------------------------
# Voxel map: probabilistic plane octrees (voxel_map.{h,cc})
# ---------------------------------------------------------------------------

def calc_body_cov(pb: np.ndarray, range_inc: float, degree_inc: float) -> np.ndarray:
    """calcBodyCov (voxel_map.cc:22-40): range/bearing noise -> 3x3 cov."""
    pb = pb.copy()
    if pb[2] == 0.0:
        pb[2] = 0.0001
    rng = math.sqrt(pb[0] ** 2 + pb[1] ** 2 + pb[2] ** 2)
    range_var = range_inc * range_inc
    s2 = math.sin(math.radians(degree_inc)) ** 2
    direction = pb / np.linalg.norm(pb)
    d_hat = skew(direction)
    base1 = np.array([1.0, 1.0, -(direction[0] + direction[1]) / direction[2]])
    base1 = base1 / np.linalg.norm(base1)
    base2 = np.cross(base1, direction)
    base2 = base2 / np.linalg.norm(base2)
    N = np.stack([base1, base2], axis=1)                   # [3, 2]
    A = rng * d_hat @ N                                    # [3, 2]
    return (
        np.outer(direction, direction) * range_var
        + A @ (s2 * np.eye(2)) @ A.T
    )


@dataclasses.dataclass
class PV:
    """pointWithVar (voxel_map.h:59-78)."""

    point_b: np.ndarray
    point_i: np.ndarray
    point_w: np.ndarray
    body_var: np.ndarray
    var: np.ndarray
    point_crossmat: np.ndarray


class RefPlane:
    """VoxelPlane (voxel_map.h:96-119)."""

    __slots__ = (
        "center", "normal", "y_normal", "x_normal", "covariance",
        "plane_var", "radius", "min_eig", "mid_eig", "max_eig", "d",
        "points_size", "is_plane", "is_init", "id", "is_update",
    )

    def __init__(self):
        self.center = np.zeros(3)
        self.normal = np.zeros(3)
        self.y_normal = np.zeros(3)
        self.x_normal = np.zeros(3)
        self.covariance = np.zeros((3, 3))
        self.plane_var = np.zeros((6, 6))
        self.radius = 0.0
        self.min_eig = 1.0
        self.mid_eig = 1.0
        self.max_eig = 1.0
        self.d = 0.0
        self.points_size = 0
        self.is_plane = False
        self.is_init = False
        self.id = 0
        self.is_update = False


_plane_id_counter = [0]


class RefOcto:
    """VoxelOctoTree (voxel_map.h:129-176, voxel_map.cc:42-241)."""

    __slots__ = (
        "temp_points", "plane", "layer", "octo_state", "leaves",
        "voxel_center", "layer_init_num", "quater_length",
        "planer_threshold", "points_size_threshold", "update_size_threshold",
        "max_points_num", "max_layer", "new_points", "init_octo",
        "update_enable",
    )

    def __init__(self, max_layer, layer, points_size_threshold,
                 max_points_num, planer_threshold):
        self.temp_points: List[PV] = []
        self.plane = RefPlane()
        self.layer = layer
        self.octo_state = 0
        self.leaves: List[Optional[RefOcto]] = [None] * 8
        self.voxel_center = np.zeros(3)
        self.layer_init_num: Tuple[int, ...] = ()
        self.quater_length = 0.0
        self.planer_threshold = planer_threshold
        self.points_size_threshold = points_size_threshold
        self.update_size_threshold = 5  # voxel_map.h:158
        self.max_points_num = max_points_num
        self.max_layer = max_layer
        self.new_points = 0
        self.init_octo = False
        self.update_enable = True

    # -- plane fit ---------------------------------------------------------
    def init_plane(self, points: List[PV], plane: RefPlane):
        """init_plane (voxel_map.cc:42-117): mean/scatter eigendecomposition
        + per-point 6x3 Jacobian accumulation into plane_var."""
        n = len(points)
        pw = np.stack([pv.point_w for pv in points])       # [n, 3]
        center = pw.mean(axis=0)
        covariance = (pw.T @ pw) / n - np.outer(center, center)
        plane.plane_var = np.zeros((6, 6))
        plane.covariance = covariance
        plane.center = center
        plane.points_size = n
        plane.radius = 0.0
        evals, evecs = np.linalg.eigh(covariance)          # ascending
        i_min, i_mid, i_max = 0, 1, 2
        if evals[i_min] < self.planer_threshold:
            # Accumulate plane_var: J = [evecs @ F ; I/n], F rows per
            # voxel_map.cc:76-95.
            J_Q = np.eye(3) / n
            denom = n * (evals[i_min] - evals)             # [3]; denom[min]=0
            u_min = evecs[:, i_min]
            for pv in points:
                q = pv.point_w - center                     # [3]
                F = np.zeros((3, 3))
                for m in (i_mid, i_max):
                    u_m = evecs[:, m]
                    M = np.outer(u_m, u_min) + np.outer(u_min, u_m)
                    F[m] = (q / denom[m]) @ M
                J = np.zeros((6, 3))
                J[0:3, :] = evecs @ F
                J[3:6, :] = J_Q
                plane.plane_var += J @ pv.var @ J.T
            plane.normal = evecs[:, i_min].copy()
            plane.y_normal = evecs[:, i_mid].copy()
            plane.x_normal = evecs[:, i_max].copy()
            plane.min_eig = float(evals[i_min])
            plane.mid_eig = float(evals[i_mid])
            plane.max_eig = float(evals[i_max])
            plane.radius = math.sqrt(float(evals[i_max]))
            plane.d = float(-(plane.normal @ center))
            plane.is_plane = True
            plane.is_update = True
            if not plane.is_init:
                plane.id = _plane_id_counter[0]
                _plane_id_counter[0] += 1
                plane.is_init = True
        else:
            plane.is_update = True
            plane.is_plane = False

    # -- tree construction -------------------------------------------------
    def _make_leaf(self, leafnum: int) -> "RefOcto":
        xyz = ((leafnum >> 2) & 1, (leafnum >> 1) & 1, leafnum & 1)
        leaf = RefOcto(
            self.max_layer, self.layer + 1,
            self.layer_init_num[self.layer + 1],
            self.max_points_num, self.planer_threshold,
        )
        leaf.layer_init_num = self.layer_init_num
        leaf.voxel_center = self.voxel_center + (
            np.array([2 * xyz[0] - 1, 2 * xyz[1] - 1, 2 * xyz[2] - 1])
            * self.quater_length
        )
        leaf.quater_length = self.quater_length / 2.0
        self.leaves[leafnum] = leaf
        return leaf

    def _leafnum(self, pw: np.ndarray) -> int:
        x = 1 if pw[0] > self.voxel_center[0] else 0
        y = 1 if pw[1] > self.voxel_center[1] else 0
        z = 1 if pw[2] > self.voxel_center[2] else 0
        return 4 * x + 2 * y + z

    def init_octo_tree(self):
        """init_octo_tree (voxel_map.cc:119-137)."""
        if len(self.temp_points) > self.points_size_threshold:
            self.init_plane(self.temp_points, self.plane)
            if self.plane.is_plane:
                self.octo_state = 0
                if len(self.temp_points) > self.max_points_num:
                    self.update_enable = False
                    self.temp_points = []
                    self.new_points = 0
            else:
                self.octo_state = 1
                self.cut_octo_tree()
            self.init_octo = True
            self.new_points = 0

    def cut_octo_tree(self):
        """cut_octo_tree (voxel_map.cc:139-183): replay temp points into
        leaves, then plane-fit / recurse each populated leaf."""
        if self.layer >= self.max_layer:
            self.octo_state = 0
            return
        for pv in self.temp_points:
            leafnum = self._leafnum(pv.point_w)
            leaf = self.leaves[leafnum] or self._make_leaf(leafnum)
            leaf.temp_points.append(pv)
            leaf.new_points += 1
        for leaf in self.leaves:
            if leaf is None:
                continue
            if len(leaf.temp_points) > leaf.points_size_threshold:
                leaf.init_plane(leaf.temp_points, leaf.plane)
                if leaf.plane.is_plane:
                    leaf.octo_state = 0
                    if len(leaf.temp_points) > leaf.max_points_num:
                        leaf.update_enable = False
                        leaf.temp_points = []
                        self.new_points = 0  # (sic — parent counter,
                        # voxel_map.cc:172)
                else:
                    leaf.octo_state = 1
                    leaf.cut_octo_tree()
                leaf.init_octo = True
                leaf.new_points = 0

    def update(self, pv: PV):
        """UpdateOctoTree (voxel_map.cc:185-241)."""
        if not self.init_octo:
            self.new_points += 1
            self.temp_points.append(pv)
            if len(self.temp_points) > self.points_size_threshold:
                self.init_octo_tree()
        elif self.plane.is_plane:
            if self.update_enable:
                self.new_points += 1
                self.temp_points.append(pv)
                if self.new_points > self.update_size_threshold:
                    self.init_plane(self.temp_points, self.plane)
                    self.new_points = 0
                if len(self.temp_points) >= self.max_points_num:
                    self.update_enable = False
                    self.temp_points = []
                    self.new_points = 0
        elif self.layer < self.max_layer:
            leafnum = self._leafnum(pv.point_w)
            leaf = self.leaves[leafnum] or self._make_leaf(leafnum)
            leaf.update(pv)
        else:
            if self.update_enable:
                self.new_points += 1
                self.temp_points.append(pv)
                if self.new_points > self.update_size_threshold:
                    self.init_plane(self.temp_points, self.plane)
                    self.new_points = 0
                if len(self.temp_points) > self.max_points_num:
                    self.update_enable = False
                    self.temp_points = []
                    self.new_points = 0


class RefMap:
    """VoxelMapManager (voxel_map.cc:287-427)."""

    def __init__(self, p: EmuParams):
        self.p = p
        self.voxel_map: Dict[Tuple[int, int, int], RefOcto] = {}

    def _key_floor(self, pw: np.ndarray) -> Tuple[int, int, int]:
        """voxelKeyFloor (eigen_types.hpp:89-95)."""
        vs = self.p.voxel_size
        return (
            int(math.floor(pw[0] / vs)),
            int(math.floor(pw[1] / vs)),
            int(math.floor(pw[2] / vs)),
        )

    def _new_root(self, key: Tuple[int, int, int]) -> RefOcto:
        p = self.p
        octo = RefOcto(p.max_layer, 0, p.layer_init_num[0],
                       p.max_points_num, p.planner_threshold)
        octo.layer_init_num = p.layer_init_num
        octo.quater_length = p.voxel_size / 4.0
        octo.voxel_center = (np.asarray(key, dtype=np.float64) + 0.5) * p.voxel_size
        self.voxel_map[key] = octo
        return octo

    def build(self, pv_list: List[PV]):
        """BuildVoxelMap (voxel_map.cc:287-334): group into root voxels,
        then init each tree."""
        for pv in pv_list:
            key = self._key_floor(pv.point_w)
            octo = self.voxel_map.get(key) or self._new_root(key)
            octo.temp_points.append(pv)
            octo.new_points += 1
        for octo in self.voxel_map.values():
            octo.init_octo_tree()

    def update(self, pv_list: List[PV]):
        """UpdateVoxelMap (voxel_map.cc:336-361)."""
        for pv in pv_list:
            key = self._key_floor(pv.point_w)
            octo = self.voxel_map.get(key) or self._new_root(key)
            octo.update(pv)

    def build_single_residual(self, pv: PV, octo: RefOcto, layer: int,
                              state: list):
        """build_single_residual (voxel_map.cc:363-427).  ``state`` is the
        mutable [is_success, prob, ptpl] triple threaded through the
        recursion exactly like the reference's by-reference outputs."""
        p_w = pv.point_w
        plane = octo.plane
        if plane.is_plane:
            pq = p_w - plane.center
            dis_to_plane = abs(float(plane.normal @ p_w) + plane.d)
            dis_to_center = float(pq @ pq)
            range_dis = math.sqrt(max(0.0, dis_to_center - dis_to_plane ** 2))
            if range_dis <= 3.0 * plane.radius:
                j_nq = np.concatenate([pq, -plane.normal])
                sigma_l = float(j_nq @ plane.plane_var @ j_nq)
                sigma_l += float(plane.normal @ pv.var @ plane.normal)
                if dis_to_plane < self.p.sigma_num * math.sqrt(sigma_l):
                    state[0] = True
                    this_prob = (1.0 / math.sqrt(sigma_l)) * math.exp(
                        -0.5 * dis_to_plane * dis_to_plane / sigma_l
                    )
                    if this_prob > state[1]:
                        state[1] = this_prob
                        state[2] = {
                            "body_cov": pv.body_var,
                            "point_b": pv.point_b,
                            "point_w": pv.point_w,
                            "plane_var": plane.plane_var,
                            "normal": plane.normal,
                            "center": plane.center,
                            "d": plane.d,
                            "dis_to_plane": float(plane.normal @ p_w) + plane.d,
                            "point_crossmat": pv.point_crossmat,
                        }
        elif layer < self.p.max_layer:
            for leaf in octo.leaves:
                if leaf is not None:
                    self.build_single_residual(pv, leaf, layer + 1, state)


# ---------------------------------------------------------------------------
# Preprocessing (lidar_processing.cc + pcl::VoxelGrid)
# ---------------------------------------------------------------------------

def preprocess_scan(points: np.ndarray, time_offset: np.ndarray,
                    p: EmuParams) -> Tuple[np.ndarray, np.ndarray]:
    """Decimate 1/filter_num + blind filter + quantize per-point times
    (velodyneHandler, lidar_processing.cc:25-52).  Quantization is done in
    float32 like the reference's ``curvature`` field."""
    n = len(points)
    idx = np.arange(n)
    keep = (idx % p.filter_num) == 0
    r2 = (points.astype(np.float64) ** 2).sum(axis=1)
    keep &= r2 >= p.blind * p.blind
    pts = points[keep].astype(np.float64)
    t = time_offset[keep].astype(np.float32)
    inv_q = np.float32(1.0 / p.bucket_quantum_s)
    curv = np.round(t * inv_q) / inv_q                    # float32 grid
    return pts, curv.astype(np.float32)


def voxel_grid_downsample(pts: np.ndarray, curv: np.ndarray,
                          leaf: float) -> Tuple[np.ndarray, np.ndarray]:
    """pcl::VoxelGrid with downsample_all_data (the KILO.cc:356-360 path):
    centroid of every field — including the per-point time in curvature —
    over each occupied leaf."""
    keys = np.floor(pts / leaf).astype(np.int64)
    order = np.lexsort((keys[:, 2], keys[:, 1], keys[:, 0]))
    keys_s = keys[order]
    uniq, start, counts = np.unique(
        keys_s, axis=0, return_index=True, return_counts=True
    )
    out_p = np.add.reduceat(pts[order], start, axis=0) / counts[:, None]
    out_t = (
        np.add.reduceat(curv[order].astype(np.float64), start) / counts
    ).astype(np.float32)
    return out_p, out_t


# ---------------------------------------------------------------------------
# KILO orchestrator (KILO.cc)
# ---------------------------------------------------------------------------

class RefKilo:
    """KILO::process + predictUpdate{Point,Imu,KinImu} (KILO.cc:108-399)."""

    def __init__(self, p: EmuParams):
        self.p = p
        self.eskf = RefEskf(p)
        self.map = RefMap(p)
        self.init_flag = True
        self.acc_norm = p.gravity
        self.last_predict_t = 0.0
        self.last_update_t = 0.0
        self.n_matched_last = 0

    # -- initialization (state_initial.hpp:30-73) ---------------------------
    def _state_initial(self, accs: np.ndarray, gyrs: np.ndarray):
        """Running mean of the packet's IMU samples (the recursion at
        state_initial.hpp:49-64 reduces to the arithmetic mean)."""
        mean_acc = np.zeros(3)
        mean_gyr = np.zeros(3)
        N = 1
        mean_acc[:] = accs[0]
        mean_gyr[:] = gyrs[0]
        for a, g in zip(accs, gyrs):
            mean_acc += (a - mean_acc) / N
            mean_gyr += (g - mean_gyr) / N
            N += 1
        self.acc_norm = float(np.linalg.norm(mean_acc))
        e = self.eskf
        e.lin[12:15] = -mean_acc / self.acc_norm * self.p.gravity  # grav
        e.lin[9:12] = mean_gyr                                     # bw
        e.rot = np.eye(3)
        e.cov = 1e-6 * np.eye(DIM)
        e.init_process_q()
        if self.p.init_imu_a_from_grav:
            e.lin[15:18] = -e.lin[12:15]  # legkilo_tpu improvement

    def _make_pv(self, pb: np.ndarray) -> PV:
        """Point variance construction (KILO.cc:122-140)."""
        e, p = self.eskf, self.p
        point_i = p.ext_r @ pb + p.ext_t
        point_w = e.rot @ point_i + e.pos
        body_var = calc_body_cov(pb, p.dept_err, p.beam_err)
        crossmat = skew(point_i)
        rot_extr = e.rot @ p.ext_r
        rot_cross = e.rot @ crossmat
        var = (
            rot_extr @ body_var @ rot_extr.T
            + rot_cross @ e.cov[0:3, 0:3] @ rot_cross.T
            + e.cov[3:6, 3:6]
        )
        return PV(point_b=pb, point_i=point_i, point_w=point_w,
                  body_var=body_var, var=var, point_crossmat=crossmat)

    # -- per-bucket step (predictUpdatePoint, KILO.cc:108-233) --------------
    def predict_update_point(self, current_time: float,
                             bucket_pts: np.ndarray) -> Tuple[int, List[PV]]:
        e, p = self.eskf, self.p
        e.predict(current_time - self.last_update_t, False, True)
        e.predict(current_time - self.last_predict_t, True, False)
        self.last_predict_t = current_time

        pv_list: List[PV] = []
        ptpl_list: List[dict] = []
        vs = p.voxel_size
        for pb in bucket_pts:
            pv = self._make_pv(pb)
            pv_list.append(pv)
            # Voxel key: float32 division + (int) cast with -1.0 for
            # negatives (KILO.cc:143-148 — NOT std::floor for exact ints).
            loc = np.float32(pv.point_w / vs)
            loc = np.where(loc < 0, loc - np.float32(1.0), loc)
            key = (int(loc[0]), int(loc[1]), int(loc[2]))
            octo = self.map.voxel_map.get(key)
            if octo is None:
                continue
            state = [False, 0.0, None]
            self.map.build_single_residual(pv, octo, 0, state)
            if not state[0]:
                near = self._near_key(key, loc, pv.point_w, octo)
                if near != key:
                    octo_n = self.map.voxel_map.get(near)
                    if octo_n is not None:
                        self.map.build_single_residual(pv, octo_n, 0, state)
            if state[0]:
                ptpl_list.append(state[2])

        eskf_update = len(ptpl_list) > 0
        if eskf_update:
            n = len(ptpl_list)
            h = np.zeros((n, 6))
            z = np.zeros(n)
            r = np.zeros(n)
            rot_t = e.rot.T
            for k, pt in enumerate(ptpl_list):
                u = pt["normal"]
                h[k, 0:3] = pt["point_crossmat"] @ rot_t @ u
                h[k, 3:6] = u
                z[k] = -pt["dis_to_plane"]
                j_nq = np.concatenate([pt["point_w"] - pt["center"], -u])
                var = (
                    e.rot @ p.ext_r @ pt["body_cov"] @ p.ext_r.T @ e.rot.T
                )
                single_l = float(j_nq @ pt["plane_var"] @ j_nq)
                r[k] = p.lidar_point_meas_ratio * (
                    single_l + float(u @ var @ u)
                )
            e.update_by_points(h, z, r)
            self.last_update_t = current_time

            # Recompute world coords + var with the updated state
            # (KILO.cc:216-229).
            for pv in pv_list:
                pv.point_w = e.rot @ pv.point_i + e.pos
                rot_extr = e.rot @ p.ext_r
                rot_cross = e.rot @ pv.point_crossmat
                pv.var = (
                    rot_extr @ pv.body_var @ rot_extr.T
                    + rot_cross @ e.cov[0:3, 0:3] @ rot_cross.T
                    + e.cov[3:6, 3:6]
                )
        if p.insert_timing == "per_bucket":
            self.map.update(pv_list)          # KILO.cc:231 (unconditional)
            pv_list = []
        return len(ptpl_list), pv_list

    def _near_key(self, key, loc, point_w, octo: RefOcto):
        """Neighbor-voxel retry (KILO.cc:156-178).  The reference compares
        ``loc_xyz`` — the point's coordinates in *voxel units* — against
        voxel_center_ +- quater_length_ in *meters*; neighbor_retry="fixed"
        uses consistent meters (legkilo_tpu semantics)."""
        if self.p.neighbor_retry == "fixed":
            probe = point_w
        else:
            probe = loc  # unit-mixed, as written in the reference
        near = list(key)
        for j in range(3):
            if probe[j] > octo.voxel_center[j] + octo.quater_length:
                near[j] += 1
            elif probe[j] < octo.voxel_center[j] - octo.quater_length:
                near[j] -= 1
        return tuple(near)

    # -- event updates (KILO.cc:235-314) ------------------------------------
    def predict_update_imu(self, t: float, acc: np.ndarray, gyr: np.ndarray):
        e, p = self.eskf, self.p
        e.predict(t - self.last_update_t, False, True)
        e.predict(t - self.last_predict_t, True, False)
        self.last_predict_t = t
        z = np.concatenate([
            (p.gravity / self.acc_norm) * acc - e.imu_a - e.ba,
            gyr - e.imu_w - e.bw,
        ])
        r = np.array([
            p.imu_acc_meas_noise, p.imu_acc_meas_noise, p.imu_acc_z_meas_noise,
            p.imu_gyr_meas_noise, p.imu_gyr_meas_noise, p.imu_gyr_meas_noise,
        ])
        e.update_by_imu(z, r)
        self.last_update_t = t

    def predict_update_kin_imu(self, t: float, acc, gyr, foot_pos, foot_vel,
                               contact):
        e, p = self.eskf, self.p
        e.predict(t - self.last_update_t, False, True)
        e.predict(t - self.last_predict_t, True, False)
        self.last_predict_t = t
        feet = [i for i in range(4) if contact[i]]
        nc = len(feet)
        m = 6 + 3 * nc
        h = np.zeros((m, DIM))
        z = np.zeros(m)
        r = np.zeros(m)
        h[0:6, 9:15] = np.eye(6)
        h[0:6, 18:24] = np.eye(6)
        z[0:3] = (p.gravity / self.acc_norm) * acc - e.imu_a - e.ba
        z[3:6] = gyr - e.imu_w - e.bw
        r[0:6] = [p.imu_acc_meas_noise, p.imu_acc_meas_noise,
                  p.imu_acc_z_meas_noise, p.imu_gyr_meas_noise,
                  p.imu_gyr_meas_noise, p.imu_gyr_meas_noise]
        w_skew = skew(e.imu_w)
        for idx, i in enumerate(feet):
            fp = np.asarray(foot_pos[i], dtype=np.float64)
            fv = np.asarray(foot_vel[i], dtype=np.float64)
            wpv = w_skew @ fp + fv
            rows = slice(6 + 3 * idx, 9 + 3 * idx)
            h[rows, 0:3] = -e.rot @ skew(wpv)
            h[rows, 6:9] = np.eye(3)
            h[rows, 21:24] = -e.rot @ skew(fp)
            z[rows] = -e.vel - e.rot @ wpv
            r[rows] = p.kin_meas_noise
        e.update_by_kin_imu(h, z, r)
        self.last_update_t = t

    # -- per-scan driver (KILO::process, KILO.cc:316-399) --------------------
    def process(self, pts_body: np.ndarray, curv: np.ndarray,
                begin_time: float, end_time: float,
                imus: List, kins: List) -> bool:
        """One synced packet.  ``imus`` = [(t, acc, gyr)], ``kins`` =
        [(t, acc, gyr, foot_pos, foot_vel, contact)], both time-sorted and
        already limited to stamps <= end_time (syncPackage,
        ros_interface.cc:271-332)."""
        p = self.p
        use_kin = not p.only_imu_use
        if len(pts_body) == 0 or (not use_kin and not imus) or (
            use_kin and not kins
        ):
            return False

        if self.init_flag:
            if use_kin:
                accs = np.stack([k[1] for k in kins])
                gyrs = np.stack([k[2] for k in kins])
            else:
                accs = np.stack([m[1] for m in imus])
                gyrs = np.stack([m[2] for m in imus])
            self._state_initial(accs, gyrs)
            # First-frame map from the *raw* (un-downsampled) cloud
            # (KILO.cc:332-353 + BuildVoxelMap's own var construction,
            # voxel_map.cc:297-310 — crossmat of the LIDAR-frame point).
            e = self.eskf
            pv_list = []
            rot_extr = e.rot @ p.ext_r
            rot_cov = e.cov[0:3, 0:3]
            pos_cov = e.cov[3:6, 3:6]
            for pb in pts_body:
                pw = e.rot @ (p.ext_r @ pb + p.ext_t) + e.pos
                bv = calc_body_cov(pb, p.dept_err, p.beam_err)
                cm = skew(pb)
                var = (
                    rot_extr @ bv @ rot_extr.T
                    + cm @ rot_cov @ cm.T          # (-cm) C (-cm)^T == cm C cm^T
                    + pos_cov
                )
                pv_list.append(PV(point_b=pb, point_i=None, point_w=pw,
                                  body_var=bv, var=var, point_crossmat=cm))
            self.map.build(pv_list)
            self.init_flag = False
            self.last_predict_t = end_time
            self.last_update_t = end_time
            return True

        # Downsample + optional re-quantization of averaged times
        down_p, down_t = voxel_grid_downsample(
            pts_body, curv, p.voxel_grid_resolution
        )
        if p.requantize_after_downsample:
            inv_q = np.float32(1.0 / p.bucket_quantum_s)
            down_t = (np.round(down_t * inv_q) / inv_q).astype(np.float32)

        # Sort by per-point time, walk equal-time buckets (KILO.cc:369-395)
        order = np.argsort(down_t, kind="stable")
        down_p, down_t = down_p[order], down_t[order]
        imus = list(imus)
        kins = list(kins)
        n_matched = 0
        deferred: List[PV] = []
        i = 0
        npts = len(down_p)
        while i < npts:
            cur_t = begin_time + float(down_t[i])
            j = i + 1
            while j < npts and down_t[j] == down_t[i]:
                j += 1
            if not use_kin:
                while imus and imus[0][0] < cur_t:
                    t, acc, gyr = imus.pop(0)
                    self.predict_update_imu(t, acc, gyr)
            else:
                while kins and kins[0][0] < cur_t:
                    t, acc, gyr, fp, fv, c = kins.pop(0)
                    self.predict_update_kin_imu(t, acc, gyr, fp, fv, c)
            nm, leftover = self.predict_update_point(cur_t, down_p[i:j])
            n_matched += nm
            deferred.extend(leftover)
            i = j
        if deferred:
            self.map.update(deferred)  # insert_timing == "scan_end"
        self.n_matched_last = n_matched
        return True


# ---------------------------------------------------------------------------
# Offline replay driver
# ---------------------------------------------------------------------------

def run_emulator(scans, events, params: EmuParams, progress=None):
    """Replay sim streams through the emulator.

    ``scans``: list of RawScan-like (begin_time, end_time, points [N,3],
    time_offset [N]); ``events``: ImuEvent or KinImuEvent list (sim.py).
    Returns (times [M], rots [M,3,3], poss [M,3], match_counts [M]).
    """
    use_kin = not params.only_imu_use
    kilo = RefKilo(params)
    ev = sorted(events, key=lambda e: e.time)
    ei = 0
    times, rots, poss, matched = [], [], [], []
    for scan in scans:
        # syncPackage: all events with stamp <= scan end (lock-step).
        batch = []
        while ei < len(ev) and ev[ei].time <= scan.end_time:
            e = ev[ei]
            if use_kin:
                batch.append((e.time, np.asarray(e.acc, dtype=np.float64),
                              np.asarray(e.gyr, dtype=np.float64),
                              np.asarray(e.foot_pos, dtype=np.float64),
                              np.asarray(e.foot_vel, dtype=np.float64),
                              np.asarray(e.contact)))
            else:
                batch.append((e.time, np.asarray(e.acc, dtype=np.float64),
                              np.asarray(e.gyr, dtype=np.float64)))
            ei += 1
        pts, curv = preprocess_scan(
            np.asarray(scan.points), np.asarray(scan.time_offset), params
        )
        ok = (
            kilo.process(pts, curv, scan.begin_time, scan.end_time,
                         [] if use_kin else batch, batch if use_kin else [])
        )
        if ok:
            times.append(scan.end_time)
            rots.append(kilo.eskf.rot.copy())
            poss.append(kilo.eskf.pos.copy())
            matched.append(kilo.n_matched_last)
        if progress is not None:
            progress(len(times))
    return (np.asarray(times), np.stack(rots), np.stack(poss),
            np.asarray(matched))
