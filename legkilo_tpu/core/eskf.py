"""Error-state Kalman filter: predict + three update flavors, pure functions.

Capability parity with the reference ESKF
(/root/reference/legkilo/src/core/slam/eskf.{h,cc}) re-designed TPU-first:

* All functions are pure ``(state, cov, meas) -> (state, cov)`` and batched
  over arbitrary leading dims — ready for ``vmap`` over Monte-Carlo replicas.
* The LiDAR point update uses the **information form**: instead of the
  reference's N x N innovation inverse (eskf.cc:109, the survey-identified
  asymptotic bottleneck), we Woodbury-reduce to a single 6x6 solve

      A  = H6^T R^-1 H6            (6x6, one [6,N]@[N,6] matmul)
      b  = H6^T R^-1 z             (6,)
      G6 = (I6 + A P66)^-1         (6x6 solve)
      dx = P[:, :6] G6 b
      P <- P - P[:, :6] G6 A P[:6, :]

  which is algebraically identical to K = P H^T (H P H^T + R)^-1 for
  H = [H6, 0] (push-through identity), handles masked/padded rows for free
  (weight 0), and maps onto the MXU.  The reference's N==1 fast path adds a
  1e-4 jitter to the innovation (eskf.cc:100); we fold the same jitter into R
  uniformly.
* The IMU update exploits the H structure [I3 at ba & imu_a; I3 at bw & imu_w]
  exactly like the reference's hand-simplified gain (eskf.cc:125-135).
* The kinematic update uses a fixed-shape padded H (18 x 30: 6 IMU rows + 4
  contact feet x 3) with row masking instead of dynamic row counts
  (eskf.cc:137-145, KILO.cc:260-314).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from .so3 import exp_so3, skew
from .state import (
    DIM_STATE,
    IDX_BA,
    IDX_IMU_A,
    State,
    boxplus,
)

_R_JITTER = 1e-4  # reference adds this to the N==1 innovation (eskf.cc:100)


class NoiseParams(NamedTuple):
    """Device-side ESKF noise parameters (from config.EskfConfig)."""

    q_diag: jnp.ndarray          # [30] process noise diagonal
    imu_meas_r: jnp.ndarray      # [6]  acc x/y, acc z, gyr noise layout
    kin_meas_noise: jnp.ndarray  # []   per-axis foot velocity noise
    lidar_point_meas_ratio: jnp.ndarray  # []


def make_noise_params(eskf_cfg, dtype=jnp.float32) -> NoiseParams:
    """Build the process-noise diagonal (initProcessCovQ, eskf.cc:47-62)."""
    q = jnp.zeros((DIM_STATE,), dtype=dtype)
    c = eskf_cfg
    q = q.at[6:9].set(c.vel_process_cov)
    q = q.at[9:12].set(c.acc_bias_process_cov)
    q = q.at[12:15].set(c.gyr_bias_process_cov)
    q = q.at[18:21].set(c.imu_acc_process_cov)
    q = q.at[21:24].set(c.imu_gyr_process_cov)
    q = q.at[24:27].set(c.kin_bias_process_cov)
    q = q.at[27:30].set(c.contact_process_cov)
    imu_r = jnp.asarray(
        [
            c.imu_acc_meas_noise,
            c.imu_acc_meas_noise,
            c.imu_acc_z_meas_noise,
            c.imu_gyr_meas_noise,
            c.imu_gyr_meas_noise,
            c.imu_gyr_meas_noise,
        ],
        dtype=dtype,
    )
    return NoiseParams(
        q_diag=q,
        imu_meas_r=imu_r,
        kin_meas_noise=jnp.asarray(c.kin_meas_noise, dtype=dtype),
        lidar_point_meas_ratio=jnp.asarray(c.lidar_point_meas_ratio, dtype=dtype),
    )


# ---------------------------------------------------------------------------
# Small closed-form inverses
#
# jnp.linalg.solve on TPU lowers to LU loops that cannot fuse; the filter's
# innovation systems are tiny and well-conditioned (identity-plus-PSD or
# R-regularized SPD), so closed forms built from fusable elementwise ops are
# both faster and kernel-count-friendly.
# ---------------------------------------------------------------------------


def _inv3(m: jnp.ndarray) -> jnp.ndarray:
    """Adjugate inverse of [..., 3, 3] matrices (closed form)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b * g - a * h
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    inv_det = 1.0 / det
    rows = jnp.stack(
        [
            jnp.stack([co00, co01, co02], axis=-1),
            jnp.stack([co10, co11, co12], axis=-1),
            jnp.stack([co20, co21, co22], axis=-1),
        ],
        axis=-2,
    )
    return rows * inv_det[..., None, None]


def inv6(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of [..., 6, 6] via 2x2-block Schur complement."""
    A = m[..., 0:3, 0:3]
    B = m[..., 0:3, 3:6]
    C = m[..., 3:6, 0:3]
    D = m[..., 3:6, 3:6]
    Ai = _inv3(A)
    AiB = Ai @ B
    CAi = C @ Ai
    Si = _inv3(D - C @ AiB)
    TL = Ai + AiB @ Si @ CAi
    TR = -(AiB @ Si)
    BL = -(Si @ CAi)
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([BL, Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


# ---------------------------------------------------------------------------
# Predict
# ---------------------------------------------------------------------------


def transition_f(state: State, dt: jnp.ndarray) -> jnp.ndarray:
    """Nominal-state increment f(x) dt (getFunctionf, eskf.cc:64-70)."""
    dt = jnp.asarray(dt, dtype=state.lin.dtype)
    batch = state.lin.shape[:-1]
    vec = jnp.zeros(batch + (DIM_STATE,), dtype=state.lin.dtype)
    vec = vec.at[..., 0:3].set(dt[..., None] * state.imu_w)
    vec = vec.at[..., 3:6].set(dt[..., None] * state.vel)
    acc_w = jnp.einsum("...ij,...j->...i", state.rot, state.imu_a) + state.grav
    vec = vec.at[..., 6:9].set(dt[..., None] * acc_w)
    return vec


def transition_fx(state: State, dt: jnp.ndarray) -> jnp.ndarray:
    """Sparse 30x30 error-state transition (getFx, eskf.cc:72-81)."""
    dt = jnp.asarray(dt, dtype=state.lin.dtype)
    batch = state.lin.shape[:-1]
    eye3 = jnp.eye(3, dtype=state.lin.dtype)
    F = jnp.broadcast_to(
        jnp.eye(DIM_STATE, dtype=state.lin.dtype), batch + (DIM_STATE, DIM_STATE)
    )
    dt_b = dt[..., None, None]
    F = F.at[..., 0:3, 0:3].set(exp_so3(-dt[..., None] * state.imu_w))
    F = F.at[..., 0:3, 21:24].set(dt_b * eye3)
    F = F.at[..., 3:6, 6:9].set(dt_b * eye3)
    F = F.at[..., 6:9, 0:3].set(-dt_b * (state.rot @ skew(state.imu_a)))
    F = F.at[..., 6:9, 15:18].set(dt_b * eye3)
    F = F.at[..., 6:9, 18:21].set(dt_b * state.rot)
    return F


def predict_mean(state: State, dt: jnp.ndarray) -> State:
    """Mean propagation: x <- x boxplus f(x) dt (predict(.., true, false))."""
    return boxplus(state, transition_f(state, dt))


def predict_cov(
    state: State, cov: jnp.ndarray, q_diag: jnp.ndarray, dt: jnp.ndarray
) -> jnp.ndarray:
    """Covariance propagation: P <- F P F^T + dt^2 Q (predict, eskf.cc:83-89)."""
    dt = jnp.asarray(dt, dtype=cov.dtype)
    F = transition_fx(state, dt)
    cov = F @ cov @ jnp.swapaxes(F, -1, -2)
    dt2 = (dt * dt)[..., None]
    idx = jnp.arange(DIM_STATE)
    return cov.at[..., idx, idx].add(dt2 * q_diag)


def predict(
    state: State,
    cov: jnp.ndarray,
    q_diag: jnp.ndarray,
    dt_mean: jnp.ndarray,
    dt_cov: jnp.ndarray,
) -> Tuple[State, jnp.ndarray]:
    """Combined predict matching the KILO call pattern (KILO.cc:110-115):

    covariance propagates over ``dt_cov`` (time since last *update*) using the
    pre-propagation state; the mean propagates over ``dt_mean`` (time since
    last *predict*).
    """
    new_cov = predict_cov(state, cov, q_diag, dt_cov)
    new_state = predict_mean(state, dt_mean)
    return new_state, new_cov


# ---------------------------------------------------------------------------
# Updates
# ---------------------------------------------------------------------------


def update_by_points(
    state: State,
    cov: jnp.ndarray,
    h6: jnp.ndarray,    # [..., N, 6]
    z: jnp.ndarray,     # [..., N]
    r: jnp.ndarray,     # [..., N] per-row measurement variance
    mask: jnp.ndarray,  # [..., N] bool/float validity
) -> Tuple[State, jnp.ndarray]:
    """Information-form point update (replaces updateByPoints, eskf.cc:91-123).

    Masked rows contribute zero information.  Returns updated (state, cov);
    the caller gates on ``any(mask)`` if a fully-empty update must be a no-op
    (with no valid rows, A = 0, b = 0 -> dx = 0 and P unchanged, so it already
    is a no-op).
    """
    dtype = cov.dtype
    w = mask.astype(dtype) / (r + _R_JITTER)          # [..., N]
    hw = h6 * w[..., None]                             # [..., N, 6]
    A = jnp.einsum("...ni,...nj->...ij", hw, h6)       # [..., 6, 6]
    b = jnp.einsum("...ni,...n->...i", hw, z)          # [..., 6]

    p66 = cov[..., 0:6, 0:6]
    eye6 = jnp.eye(6, dtype=dtype)
    g6 = inv6(eye6 + A @ p66)                           # [..., 6, 6]
    g6_b = jnp.einsum("...ij,...j->...i", g6, b)        # G6 @ b
    g6_a = g6 @ A                                       # G6 @ A

    p_left = cov[..., :, 0:6]                           # [..., 30, 6]
    dx = jnp.einsum("...ij,...j->...i", p_left, g6_b)   # [..., 30]
    kh_p = p_left @ g6_a @ cov[..., 0:6, :]             # [..., 30, 30]

    new_state = boxplus(state, dx)
    new_cov = cov - kh_p
    return new_state, new_cov


def imu_innovation(
    state: State,
    acc: jnp.ndarray,
    gyr: jnp.ndarray,
    gravity_over_acc_norm: jnp.ndarray,
) -> jnp.ndarray:
    """z = [(g/|a_mean|) acc - imu_a - ba ; gyr - imu_w - bw] (KILO.cc:248-249)."""
    za = gravity_over_acc_norm[..., None] * acc - state.imu_a - state.ba
    zg = gyr - state.imu_w - state.bw
    return jnp.concatenate([za, zg], axis=-1)


def update_by_imu(
    state: State,
    cov: jnp.ndarray,
    z6: jnp.ndarray,       # [..., 6]
    r6: jnp.ndarray,       # [6] or [..., 6]
    gate: jnp.ndarray = None,  # optional scalar 0/1: masked event slots
) -> Tuple[State, jnp.ndarray]:
    """Structured IMU update (updateByImu, eskf.cc:125-135).

    H is nonzero only as I3 blocks at columns (ba, imu_a) for the acc rows and
    (bw, imu_w) for the gyr rows, so P H^T is a sum of two column blocks.
    ``gate`` scales the gain to 0 for padded event slots (regular-shape
    rollout; see filter.py).
    """
    pht = cov[..., :, IDX_BA : IDX_BA + 6] + cov[..., :, IDX_IMU_A : IDX_IMU_A + 6]
    hp = cov[..., IDX_BA : IDX_BA + 6, :] + cov[..., IDX_IMU_A : IDX_IMU_A + 6, :]
    hpht = (
        pht[..., IDX_BA : IDX_BA + 6, :] + pht[..., IDX_IMU_A : IDX_IMU_A + 6, :]
    )
    s = hpht + jnp.zeros_like(hpht).at[..., jnp.arange(6), jnp.arange(6)].set(r6)
    k = pht @ inv6(s)
    if gate is not None:
        k = k * gate[..., None, None]
    dx = jnp.einsum("...ij,...j->...i", k, z6)
    new_state = boxplus(state, dx)
    new_cov = cov - k @ hp
    return new_state, new_cov


def build_kin_obs(
    state: State,
    acc: jnp.ndarray,        # [..., 3]
    gyr: jnp.ndarray,        # [..., 3]
    foot_pos: jnp.ndarray,   # [..., 4, 3]
    foot_vel: jnp.ndarray,   # [..., 4, 3]
    contact: jnp.ndarray,    # [..., 4] bool
    noise: NoiseParams,
    gravity_over_acc_norm: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Assemble the fixed-shape (18-row) kinematic+IMU observation.

    Parity: predictUpdateKinImu (KILO.cc:260-314).  Rows 0:6 are the IMU
    observation; rows 6+3i:9+3i are the contact-velocity observation of foot i
    (zero-velocity of the stance foot expressed through body rates):

        z_i = -v - R (w x p_i + v_i)
        H_i = [-R [w x p_i + v_i]x  at rot | I3 at vel | -R [p_i]x at imu_w]

    Non-contact feet get masked rows (H=0, z=0, R=1).
    """
    dtype = state.lin.dtype
    batch = state.lin.shape[:-1]
    rot = state.rot

    h = jnp.zeros(batch + (18, DIM_STATE), dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    # IMU rows: I3 at (ba, imu_a) for acc, (bw, imu_w) for gyr.
    h = h.at[..., 0:3, 9:12].set(eye3)
    h = h.at[..., 0:3, 18:21].set(eye3)
    h = h.at[..., 3:6, 12:15].set(eye3)
    h = h.at[..., 3:6, 21:24].set(eye3)

    z = jnp.zeros(batch + (18,), dtype=dtype)
    z = z.at[..., 0:6].set(imu_innovation(state, acc, gyr, gravity_over_acc_norm))

    r = jnp.ones(batch + (18,), dtype=dtype)
    r = r.at[..., 0:6].set(noise.imu_meas_r)

    w = state.imu_w
    w_skew = skew(w)                                            # [..., 3, 3]
    wxp_v = (
        jnp.einsum("...ij,...fj->...fi", w_skew, foot_pos) + foot_vel
    )                                                           # [..., 4, 3]
    c = contact.astype(dtype)                                   # [..., 4]

    h_rot = -jnp.einsum("...ij,...fjk->...fik", rot, skew(wxp_v))  # [..., 4, 3, 3]
    h_w = -jnp.einsum("...ij,...fjk->...fik", rot, skew(foot_pos))
    z_foot = -state.vel[..., None, :] - jnp.einsum(
        "...ij,...fj->...fi", rot, wxp_v
    )                                                           # [..., 4, 3]

    cmask = c[..., :, None, None]
    for f in range(4):
        rows = slice(6 + 3 * f, 9 + 3 * f)
        h = h.at[..., rows, 0:3].set(h_rot[..., f, :, :] * cmask[..., f, :, :])
        h = h.at[..., rows, 6:9].set(eye3 * cmask[..., f, :, :])
        h = h.at[..., rows, 21:24].set(h_w[..., f, :, :] * cmask[..., f, :, :])
        z = z.at[..., rows].set(z_foot[..., f, :] * c[..., f, None])
        r = r.at[..., rows].set(
            jnp.where(c[..., f, None] > 0, noise.kin_meas_noise, jnp.asarray(1.0, dtype))
        )
    mask = jnp.concatenate(
        [jnp.ones(batch + (6,), dtype=bool), jnp.repeat(contact, 3, axis=-1)], axis=-1
    )
    return h, z, r, mask


def update_by_kin_imu(
    state: State,
    cov: jnp.ndarray,
    h: jnp.ndarray,     # [..., 18, 30]
    z: jnp.ndarray,     # [..., 18]
    r: jnp.ndarray,     # [..., 18]
    gate: jnp.ndarray = None,
) -> Tuple[State, jnp.ndarray]:
    """Dense fixed-shape update (updateByKinImu, eskf.cc:137-145).

    Masked rows (H row = 0, z = 0, R = 1) contribute a zero gain column, so
    the padded 18-row shape is exact for any contact count 0-4.

    The innovation inverse uses the closed-form nested-Schur ``inv18``
    (eskf_fused) instead of ``jnp.linalg.solve``: the solve lowers to
    unfusable LU loops (see the module inverse rationale above), while the
    18x18 system here is SPD (H P H^T + diag(R), R >= kin noise > 0) so the
    block-Schur form is exact; equality with the solve path is pinned by
    tests/test_eskf.py.
    """
    from .eskf_fused import inv18

    pht = cov @ jnp.swapaxes(h, -1, -2)                 # [..., 30, 18]
    s = h @ pht                                          # [..., 18, 18]
    n = s.shape[-1]
    s = s.at[..., jnp.arange(n), jnp.arange(n)].add(r)
    k = pht @ inv18(s)
    if gate is not None:
        k = k * gate[..., None, None]
    dx = jnp.einsum("...ij,...j->...i", k, z)
    new_state = boxplus(state, dx)
    new_cov = cov - k @ (h @ cov)
    return new_state, new_cov
