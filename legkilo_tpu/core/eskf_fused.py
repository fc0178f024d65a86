"""Launch-count-minimal ESKF chain math: everything elementwise, no dots.

Semantically identical to eskf.py's predict/update functions (the reference
contracts eskf.cc:64-145 / KILO.cc:108-314), re-expressed so that the
sequential per-bucket chain emits NO ``dot_general``, NO ``reduce`` over the
point axis, and NO ``scatter`` — only elementwise/broadcast ops that XLA
fuses into a handful of kernels.  On this rig every small matmul / unfused
reduction / kernel launch inside a sequentially-dependent loop costs ~50 us
(docs/PERF_NOTES.md), so the lax.scan chain's latency is simply
50 us x kernels-per-bucket x n_buckets; this module exists to drive
kernels-per-bucket toward 1.

Two ideas:

1. **Unrolled small products** (``umm``/``umv``): matrix products with a
   static small contraction dim become explicit multiply-add chains —
   elementwise graphs XLA fuses, instead of 50 us dot kernels.  The 30x30
   covariance propagation never materializes F: the sparse structure of the
   transition (eskf.cc:72-81: identity plus 6 small blocks) is applied as
   row/column block updates.

2. **Sufficient-statistic point update**: for the LiDAR point update, both
   normal-equation terms A = sum_n w h h^T and b = sum_n w h z are bilinear
   in the current bucket's (R, t) because

       h = [p x (R^T n); n],   z = -n . (R p + t - c)

   with per-point features p (imu-frame point), n (plane normal), c (plane
   center) and weight w = matched / (r + jitter) all FIXED by the batched
   match phase.  Writing Rf = vec(R) (row-major), each point contributes a
   40-feature vector

       X = [vec_cb(n_c * [p]x_{.b}) (27), n (3), vec(n (x) p) (9), n.c (1)]

   such that with the (R, t)-dependent selector Phi(R, t) [40 x 7]:

       [A  b; b^T  *] = Phi^T (sum_n w X X^T) Phi .

   S_b = sum_n w X X^T is computed ONCE per scan for all buckets as a single
   [NB, P, 40] x [NB, P, 40] batched matmul (MXU work in the batched phase),
   and the in-chain per-bucket cost collapses to the elementwise Phi
   contraction — the chain touches no per-point data at all.

Equivalence with the direct forms is covered by tests/test_eskf_fused.py.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .state import DIM_STATE, State

_R_JITTER = 1e-4  # reference adds this to the innovation (eskf.cc:100)


# ---------------------------------------------------------------------------
# Unrolled linear algebra (elementwise only)
# ---------------------------------------------------------------------------


def umm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a @ b with the contraction unrolled over the static last dim of a.

    Emits k broadcast multiply-adds instead of a dot kernel; batched over
    leading dims of either operand.
    """
    k = a.shape[-1]
    out = a[..., :, 0:1] * b[..., 0:1, :]
    for i in range(1, k):
        out = out + a[..., :, i : i + 1] * b[..., i : i + 1, :]
    return out


def umv(a: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """a @ v (matrix-vector), contraction unrolled over the static last dim."""
    k = a.shape[-1]
    out = a[..., :, 0] * v[..., 0:1]
    for i in range(1, k):
        out = out + a[..., :, i] * v[..., i : i + 1]
    return out


def _t(m: jnp.ndarray) -> jnp.ndarray:
    return jnp.swapaxes(m, -1, -2)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def exp3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exponential with the K@K square unrolled (so3.exp_so3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    small = theta < 1e-6
    safe_t = jnp.where(small, jnp.ones_like(theta), theta)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe_t) / safe_t)
    b = jnp.where(
        small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_t)) / (safe_t * safe_t)
    )
    K = skew(w)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + a[..., None, None] * K + b[..., None, None] * umm(K, K)


def boxplus(state: State, dx: jnp.ndarray) -> State:
    """Manifold retraction with unrolled 3x3 products (state.boxplus)."""
    rot = umm(state.rot, exp3(dx[..., 0:3]))
    return State(rot=rot, lin=state.lin + dx[..., 3:DIM_STATE])


def inv3(m: jnp.ndarray) -> jnp.ndarray:
    """Adjugate inverse of [..., 3, 3] (already elementwise in eskf._inv3)."""
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


def _inv_schur(m: jnp.ndarray, k: int, inv_a, inv_s) -> jnp.ndarray:
    """Block inverse via the Schur complement of the leading k x k block."""
    A = m[..., 0:k, 0:k]
    B = m[..., 0:k, k:]
    C = m[..., k:, 0:k]
    D = m[..., k:, k:]
    Ai = inv_a(A)
    AiB = umm(Ai, B)
    CAi = umm(C, Ai)
    Si = inv_s(D - umm(C, AiB))
    TL = Ai + umm(umm(AiB, Si), CAi)
    TR = -umm(AiB, Si)
    BL = -umm(Si, CAi)
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([BL, Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def inv6(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 6x6 inverse (Schur over 3+3), all elementwise."""
    return _inv_schur(m, 3, inv3, inv3)


def inv9(m: jnp.ndarray) -> jnp.ndarray:
    return _inv_schur(m, 3, inv3, inv6)


def inv18(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 18x18 inverse (nested Schur, SPD-safe), elementwise."""
    return _inv_schur(m, 9, inv9, inv9)


# ---------------------------------------------------------------------------
# Predict: sparse F application (never materializes the 30x30 F)
# ---------------------------------------------------------------------------


def predict(
    state: State,
    cov: jnp.ndarray,
    q_diag: jnp.ndarray,
    dt_mean: jnp.ndarray,
    dt_cov: jnp.ndarray,
) -> Tuple[State, jnp.ndarray]:
    """Dual-clock predict (eskf.cc:64-89, KILO.cc:110-115), elementwise.

    F = I except (eskf.cc:72-81):
      F[0:3,0:3]  = Exp(-dt w)          F[0:3,21:24]  = dt I
      F[3:6,6:9]  = dt I
      F[6:9,0:3]  = -dt R [a]x          F[6:9,15:18] = dt I
      F[6:9,18:21] = dt R
    so F P F^T touches only row/column blocks 0:9.
    """
    dtype = cov.dtype
    dt_c = jnp.asarray(dt_cov, dtype=dtype)
    dtb = dt_c[..., None, None]
    rot, w, a = state.rot, state.imu_w, state.imu_a
    E = exp3(-dt_c[..., None] * w)                      # [...,3,3]
    A3 = -dtb * umm(rot, skew(a))                       # [...,3,3]
    Et, A3t, Rt = _t(E), _t(A3), _t(rot)

    # Y = P F^T : only columns 0:9 change.
    def cols(P):
        c0 = umm(P[..., :, 0:3], Et) + dtb * P[..., :, 21:24]
        c3 = P[..., :, 3:6] + dtb * P[..., :, 6:9]
        c6 = (
            P[..., :, 6:9]
            + umm(P[..., :, 0:3], A3t)
            + dtb * P[..., :, 15:18]
            + dtb * umm(P[..., :, 18:21], Rt)
        )
        return jnp.concatenate([c0, c3, c6, P[..., :, 9:]], axis=-1)

    # Z = F Y : only rows 0:9 change.
    def rows(Y):
        r0 = umm(E, Y[..., 0:3, :]) + dtb * Y[..., 21:24, :]
        r3 = Y[..., 3:6, :] + dtb * Y[..., 6:9, :]
        r6 = (
            Y[..., 6:9, :]
            + umm(A3, Y[..., 0:3, :])
            + dtb * Y[..., 15:18, :]
            + dtb * umm(rot, Y[..., 18:21, :])
        )
        return jnp.concatenate([r0, r3, r6, Y[..., 9:, :]], axis=-2)

    q_mat = jnp.eye(DIM_STATE, dtype=dtype) * q_diag    # diag embed, constant
    new_cov = rows(cols(cov)) + (dt_c * dt_c)[..., None, None] * q_mat

    # Mean over dt_mean (getFunctionf, eskf.cc:64-70) via boxplus.
    dt_m = jnp.asarray(dt_mean, dtype=dtype)[..., None]
    acc_w = umv(rot, a) + state.grav
    dx = jnp.concatenate(
        [
            dt_m * w,
            dt_m * state.vel,
            dt_m * acc_w,
            jnp.zeros(state.lin.shape[:-1] + (21,), dtype=dtype),
        ],
        axis=-1,
    )
    return boxplus(state, dx), new_cov


# ---------------------------------------------------------------------------
# IMU update (structured H; eskf.cc:125-135)
# ---------------------------------------------------------------------------


def update_by_imu(
    state: State,
    cov: jnp.ndarray,
    z6: jnp.ndarray,
    r6: jnp.ndarray,
    gate: jnp.ndarray = None,
) -> Tuple[State, jnp.ndarray]:
    """eskf.update_by_imu with every product unrolled (elementwise)."""
    dtype = cov.dtype
    pht = cov[..., :, 9:15] + cov[..., :, 18:24]        # P H^T  [...,30,6]
    hp = cov[..., 9:15, :] + cov[..., 18:24, :]          # H P    [...,6,30]
    hpht = pht[..., 9:15, :] + pht[..., 18:24, :]        # [...,6,6]
    r6 = jnp.asarray(r6, dtype=dtype)
    s = hpht + jnp.eye(6, dtype=dtype) * r6[..., None, :]
    k = umm(pht, inv6(s))                                # [...,30,6]
    if gate is not None:
        k = k * gate[..., None, None]
    dx = umv(k, z6)
    new_state = boxplus(state, dx)
    new_cov = cov - umm(k, hp)
    return new_state, new_cov


# ---------------------------------------------------------------------------
# Kinematic + IMU update (KILO.cc:260-314, eskf.cc:137-145)
# ---------------------------------------------------------------------------


def update_by_kin_imu(
    state: State,
    cov: jnp.ndarray,
    h: jnp.ndarray,
    z: jnp.ndarray,
    r: jnp.ndarray,
    gate: jnp.ndarray = None,
) -> Tuple[State, jnp.ndarray]:
    """Dense 18-row update with unrolled products + closed-form 18x18 inverse.

    H's only nonzero column blocks are rot(0:3), vel(6:9), ba(9:12),
    bw(12:15), imu_a(18:21), imu_w(21:24) (build_kin_obs), so P H^T and H P
    contract over those 18 columns only.
    """
    dtype = cov.dtype

    def active_cols(m):
        return jnp.concatenate(
            [m[..., :, 0:3], m[..., :, 6:15], m[..., :, 18:24]], axis=-1
        )

    def active_rows(m):
        return jnp.concatenate(
            [m[..., 0:3, :], m[..., 6:15, :], m[..., 18:24, :]], axis=-2
        )

    hb = active_cols(h)                                  # [...,18,18]
    pht = umm(active_cols(cov), _t(hb))                  # P H^T   [...,30,18]
    s = umm(hb, active_rows(pht)) + jnp.eye(18, dtype=dtype) * r[..., None, :]
    k = umm(pht, inv18(s))                               # [...,30,18]
    if gate is not None:
        k = k * gate[..., None, None]
    dx = umv(k, z)
    new_state = boxplus(state, dx)
    new_cov = cov - umm(k, umm(hb, active_rows(cov)))
    return new_state, new_cov


def build_kin_obs(
    state: State,
    acc: jnp.ndarray,
    gyr: jnp.ndarray,
    foot_pos: jnp.ndarray,   # [..., 4, 3]
    foot_vel: jnp.ndarray,   # [..., 4, 3]
    contact: jnp.ndarray,    # [..., 4] bool
    noise,
    gravity_over_acc_norm: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """eskf.build_kin_obs rebuilt from concatenated blocks (no scatter/dots).

    Same 18-row layout: rows 0:6 IMU (constant H blocks), rows 6+3f:9+3f the
    stance-velocity observation of foot f (KILO.cc:292-309).
    """
    dtype = state.lin.dtype
    batch = state.lin.shape[:-1]
    rot = state.rot
    eye3 = jnp.eye(3, dtype=dtype)
    z3 = jnp.zeros((3, 3), dtype=dtype)

    # Constant IMU rows: I3 at (ba, imu_a) / (bw, imu_w).
    rows_acc = jnp.concatenate([z3, z3, z3, eye3, z3, z3, eye3, z3, z3, z3], axis=-1)
    rows_gyr = jnp.concatenate([z3, z3, z3, z3, eye3, z3, z3, eye3, z3, z3], axis=-1)
    h_imu = jnp.broadcast_to(
        jnp.concatenate([rows_acc, rows_gyr], axis=-2), batch + (6, DIM_STATE)
    )

    w_skew = skew(state.imu_w)                                   # [...,3,3]
    wxp_v = umv(w_skew[..., None, :, :], foot_pos) + foot_vel    # [...,4,3]
    c = contact.astype(dtype)
    h_rot = -umm(rot[..., None, :, :], skew(wxp_v))              # [...,4,3,3]
    h_w = -umm(rot[..., None, :, :], skew(foot_pos))
    z_foot = -state.vel[..., None, :] - umv(rot[..., None, :, :], wxp_v)

    cm = c[..., :, None, None]
    zpad = jnp.zeros(batch + (4, 3, 3), dtype=dtype)
    eye_f = jnp.broadcast_to(eye3, batch + (4, 3, 3)) * cm
    h_feet = jnp.concatenate(
        [h_rot * cm, zpad, eye_f, zpad, zpad, zpad, zpad, h_w * cm, zpad, zpad],
        axis=-1,
    )                                                            # [...,4,3,30]
    h = jnp.concatenate(
        [h_imu, h_feet.reshape(batch + (12, DIM_STATE))], axis=-2
    )

    za = gravity_over_acc_norm[..., None] * acc - state.imu_a - state.ba
    zg = gyr - state.imu_w - state.bw
    z = jnp.concatenate(
        [za, zg, (z_foot * c[..., :, None]).reshape(batch + (12,))], axis=-1
    )

    r_imu = jnp.broadcast_to(noise.imu_meas_r, batch + (6,))
    r_feet = jnp.where(
        (c[..., :, None] > 0),
        jnp.broadcast_to(noise.kin_meas_noise, batch + (4, 3)),
        jnp.ones(batch + (4, 3), dtype=dtype),
    ).reshape(batch + (12,))
    r = jnp.concatenate([r_imu, r_feet], axis=-1)

    mask = jnp.concatenate(
        [
            jnp.ones(batch + (6,), dtype=bool),
            jnp.repeat(contact, 3, axis=-1),
        ],
        axis=-1,
    )
    return h, z, r, mask


# ---------------------------------------------------------------------------
# LiDAR point update via per-bucket sufficient statistics
# ---------------------------------------------------------------------------

N_FEAT = 40  # 27 (vec n (x) [p]x) + 3 (n) + 9 (vec n (x) p) + 1 (n.c)


def point_suffstats(
    p_i: jnp.ndarray,      # [..., NB, P, 3] imu-frame points
    normal: jnp.ndarray,   # [..., NB, P, 3] matched plane normals
    center: jnp.ndarray,   # [..., NB, P, 3] matched plane centers
    r: jnp.ndarray,        # [..., NB, P] measurement variances
    matched: jnp.ndarray,  # [..., NB, P] validity (incl. bucket gate)
) -> jnp.ndarray:
    """Per-bucket normal-equation sufficient statistics S = sum_n w X X^T.

    One batched [NB, P, 40] x [NB, P, 40] contraction (MXU) replaces the
    per-bucket in-chain reductions.  Row-major conventions: feature block
    0:27 is Mt[i, 3c+b] = n_c [p]x_{i,b} flattened as 9i + (3c+b); block
    30:39 is v[3c+a] = n_c p_a.
    """
    dtype = p_i.dtype
    w = matched.astype(dtype) / (r + _R_JITTER)          # [..., NB, P]
    x = point_features(p_i, normal, center)              # [..., NB, P, 40]
    xw = x * w[..., None]
    return jnp.einsum("...pi,...pj->...ij", xw, x)        # [..., NB, 40, 40]


def point_features(
    p_i: jnp.ndarray,      # [..., 3] imu-frame points
    normal: jnp.ndarray,   # [..., 3]
    center: jnp.ndarray,   # [..., 3]
) -> jnp.ndarray:
    """Per-point 40-feature vector X (see point_suffstats conventions)."""
    sp = skew(p_i)
    mt = (normal[..., None, :, None] * sp[..., :, None, :]).reshape(
        p_i.shape[:-1] + (27,)
    )
    v = (normal[..., :, None] * p_i[..., None, :]).reshape(p_i.shape[:-1] + (9,))
    d = jnp.sum(normal * center, axis=-1, keepdims=True)
    return jnp.concatenate([mt, normal, v, d], axis=-1)


def point_suffstats_compact(
    p_i: jnp.ndarray,      # [C, 3] compacted imu-frame points
    normal: jnp.ndarray,   # [C, 3]
    center: jnp.ndarray,   # [C, 3]
    r: jnp.ndarray,        # [C]
    matched: jnp.ndarray,  # [C]
    bidx: jnp.ndarray,     # [C] owning bucket (out-of-range = dropped)
    nb: int,
) -> jnp.ndarray:
    """point_suffstats over mask-compacted rows.

    The bucket segmentation is a one-hot matmul (MXU) rather than a
    scatter-add: [NB, C] @ [C, 1600] with C ~ 3.5k is trivial MXU work,
    while a 23 MB scatter-add serializes on HBM."""
    dtype = p_i.dtype
    w = matched.astype(dtype) / (r + _R_JITTER)
    x = point_features(p_i, normal, center)               # [C, 40]
    outer = (x * w[:, None])[:, :, None] * x[:, None, :]  # [C, 40, 40]
    onehot = (
        bidx[None, :] == jnp.arange(nb, dtype=bidx.dtype)[:, None]
    ).astype(dtype)                                       # [NB, C]
    s40 = onehot @ outer.reshape(-1, N_FEAT * N_FEAT)     # [NB, 1600]
    return s40.reshape(nb, N_FEAT, N_FEAT)


def point_update_from_stats(
    state: State,
    cov: jnp.ndarray,
    s40: jnp.ndarray,      # [..., 40, 40] this bucket's sufficient statistics
) -> Tuple[State, jnp.ndarray]:
    """Information-form point update from S (eskf.update_by_points semantics).

    Phi(R, t) [40, 7] maps features to [h (6 cols), z (1 col)]:
        rows 0:27  -> col i gets Rf[q]      (h_top = Mt Rf)
        rows 27:30 -> cols 3:6 = I3, col 6 = -t
        rows 30:39 -> col 6 = -Rf           (z = -v.Rf - n.t + d)
        row  39    -> col 6 = 1
    so Phi^T S Phi = [[A, b], [b^T, sum w z^2]].  Empty buckets give S = 0
    -> A = 0, b = 0 -> dx = 0, cov unchanged (no-op, like the reference's
    skip on zero matches).
    """
    dtype = cov.dtype
    batch = cov.shape[:-2]
    rf = state.rot.reshape(batch + (9,))                 # Rf[3c+b] = R[c,b]
    eye3 = jnp.eye(3, dtype=dtype)
    zeros27_4 = jnp.zeros(batch + (27, 4), dtype=dtype)
    top = jnp.concatenate(
        [
            (eye3[:, None, :] * rf[..., :, None]).reshape(batch + (27, 3)),
            zeros27_4,
        ],
        axis=-1,
    )                                                    # [..., 27, 7]
    mid = jnp.concatenate(
        [
            jnp.zeros(batch + (3, 3), dtype=dtype),
            jnp.broadcast_to(eye3, batch + (3, 3)),
            -state.pos[..., :, None],
        ],
        axis=-1,
    )                                                    # [..., 3, 7]
    vrow = jnp.concatenate(
        [jnp.zeros(batch + (9, 6), dtype=dtype), -rf[..., :, None]], axis=-1
    )                                                    # [..., 9, 7]
    last = jnp.concatenate(
        [
            jnp.zeros(batch + (1, 6), dtype=dtype),
            jnp.ones(batch + (1, 1), dtype=dtype),
        ],
        axis=-1,
    )                                                    # [..., 1, 7]
    phi = jnp.concatenate([top, mid, vrow, last], axis=-2)  # [..., 40, 7]

    nq = umm(_t(phi), umm(s40, phi))                     # [..., 7, 7]
    a66 = nq[..., 0:6, 0:6]
    b6 = nq[..., 0:6, 6]

    p66 = cov[..., 0:6, 0:6]
    g6 = inv6(jnp.eye(6, dtype=dtype) + umm(a66, p66))
    g6_b = umv(g6, b6)
    g6_a = umm(g6, a66)
    p_left = cov[..., :, 0:6]
    dx = umv(p_left, g6_b)
    kh_p = umm(umm(p_left, g6_a), cov[..., 0:6, :])
    return boxplus(state, dx), cov - kh_p
