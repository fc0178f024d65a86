"""Fused Pallas chain kernel v2: per-bucket sufficient statistics, no points.

The whole sequential per-scan ESKF recursion (predict (eskf.cc:64-89), the
structured IMU update (eskf.cc:125-135) or the 18-row kinematic update
(KILO.cc:260-314), and the information-form LiDAR point update equivalent to
eskf.cc:91-123) runs inside ONE ``pallas_call``, one sequential grid step per
time-bucket, the filter state carried in VMEM scratch.

This replaces ops/pallas/eskf_chain.py's kernel, which consumed raw per-point
match outputs ([NB, P, ...]) and whose in-kernel point reductions +
Gauss-Jordan inverses drove Mosaic compile time past 19 minutes on the
round-1 rig (docs/PERF_NOTES.md).  Here the per-point work is gone entirely:
like core/filter_deferred._chain_fused_core, the point update consumes only
each bucket's 40x40 normal-equation sufficient statistics S (see
core/eskf_fused.point_suffstats — computed once per scan as a batched MXU
contraction), so the kernel touches [40, 40] + event rows per bucket and the
program stays small.

Mosaic survival rules baked in (empirically collected, docs/PERF_NOTES.md):
no value ``.at[...]`` updates, no ``dot_general`` (static-k unrolled
multiply-add chains), no Gauss-Jordan (closed-form adjugate/Schur inverses
on scalar extracts), no reshapes, identities from broadcasted_iota, no
scalar VMEM stores, no per-point blocks.

State conventions match core/state.py: ``lin`` is the 27-dim non-rotation
block [pos(0:3) vel(3:6) ba(6:9) bw(9:12) grav(12:15) imu_a(15:18)
imu_w(18:21) bv(21:24) contact(24:27)]; error-state dx is 30-dim with rot
first.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.filter import FilterCarry
from ...core.state import State

N_FEAT = 40  # matches core/eskf_fused.N_FEAT


# --------------------------- in-kernel helpers ------------------------------


def _eye(n: int, dtype) -> jnp.ndarray:
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r == c).astype(dtype)


def _mm(a, b):
    """a @ b, contraction unrolled over the static small inner dim."""
    k = a.shape[-1]
    out = a[..., :, 0:1] * b[0:1, :]
    for i in range(1, k):
        out = out + a[..., :, i : i + 1] * b[i : i + 1, :]
    return out


def _mv(a, v):
    """a @ v (matrix-vector), contraction unrolled."""
    k = v.shape[0]
    out = a[..., :, 0] * v[0]
    for i in range(1, k):
        out = out + a[..., :, i] * v[i]
    return out


def _skew(v):
    x, y, z = v[0], v[1], v[2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y]),
            jnp.stack([z, zero, -x]),
            jnp.stack([-y, x, zero]),
        ]
    )


def _cross3(a, b):
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]
    )


def _exp3(w):
    # Explicit scalar sum: Mosaic has no lowering for short-vector
    # multi_reductions ("Offset change" in vector.multi_reduction).
    t2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    t = jnp.sqrt(t2)
    small = t < 1e-6
    ts = jnp.where(small, 1.0, t)
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(ts) / ts)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(ts)) / (ts * ts))
    K = _skew(w)
    return _eye(3, w.dtype) + a * K + b * _mm(K, K)


def _inv3(m):
    """Adjugate 3x3 inverse from scalar extracts (elementwise)."""
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
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
    return (
        jnp.stack(
            [
                jnp.stack([co00, co01, co02]),
                jnp.stack([co10, co11, co12]),
                jnp.stack([co20, co21, co22]),
            ]
        )
        * inv_det
    )


def _inv_schur(m, k, inv_a, inv_s):
    """Block inverse via the Schur complement of the leading k x k block."""
    A = m[0:k, 0:k]
    B = m[0:k, k:]
    C = m[k:, 0:k]
    D = m[k:, k:]
    Ai = inv_a(A)
    AiB = _mm(Ai, B)
    CAi = _mm(C, Ai)
    Si = inv_s(D - _mm(C, AiB))
    TL = Ai + _mm(_mm(AiB, Si), CAi)
    TR = -_mm(AiB, Si)
    BL = -_mm(Si, CAi)
    top = jnp.concatenate([TL, TR], axis=1)
    bot = jnp.concatenate([BL, Si], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _inv6(m):
    return _inv_schur(m, 3, _inv3, _inv3)


def _inv9(m):
    return _inv_schur(m, 3, _inv3, _inv6)


def _inv18(m):
    return _inv_schur(m, 9, _inv9, _inv9)


def _boxplus(rot, lin, dx):
    """Manifold retraction; lin [27] 1D, dx [30] 1D."""
    rot = _mm(rot, _exp3(dx[0:3]))
    return rot, lin + dx[3:30]


def _predict(rot, lin, cov, q_eye, dt_mean, dt_cov):
    """Dual-clock predict (eskf.cc:64-89).  F = I + D with D nonzero only in
    rows 0:9 (eskf.cc:72-81), so F P F^T = Q1 + (D Q1^T)^T, Q1 = P + D P."""
    imu_a = lin[15:18]
    imu_w = lin[18:21]
    dtype = cov.dtype

    a_blk = _exp3(-dt_cov * imu_w) - _eye(3, dtype)  # rows 0:3 @ cols 0:3
    v_blk = -dt_cov * _mm(rot, _skew(imu_a))         # rows 6:9 @ cols 0:3
    dt_r = dt_cov * rot                              # rows 6:9 @ cols 18:21

    def d_times(m):
        r0 = _mm(a_blk, m[0:3, :]) + dt_cov * m[21:24, :]
        r1 = dt_cov * m[6:9, :]
        r2 = _mm(v_blk, m[0:3, :]) + dt_cov * m[15:18, :] + _mm(dt_r, m[18:21, :])
        return jnp.concatenate(
            [r0, r1, r2, jnp.zeros((21, 30), dtype=dtype)], axis=0
        )

    q1 = cov + d_times(cov)
    cov = q1 + d_times(q1.T).T
    cov = cov + (dt_cov * dt_cov) * q_eye

    acc_w = _mv(rot, imu_a) + lin[12:15]
    dx = jnp.concatenate(
        [
            dt_mean * imu_w,
            dt_mean * lin[3:6],
            dt_mean * acc_w,
            jnp.zeros((21,), dtype=dtype),
        ]
    )
    rot, lin = _boxplus(rot, lin, dx)
    return rot, lin, cov


def _update_imu(rot, lin, cov, acc, gyr, imu_r6, g_over_an, gate):
    """Structured IMU update (eskf.cc:125-135) with the closed-form 6x6
    Schur inverse (no Gauss-Jordan)."""
    dtype = cov.dtype
    za = g_over_an * acc - lin[15:18] - lin[6:9]
    zg = gyr - lin[18:21] - lin[9:12]
    z6 = jnp.concatenate([za, zg])                       # [6]

    pht = cov[:, 9:15] + cov[:, 18:24]                   # [30, 6]
    hp = cov[9:15, :] + cov[18:24, :]                    # [6, 30]
    s = pht[9:15, :] + pht[18:24, :] + _eye(6, dtype) * imu_r6[None, :]
    k = _mm(pht, _inv6(s)) * gate                        # [30, 6]
    dx = _mv(k, z6)
    rot, lin = _boxplus(rot, lin, dx)
    cov = cov - _mm(k, hp)
    return rot, lin, cov


def _update_kin(rot, lin, cov, acc, gyr, fp, fv, ct, imu_r6, kin_noise,
                g_over_an, gate):
    """Kinematic + IMU update (KILO.cc:260-314, eskf.cc:137-145), 18 masked
    rows.  H's nonzero column blocks are rot(0:3), vel(6:9), ba(9:12),
    bw(12:15), imu_a(18:21), imu_w(21:24) in full-state indexing, so the
    update contracts over those 18 columns only (matches
    core/eskf_fused.update_by_kin_imu).  ``fp``/``fv`` are [12] flattened
    foot positions/velocities; ``ct`` [4] contact flags (f32 0/1)."""
    dtype = cov.dtype
    i3 = _eye(3, dtype)
    z3 = jnp.zeros((3, 3), dtype=dtype)

    za = g_over_an * acc - lin[15:18] - lin[6:9]
    zg = gyr - lin[18:21] - lin[9:12]
    # Active-column layout: [rot(0:3), vel(3:6), ba(6:9), bw(9:12),
    # imu_a(12:15), imu_w(15:18)].
    h_acc = jnp.concatenate([z3, z3, i3, z3, i3, z3], axis=1)
    h_gyr = jnp.concatenate([z3, z3, z3, i3, z3, i3], axis=1)

    w = lin[18:21]
    rows = [h_acc, h_gyr]
    zs = [za, zg]
    rs = [imu_r6]
    for f in range(4):
        c = ct[f]
        p = fp[3 * f : 3 * f + 3]
        v = fv[3 * f : 3 * f + 3]
        wxp_v = _cross3(w, p) + v                        # [3]
        h_rot = -_mm(rot, _skew(wxp_v)) * c
        h_w = -_mm(rot, _skew(p)) * c
        rows.append(jnp.concatenate([h_rot, i3 * c, z3, z3, z3, h_w], axis=1))
        zs.append((-lin[3:6] - _mv(rot, wxp_v)) * c)
        rs.append(jnp.where(c > 0.5, kin_noise, 1.0) * jnp.ones((3,), dtype=dtype))
    hb = jnp.concatenate(rows, axis=0)                   # [18, 18] active cols
    z = jnp.concatenate(zs)                              # [18]
    r = jnp.concatenate(rs)                              # [18]

    def acols(m):
        return jnp.concatenate([m[:, 0:3], m[:, 6:15], m[:, 18:24]], axis=1)

    def arows(m):
        return jnp.concatenate([m[0:3, :], m[6:15, :], m[18:24, :]], axis=0)

    pht = _mm(acols(cov), hb.T)                          # [30, 18]
    s = _mm(hb, arows(pht)) + _eye(18, dtype) * r[None, :]
    k = _mm(pht, _inv18(s)) * gate                       # [30, 18]
    dx = _mv(k, z)
    rot, lin = _boxplus(rot, lin, dx)
    cov = cov - _mm(k, _mm(hb, arows(cov)))
    return rot, lin, cov


def _s_phi(S, rot, pos):
    """S @ Phi(R, t) -> [40, 7], exploiting Phi's sparsity (see
    core/eskf_fused.point_update_from_stats for the feature conventions:
    rows 0:27 couple column j to rf[q] = R[q//3, q%3] at row 9j+q, rows
    27:30 are [0 I3 -t], rows 30:39 put -rf in the last column, row 39 a 1)."""
    cols = []
    for j in range(3):
        acc = None
        for q in range(9):
            term = rot[q // 3, q % 3] * S[:, 9 * j + q : 9 * j + q + 1]
            acc = term if acc is None else acc + term
        cols.append(acc)
    cols.append(S[:, 27:30])
    c6 = (
        S[:, 39:40]
        - S[:, 27:28] * pos[0]
        - S[:, 28:29] * pos[1]
        - S[:, 29:30] * pos[2]
    )
    for q in range(9):
        c6 = c6 - rot[q // 3, q % 3] * S[:, 30 + q : 31 + q]
    cols.append(c6)
    return jnp.concatenate(cols, axis=1)


def _phi_t(W, rot, pos):
    """Phi(R, t)^T @ W for [40, m] W -> [7, m] (same sparsity, on rows)."""
    rows = []
    for j in range(3):
        acc = None
        for q in range(9):
            term = rot[q // 3, q % 3] * W[9 * j + q : 9 * j + q + 1, :]
            acc = term if acc is None else acc + term
        rows.append(acc)
    rows.append(W[27:30, :])
    r6 = (
        W[39:40, :]
        - W[27:28, :] * pos[0]
        - W[28:29, :] * pos[1]
        - W[29:30, :] * pos[2]
    )
    for q in range(9):
        r6 = r6 - rot[q // 3, q % 3] * W[30 + q : 31 + q, :]
    rows.append(r6)
    return jnp.concatenate(rows, axis=0)


def _update_points_stats(rot, lin, cov, s40):
    """Information-form point update from the bucket's sufficient statistics
    (core/eskf_fused.point_update_from_stats semantics; empty buckets have
    S = 0 -> nq = [[0,0],[0,0]] -> dx = 0, cov unchanged: exact no-op)."""
    dtype = cov.dtype
    pos = lin[0:3]
    nq = _phi_t(_s_phi(s40, rot, pos), rot, pos)         # [7, 7]
    a66 = nq[0:6, 0:6]
    b6 = nq[0:6, 6]                                      # [6]

    p66 = cov[0:6, 0:6]
    g6 = _inv6(_eye(6, dtype) + _mm(a66, p66))
    p_left = cov[:, 0:6]
    dx = _mv(p_left, _mv(g6, b6))                        # [30]
    kh_p = _mm(_mm(p_left, _mm(g6, a66)), cov[0:6, :])
    rot, lin = _boxplus(rot, lin, dx)
    return rot, lin, cov - kh_p


# ------------------------------ the kernel ----------------------------------


def _kernel(
    params_ref,    # [1, 40]: q_diag(30), imu_r(6), g_over_an, kin_noise, pad
    clocks_ref,    # [1, 2]
    rot0_ref,      # [3, 3]
    lin0_ref,      # [1, 27]
    cov0_ref,      # [30, 30]
    brow_ref,      # [1, 1, 3] per-bucket: time, gate, nmatch
    etime_ref,     # [1, 1, K]
    egate_ref,     # [1, 1, K]
    eacc_ref,      # [1, K, 3]
    egyr_ref,      # [1, K, 3]
    efp_ref,       # [1, K, 12] foot positions flattened (kin mode)
    efv_ref,       # [1, K, 12]
    ect_ref,       # [1, K, 4]
    s40_ref,       # [1, 40, 40]
    orot_ref,      # [1, 3, 3] per-bucket pose outputs
    opos_ref,      # [1, 1, 3]
    orotcov_ref,   # [1, 3, 3]
    oposcov_ref,   # [1, 3, 3]
    onm_ref,       # [1, 1, 1]
    frot_ref,      # [3, 3]
    flin_ref,      # [1, 27]
    fcov_ref,      # [30, 30]
    fclocks_ref,   # [1, 2]
    rot_s,         # scratch [3, 3]
    lin_s,         # scratch [1, 27]
    cov_s,         # scratch [30, 30]
    clk_s,         # scratch [1, 2]
    *,
    use_kin: bool,
):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    kmax = etime_ref.shape[2]
    dtype = cov0_ref.dtype
    q_eye = _eye(30, dtype) * params_ref[0, 0:30][None, :]
    imu_r6 = params_ref[0, 30:36]
    g_over_an = params_ref[0, 36]
    kin_noise = params_ref[0, 37]

    @pl.when(b == 0)
    def _():
        rot_s[:] = rot0_ref[:]
        lin_s[:] = lin0_ref[:]
        cov_s[:] = cov0_ref[:]
        clk_s[:] = clocks_ref[:]

    rot, lin, cov = rot_s[:], lin_s[0], cov_s[:]
    lp, lu = clk_s[0, 0], clk_s[0, 1]

    for k in range(kmax):
        t = etime_ref[0, 0, k]
        g = egate_ref[0, 0, k]
        rot, lin, cov = _predict(rot, lin, cov, q_eye, (t - lp) * g, (t - lu) * g)
        if use_kin:
            rot, lin, cov = _update_kin(
                rot, lin, cov, eacc_ref[0, k], egyr_ref[0, k],
                efp_ref[0, k], efv_ref[0, k], ect_ref[0, k],
                imu_r6, kin_noise, g_over_an, g,
            )
        else:
            rot, lin, cov = _update_imu(
                rot, lin, cov, eacc_ref[0, k], egyr_ref[0, k],
                imu_r6, g_over_an, g,
            )
        lp = jnp.where(g > 0.5, t, lp)
        lu = jnp.where(g > 0.5, t, lu)

    t = brow_ref[0, 0, 0]
    g = brow_ref[0, 0, 1]
    nm = brow_ref[0, 0, 2]
    rot, lin, cov = _predict(rot, lin, cov, q_eye, (t - lp) * g, (t - lu) * g)
    lp = jnp.where(g > 0.5, t, lp)
    rot, lin, cov = _update_points_stats(rot, lin, cov, s40_ref[0])
    lu = jnp.where((g > 0.5) & (nm > 0.5), t, lu)

    rot_s[:] = rot
    lin_s[0] = lin
    cov_s[:] = cov
    clk_s[0] = jnp.stack([lp, lu])

    orot_ref[0] = rot
    opos_ref[0, 0] = lin[0:3]
    orotcov_ref[0] = cov[0:3, 0:3]
    oposcov_ref[0] = cov[3:6, 3:6]
    onm_ref[0, 0] = nm.reshape(1)

    @pl.when(b == nb - 1)
    def _():
        frot_ref[:] = rot
        flin_ref[0] = lin
        fcov_ref[:] = cov
        fclocks_ref[0] = jnp.stack([lp, lu])


@functools.partial(jax.jit, static_argnames=("interpret", "use_kin"))
def _chain_call(params_vec, clocks, rot0, lin0, cov0, brow,
                etime, egate, eacc, egyr, efp, efv, ect, s40,
                interpret=False, use_kin=False):
    nb = etime.shape[0]
    kmax = etime.shape[2]
    f32 = jnp.float32
    out_shapes = (
        jax.ShapeDtypeStruct((nb, 3, 3), f32),   # orot
        jax.ShapeDtypeStruct((nb, 1, 3), f32),   # opos
        jax.ShapeDtypeStruct((nb, 3, 3), f32),   # orotcov
        jax.ShapeDtypeStruct((nb, 3, 3), f32),   # oposcov
        jax.ShapeDtypeStruct((nb, 1, 1), f32),   # onm
        jax.ShapeDtypeStruct((3, 3), f32),       # frot
        jax.ShapeDtypeStruct((1, 27), f32),      # flin
        jax.ShapeDtypeStruct((30, 30), f32),     # fcov
        jax.ShapeDtypeStruct((1, 2), f32),       # fclocks
    )

    def full(shape):
        return pl.BlockSpec(shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)

    def per_bucket(shape):
        return pl.BlockSpec(
            (1,) + shape, lambda b: (b,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        full((1, 40)), full((1, 2)), full((3, 3)), full((1, 27)),
        full((30, 30)),
        per_bucket((1, 3)),
        per_bucket((1, kmax)), per_bucket((1, kmax)),
        per_bucket((kmax, 3)), per_bucket((kmax, 3)),
        per_bucket((kmax, 12)), per_bucket((kmax, 12)),
        per_bucket((kmax, 4)),
        per_bucket((N_FEAT, N_FEAT)),
    ]
    out_specs = (
        per_bucket((3, 3)), per_bucket((1, 3)), per_bucket((3, 3)),
        per_bucket((3, 3)), per_bucket((1, 1)),
        full((3, 3)), full((1, 27)), full((30, 30)), full((1, 2)),
    )

    return pl.pallas_call(
        functools.partial(_kernel, use_kin=use_kin),
        out_shape=out_shapes,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((3, 3), f32),
            pltpu.VMEM((1, 27), f32),
            pltpu.VMEM((30, 30), f32),
            pltpu.VMEM((1, 2), f32),
        ],
        interpret=interpret,
    )(params_vec, clocks, rot0, lin0, cov0, brow,
      etime, egate, eacc, egyr, efp, efv, ect, s40)


def run_chain_stats(
    carry: FilterCarry,
    packet,
    params,
    s40: jnp.ndarray,       # [NB, 40, 40]
    nmatch_b: jnp.ndarray,  # [NB] int32
    use_kin: bool = False,
    interpret=None,
) -> Tuple[FilterCarry, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drive the fused stats-chain kernel; same contract as
    filter_deferred._chain_fused_core."""
    f32 = jnp.float32
    nb, kmax = packet.imu_time.shape
    # One concatenate instead of four .at[].set updates (each its own XLA
    # fusion); layout is positional — see _chain_kernel's param reads.
    params_vec = jnp.concatenate(
        [
            params.noise.q_diag.astype(f32),
            params.noise.imu_meas_r.astype(f32),
            params.g_over_acc_norm.astype(f32)[None],
            params.noise.kin_meas_noise.astype(f32)[None],
            jnp.zeros((2,), f32),
        ]
    )[None, :]
    clocks = jnp.stack([carry.last_predict_t, carry.last_update_t]).reshape(1, 2)
    brow = jnp.stack(
        [
            packet.bucket_time.astype(f32),
            packet.bucket_mask.astype(f32),
            nmatch_b.astype(f32),
        ],
        axis=1,
    ).reshape(nb, 1, 3)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    (orot, opos, orotcov, oposcov, onm,
     frot, flin, fcov, fclocks) = _chain_call(
        params_vec, clocks,
        carry.state.rot, carry.state.lin.reshape(1, 27), carry.cov,
        brow,
        packet.imu_time.reshape(nb, 1, kmax).astype(f32),
        packet.imu_mask.reshape(nb, 1, kmax).astype(f32),
        packet.imu_acc.astype(f32),
        packet.imu_gyr.astype(f32),
        # IMU-only mode never reads the kin inputs (use_kin is a trace-time
        # switch in the kernel body): pass constant zeros so the packet's
        # foot/contact fields don't pay per-scan layout-conversion copies.
        packet.foot_pos.reshape(nb, kmax, 12).astype(f32) if use_kin
        else jnp.zeros((nb, kmax, 12), f32),
        packet.foot_vel.reshape(nb, kmax, 12).astype(f32) if use_kin
        else jnp.zeros((nb, kmax, 12), f32),
        packet.contact.astype(f32) if use_kin
        else jnp.zeros((nb, kmax, 4), f32),
        s40.astype(f32),
        interpret=interpret, use_kin=use_kin,
    )
    new_carry = carry._replace(
        state=State(rot=frot, lin=flin[0]),
        cov=fcov,
        last_predict_t=fclocks[0, 0],
        last_update_t=fclocks[0, 1],
    )
    return (
        new_carry, orot, opos.reshape(nb, 3), orotcov, oposcov,
        onm.reshape(nb).astype(jnp.int32),
    )
