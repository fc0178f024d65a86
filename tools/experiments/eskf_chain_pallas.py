"""ARCHIVED EXPERIMENT — superseded by ops/pallas/chain_stats.py.

This was the round-1 per-point fused ESKF chain kernel.  It is correct in
interpret mode but Mosaic compile time for its shape was pathological
(>19 min; docs/PERF_NOTES.md), so production ships the sufficient-statistics
kernel (chain_stats.py) instead.  Kept for the compile-bisect findings
documented in PERF_NOTES; not imported by the package.

Original description — fused Pallas kernel: the entire per-scan ESKF
chain in ONE kernel.

The sequential predict/update recursion over ~56 time-buckets is the
latency floor of the filter: expressed in plain XLA it emits ~20 small
kernels per bucket, and on targets with tens-of-microseconds kernel-launch
overhead that alone costs hundreds of milliseconds per scan.  This kernel
runs the complete chain — per-bucket covariance/mean propagation
(eskf.cc:64-89), the structured IMU update (eskf.cc:125-135), and the
information-form LiDAR point update (the 6x6-solve equivalent of
eskf.cc:91-123) — inside a single ``pallas_call``: every 30x30 product hits
the MXU, the 6x6 inverses are unrolled Gauss-Jordan on the VPU, and all
state stays in VMEM for the whole scan.

Semantics are identical to filter_deferred._chain_jax (IMU mode); the
equivalence test is tests/test_pallas_chain.py.  Kinematic mode currently
uses the lax.scan chain.
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

_R_JITTER = 1e-4  # matches eskf._R_JITTER / the reference's eskf.cc:100


# --------------------------- in-kernel math --------------------------------


def _skew(v):
    x, y, z = v[0], v[1], v[2]
    return jnp.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]], dtype=v.dtype)



def _mm(a, b):
    """Matmul with the contraction unrolled over a static small k — Mosaic
    on this rig rejects dot_general with fused (non-constant) accumulators,
    so all in-kernel matrix products are explicit multiply-add chains."""
    k = a.shape[-1]
    out = a[..., :, 0:1] * b[0:1, :]
    for i in range(1, k):
        out = out + a[..., :, i : i + 1] * b[i : i + 1, :]
    return out


def _mv(a, v):
    """Matrix-vector product, contraction unrolled (static small k)."""
    k = v.shape[0]
    out = a[..., :, 0] * v[0]
    for i in range(1, k):
        out = out + a[..., :, i] * v[i]
    return out


def _exp3(w):
    t2 = jnp.sum(w * w)
    t = jnp.sqrt(t2)
    small = t < 1e-6
    ts = jnp.where(small, 1.0, t)
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(ts) / ts)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(ts)) / (ts * ts))
    K = _skew(w)
    return jnp.eye(3, dtype=w.dtype) + a * K + b * _mm(K, K)


def _inv_gj(M, n):
    """Unrolled Gauss-Jordan inverse of an n x n matrix (no pivoting; the
    innovation matrices here are identity-plus-PSD so diagonals stay away
    from zero).  Written without value `.at[...]` updates, which this
    Pallas TPU lowering turns into unsupported scatters — row replacement
    uses static one-hot masks instead."""
    A = jnp.concatenate([M, jnp.eye(n, dtype=M.dtype)], axis=1)  # [n, 2n]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    for k in range(n):
        e_k = (rows == k).astype(M.dtype)                        # [n] one-hot
        piv = A[k, k]
        row = A[k] / piv
        A = A * (1.0 - e_k)[:, None] + e_k[:, None] * row[None, :]
        col = A[:, k] * (1.0 - e_k)
        A = A - col[:, None] * row[None, :]
    return A[:, n:]


def _boxplus(rot, lin, dx):
    rot = _mm(rot, _exp3(dx[0:3]))
    return rot, lin + dx[3:30]


def _predict(rot, lin, cov, q_diag, dt_mean, dt_cov):
    """predict (eskf.cc:64-89) with the dual-clock call pattern."""
    imu_a = lin[15:18]
    imu_w = lin[18:21]
    dtype = cov.dtype
    eye3 = jnp.eye(3, dtype=dtype)

    # Covariance with dt_cov using the pre-propagation state.  F = I + D
    # where D is nonzero only in rows 0:9 (eskf.cc:72-81), so
    # F P F^T = Q1 + (D Q1^T)^T with Q1 = P + D P — a handful of k=3
    # products instead of two full 30-wide chains (Mosaic aborts on the
    # fully-unrolled version's code size).
    a_blk = _exp3(-dt_cov * imu_w) - eye3        # rows 0:3 @ cols 0:3
    v_blk = -dt_cov * _mm(rot, _skew(imu_a))     # rows 6:9 @ cols 0:3
    dt_r = dt_cov * rot                          # rows 6:9 @ cols 18:21

    def d_times(m):
        """D @ m for [30, 30] m (rows 0:9 of the result)."""
        r0 = _mm(a_blk, m[0:3, :]) + dt_cov * m[21:24, :]
        r1 = dt_cov * m[6:9, :]
        r2 = (
            _mm(v_blk, m[0:3, :])
            + dt_cov * m[15:18, :]
            + _mm(dt_r, m[18:21, :])
        )
        return jnp.concatenate(
            [r0, r1, r2, jnp.zeros((21, 30), dtype=dtype)], axis=0
        )

    q1 = cov + d_times(cov)
    cov = q1 + d_times(q1.T).T
    cov = cov + (dt_cov * dt_cov) * (jnp.eye(30, dtype=dtype) * q_diag[None, :])

    # Mean with dt_mean.
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


def _update_imu(rot, lin, cov, acc, gyr, imu_r, g_over_an, gate):
    """Structured IMU update (eskf.cc:125-135), gain gated for padded slots.

    H^T is realized as a selection matrix (columns e_{9+j} + e_{18+j}) and
    everything flows through matmuls: Mosaic on this target crashes when
    the Gauss-Jordan inverse consumes values with sliced/offset layouts,
    but accepts matmul-produced operands.
    """
    dtype = cov.dtype
    za = g_over_an * acc - lin[15:18] - lin[6:9]
    zg = gyr - lin[18:21] - lin[9:12]
    z6 = jnp.concatenate([za, zg])

    pht = cov[:, 9:15] + cov[:, 18:24]               # [30, 6]
    hp = cov[9:15, :] + cov[18:24, :]                # [6, 30]
    s_raw = (
        pht[9:15, :] + pht[18:24, :]
        + jnp.eye(6, dtype=dtype) * imu_r[None, :]
    )
    # Launder the sliced layout through a tiny matmul: Mosaic crashes when
    # the Gauss-Jordan inverse consumes slice-offset layouts but accepts
    # matmul-produced operands.
    s = _mm(jnp.eye(6, dtype=dtype), s_raw)
    k = _mm(pht, _inv_gj(s, 6)) * gate
    dx = _mv(k, z6)
    rot, lin = _boxplus(rot, lin, dx)
    cov = cov - _mm(k, hp)
    return rot, lin, cov


def _cross3(a, b):
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]
    )


def _update_kin(rot, lin, cov, acc, gyr, fp, fv, ct, imu_r, kin_noise,
                g_over_an, gate):
    """Kinematic + IMU update (build_kin_obs + updateByKinImu; KILO.cc:260-314,
    eskf.cc:137-145) with fixed 18-row masked shape."""
    dtype = cov.dtype
    i3 = jnp.eye(3, dtype=dtype)
    z3 = jnp.zeros((3, 3), dtype=dtype)

    za = g_over_an * acc - lin[15:18] - lin[6:9]
    zg = gyr - lin[18:21] - lin[9:12]
    h_acc = jnp.concatenate([z3, z3, z3, i3, z3, z3, i3, z3, z3, z3], axis=1)
    h_gyr = jnp.concatenate([z3, z3, z3, z3, i3, z3, z3, i3, z3, z3], axis=1)

    w = lin[18:21]
    rows = [h_acc, h_gyr]
    zs = [za, zg]
    rs = [imu_r]
    for f in range(4):
        c = ct[f]
        p = fp[f]
        v = fv[f]
        wxp_v = _cross3(w, p) + v
        h_rot = -_mm(rot, _skew(wxp_v)) * c
        h_w = -_mm(rot, _skew(p)) * c
        rows.append(
            jnp.concatenate([h_rot, z3, i3 * c, z3, z3, z3, z3, h_w, z3, z3], axis=1)
        )
        zs.append(
            (-lin[3:6] - _mv(rot, wxp_v)) * c
        )
        rs.append(jnp.where(c > 0.5, kin_noise, 1.0) * jnp.ones(3, dtype=dtype))
    h = jnp.concatenate(rows, axis=0)          # [18, 30]
    z = jnp.concatenate(zs)                    # [18]
    r = jnp.concatenate(rs)                    # [18]

    pht = _mm(cov, h.T)                                            # [30, 18]
    s = _mm(h, pht)
    s = s + jnp.eye(18, dtype=dtype) * r[None, :]
    k = _mm(pht, _inv_gj(s, 18)) * gate
    dx = _mv(k, z)
    rot, lin = _boxplus(rot, lin, dx)
    cov = cov - _mm(k, _mm(h, cov))
    return rot, lin, cov


def _cross_rows(a, b):
    """Row-wise cross product via explicit components (keeps the Pallas
    lowering free of fancy-indexing primitives)."""
    ax, ay, az = a[:, 0], a[:, 1], a[:, 2]
    bx, by, bz = b[:, 0], b[:, 1], b[:, 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=1
    )


def _update_points(rot, lin, cov, pi, n, nd, r, m):
    """Information-form point update (cf. eskf.update_by_points)."""
    dtype = cov.dtype
    rt_n = _mm(n, rot)                                            # [P,3] R^T n
    cr_u = _cross_rows(pi, rt_n)                                  # [p_i]x R^T n
    h6 = jnp.concatenate([cr_u, n], axis=1)                       # [P,6]
    p_w = _mm(pi, rot.T) + lin[0:3]
    z = -(jnp.sum(n * p_w, axis=1) - nd)                          # [P]
    w = m / (r + _R_JITTER)
    hw = h6 * w[:, None]
    # Contraction over P via broadcast+sum (constant-0 accumulator).
    A = jnp.sum(hw[:, :, None] * h6[:, None, :], axis=0)          # [6,6]
    b6 = jnp.sum(hw * z[:, None], axis=0)                         # [6]
    p66 = cov[0:6, 0:6]
    g6 = _inv_gj(jnp.eye(6, dtype=dtype) + _mm(A, p66), 6)
    p_left = cov[:, 0:6]
    dx = _mv(p_left, _mv(g6, b6))
    ga = _mm(g6, A)
    khp = _mm(_mm(p_left, ga), cov[0:6, :])

    did = jnp.sum(m) > 0.5
    didf = did.astype(dtype)
    rot2, lin2 = _boxplus(rot, lin, dx * didf)
    cov2 = cov - khp * didf
    return rot2, lin2, cov2, did, jnp.sum(m)


# ------------------------------ the kernel ----------------------------------


def _chain_kernel(
    # scalars / small params
    params_ref,    # [1, 40]: q_diag(30), imu_r(6), g_over_an, kin_noise, pad
    clocks_ref,    # [1, 2]: last_predict_t, last_update_t
    rot0_ref,      # [3, 3]
    lin0_ref,      # [1, 27]
    cov0_ref,      # [30, 30]
    # per-bucket data
    btime_ref,     # [NB, 1]
    bgate_ref,     # [NB, 1]
    etime_ref,     # [NB, K]
    egate_ref,     # [NB, K]
    eacc_ref,      # [NB, K, 3]
    egyr_ref,      # [NB, K, 3]
    efp_ref,       # [NB, K, 4, 3] foot positions (kin mode)
    efv_ref,       # [NB, K, 4, 3] foot velocities
    ect_ref,       # [NB, K, 4]    contact flags (f32 0/1)
    pi_ref,        # [NB, P, 3]
    n_ref,         # [NB, P, 3]
    nd_ref,        # [NB, P]  n . center
    r_ref,         # [NB, P]
    m_ref,         # [NB, P]  matched mask (f32 0/1)
    # outputs
    orot_ref,      # [NB, 3, 3]
    opos_ref,      # [NB, 3]
    orotcov_ref,   # [NB, 3, 3]
    oposcov_ref,   # [NB, 3, 3]
    onm_ref,       # [NB, 1]
    frot_ref,      # [3, 3]
    flin_ref,      # [1, 27]
    fcov_ref,      # [30, 30]
    fclocks_ref,   # [1, 2]
    *,
    use_kin: bool,
):
    nb = btime_ref.shape[0]
    kmax = etime_ref.shape[1]
    q_diag = params_ref[0, 0:30]
    imu_r = params_ref[0, 30:36]
    g_over_an = params_ref[0, 36]
    kin_noise = params_ref[0, 37]

    def bucket_body(b, carry):
        rot, lin, cov, lp, lu = carry
        etime = etime_ref[pl.ds(b, 1)][0]      # [K]
        egate = egate_ref[pl.ds(b, 1)][0]
        eacc = eacc_ref[pl.ds(b, 1)][0]        # [K, 3]
        egyr = egyr_ref[pl.ds(b, 1)][0]
        if use_kin:
            efp = efp_ref[pl.ds(b, 1)][0]      # [K, 4, 3]
            efv = efv_ref[pl.ds(b, 1)][0]
            ect = ect_ref[pl.ds(b, 1)][0]      # [K, 4]
        for k in range(kmax):
            t = etime[k]
            g = egate[k]
            rot, lin, cov = _predict(rot, lin, cov, q_diag, (t - lp) * g, (t - lu) * g)
            if use_kin:
                rot, lin, cov = _update_kin(
                    rot, lin, cov, eacc[k], egyr[k], efp[k], efv[k], ect[k],
                    imu_r, kin_noise, g_over_an, g,
                )
            else:
                rot, lin, cov = _update_imu(
                    rot, lin, cov, eacc[k], egyr[k], imu_r, g_over_an, g
                )
            lp = jnp.where(g > 0.5, t, lp)
            lu = jnp.where(g > 0.5, t, lu)

        t = btime_ref[pl.ds(b, 1)][0, 0]
        g = bgate_ref[pl.ds(b, 1)][0, 0]
        rot, lin, cov = _predict(rot, lin, cov, q_diag, (t - lp) * g, (t - lu) * g)
        lp = jnp.where(g > 0.5, t, lp)
        mvec = m_ref[pl.ds(b, 1)][0] * g
        rot, lin, cov, did, nm = _update_points(
            rot, lin, cov,
            pi_ref[pl.ds(b, 1)][0], n_ref[pl.ds(b, 1)][0],
            nd_ref[pl.ds(b, 1)][0], r_ref[pl.ds(b, 1)][0], mvec,
        )
        lu = jnp.where((g > 0.5) & did, t, lu)

        orot_ref[pl.ds(b, 1)] = rot[None]
        opos_ref[pl.ds(b, 1)] = lin[0:3][None]
        orotcov_ref[pl.ds(b, 1)] = cov[0:3, 0:3][None]
        oposcov_ref[pl.ds(b, 1)] = cov[3:6, 3:6][None]
        onm_ref[pl.ds(b, 1)] = nm.reshape(1, 1)
        return rot, lin, cov, lp, lu

    rot, lin, cov, lp, lu = jax.lax.fori_loop(
        0, nb, bucket_body,
        (rot0_ref[:], lin0_ref[0], cov0_ref[:], clocks_ref[0, 0], clocks_ref[0, 1]),
    )
    frot_ref[:] = rot
    flin_ref[0] = lin
    fcov_ref[:] = cov
    fclocks_ref[0] = jnp.stack([lp, lu])  # scalar VMEM stores are unsupported


def _chain_kernel_grid(
    params_ref,    # [1, 40] (full)
    clocks_ref,    # [1, 2]  (full)
    rot0_ref,      # [3, 3]  (full)
    lin0_ref,      # [1, 27] (full)
    cov0_ref,      # [30, 30] (full)
    btime_ref,     # [1, 1, 1]   per-bucket block (unit axes keep the
    bgate_ref,     # [1, 1, 1]    last-two-dims tiling rule satisfied)
    etime_ref,     # [1, 1, K]
    egate_ref,     # [1, 1, K]
    eacc_ref,      # [1, K, 3]
    egyr_ref,      # [1, K, 3]
    efp_ref,       # [1, K, 4, 3]
    efv_ref,       # [1, K, 4, 3]
    ect_ref,       # [1, K, 4]
    pi_ref,        # [1, P, 3]
    n_ref,         # [1, P, 3]
    nd_ref,        # [1, 1, P]
    r_ref,         # [1, 1, P]
    m_ref,         # [1, 1, P]
    orot_ref,      # [1, 3, 3]  per-bucket output block
    opos_ref,      # [1, 1, 3]
    orotcov_ref,   # [1, 3, 3]
    oposcov_ref,   # [1, 3, 3]
    onm_ref,       # [1, 1, 1]
    frot_ref,      # [3, 3]   (full; written on the last step)
    flin_ref,      # [1, 27]
    fcov_ref,      # [30, 30]
    fclocks_ref,   # [1, 2]
    rot_s,         # scratch [3, 3]   — persists across grid steps
    lin_s,         # scratch [1, 27]
    cov_s,         # scratch [30, 30]
    clk_s,         # scratch [1, 2]
    *,
    use_kin: bool,
):
    """Grid variant: one sequential grid step per bucket; the filter state
    persists in VMEM scratch across steps.  All indexing is static — the
    per-bucket slicing happens in BlockSpec index maps."""
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    kmax = etime_ref.shape[2]
    q_diag = params_ref[0, 0:30]
    imu_r = params_ref[0, 30:36]
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
        rot, lin, cov = _predict(rot, lin, cov, q_diag, (t - lp) * g, (t - lu) * g)
        if use_kin:
            rot, lin, cov = _update_kin(
                rot, lin, cov, eacc_ref[0, k], egyr_ref[0, k],
                efp_ref[0, k], efv_ref[0, k], ect_ref[0, k],
                imu_r, kin_noise, g_over_an, g,
            )
        else:
            rot, lin, cov = _update_imu(
                rot, lin, cov, eacc_ref[0, k], egyr_ref[0, k],
                imu_r, g_over_an, g,
            )
        lp = jnp.where(g > 0.5, t, lp)
        lu = jnp.where(g > 0.5, t, lu)

    t = btime_ref[0, 0, 0]
    g = bgate_ref[0, 0, 0]
    rot, lin, cov = _predict(rot, lin, cov, q_diag, (t - lp) * g, (t - lu) * g)
    lp = jnp.where(g > 0.5, t, lp)
    mvec = m_ref[0, 0] * g
    rot, lin, cov, did, nm = _update_points(
        rot, lin, cov, pi_ref[0], n_ref[0], nd_ref[0, 0], r_ref[0, 0], mvec
    )
    lu = jnp.where((g > 0.5) & did, t, lu)

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
def _chain_call(params_vec, clocks, rot0, lin0, cov0, btime, bgate,
                etime, egate, eacc, egyr, efp, efv, ect,
                pi, n, nd, r, m, interpret=False, use_kin=False):
    nb, kmax = etime.shape
    p = pi.shape[1]
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
        per_bucket((1, 1)), per_bucket((1, 1)),
        per_bucket((1, kmax)), per_bucket((1, kmax)),
        per_bucket((kmax, 3)), per_bucket((kmax, 3)),
        per_bucket((kmax, 4, 3)), per_bucket((kmax, 4, 3)),
        per_bucket((kmax, 4)),
        per_bucket((p, 3)), per_bucket((p, 3)),
        per_bucket((1, p)), per_bucket((1, p)), per_bucket((1, p)),
    ]
    out_specs = (
        per_bucket((3, 3)), per_bucket((1, 3)), per_bucket((3, 3)),
        per_bucket((3, 3)), per_bucket((1, 1)),
        full((3, 3)), full((1, 27)), full((30, 30)), full((1, 2)),
    )
    return pl.pallas_call(
        functools.partial(_chain_kernel_grid, use_kin=use_kin),
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
    )(params_vec, clocks, rot0, lin0, cov0,
      btime.reshape(nb, 1, 1), bgate.reshape(nb, 1, 1),
      etime.reshape(nb, 1, kmax), egate.reshape(nb, 1, kmax),
      eacc, egyr, efp, efv, ect, pi, n,
      nd.reshape(nb, 1, p), r.reshape(nb, 1, p), m.reshape(nb, 1, p))


def run_chain(
    carry: FilterCarry,
    packet,
    params,
    p_i: jnp.ndarray,
    normal: jnp.ndarray,
    center: jnp.ndarray,
    r_meas: jnp.ndarray,
    matched: jnp.ndarray,
    use_kin: bool = False,
) -> Tuple[FilterCarry, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drive the fused chain kernel; same contract as _chain_jax."""
    f32 = jnp.float32
    nb = packet.bucket_time.shape[0]
    params_vec = jnp.zeros((1, 40), dtype=f32)
    params_vec = params_vec.at[0, 0:30].set(params.noise.q_diag)
    params_vec = params_vec.at[0, 30:36].set(params.noise.imu_meas_r)
    params_vec = params_vec.at[0, 36].set(params.g_over_acc_norm)
    params_vec = params_vec.at[0, 37].set(params.noise.kin_meas_noise)
    clocks = jnp.stack([carry.last_predict_t, carry.last_update_t]).reshape(1, 2)

    nd = jnp.sum(normal * center, axis=-1)  # [NB, P]
    interpret = jax.default_backend() == "cpu"
    (orot, opos, orotcov, oposcov, onm, frot, flin, fcov, fclocks) = _chain_call(
        params_vec, clocks,
        carry.state.rot, carry.state.lin.reshape(1, 27), carry.cov,
        packet.bucket_time.reshape(nb, 1).astype(f32),
        packet.bucket_mask.reshape(nb, 1).astype(f32),
        packet.imu_time.astype(f32),
        packet.imu_mask.astype(f32),
        packet.imu_acc.astype(f32),
        packet.imu_gyr.astype(f32),
        packet.foot_pos.astype(f32),
        packet.foot_vel.astype(f32),
        packet.contact.astype(f32),
        p_i, normal, nd, r_meas, matched.astype(f32),
        interpret=interpret, use_kin=use_kin,
    )
    new_carry = carry._replace(
        state=State(rot=frot, lin=flin[0]),
        cov=fcov,
        last_predict_t=fclocks[0, 0],
        last_update_t=fclocks[0, 1],
    )
    return new_carry, orot, opos.reshape(-1, 3), orotcov, oposcov, onm.reshape(-1).astype(jnp.int32)
