"""Pallas kernels for the batched match phase (deferred pipeline).

The match phase's per-point math — body->imu->world transforms, sensor +
state covariance propagation (KILO.cc:127-140, calcBodyCov at
voxel_map.cc:22-40), voxel-key/neighbor-key construction (KILO.cc:143-178),
plane gating + probability-weighted chain selection (build_single_residual,
voxel_map.cc:363-427), measurement variance (KILO.cc:201-209), and the
40-feature sufficient-statistic vectors (core/eskf_fused.point_features) —
is ~60 XLA kernels over [C, small] tensors.  On this target every kernel in
the batched phases costs ~50-100 us regardless of FLOPs
(docs/PERF_NOTES.md), so the phase is launch-bound.  These two kernels fold
all of it into two launches; only the hash-table probe/gathers (XLA
gather/scatter is fast here) stay outside.

Layout: transposed SoA.  All per-point quantities are rows of [W, C]
arrays (components x points), so each elementwise op inside the kernel is a
[1, block] vector op at full lane utilization; blocks tile C in chunks of
512 points.  C must be a multiple of 128 (the caller pads).

Kernel 1 (keys):    pts, per-point pose -> p_i, p_w, world-frame point
                    covariance, own+neighbor voxel keys, per-candidate
                    voxel centers and probe start indices (spatial hash,
                    eigen_types.hpp:74-82).
Kernel 2 (select):  gathered candidate planes + flags -> per-point gates,
                    best-probability chain selection, measurement variance,
                    matched flags, and the (X, w X) feature rows consumed by
                    the per-bucket suffstats contraction.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEG2RAD = float(jnp.pi) / 180.0
_R_JITTER = 1e-4  # matches core/eskf_fused._R_JITTER

# par row layout (kernel 1): ext_r(9) ext_t(3) sizes(L<=4 @12) cov_rr(9 @16)
# cov_pp(9 @25) dept_err(34) beam_err(35) capacity(36) levels(37)
_P_EXT_R = 0
_P_EXT_T = 9
_P_SIZES = 12
_P_COV_RR = 16
_P_COV_PP = 25
_P_DEPT = 34
_P_BEAM = 35
_P_CAP = 36
_P_LEVELS = 37

# par row layout (kernel 2): sigma_num(0) radius_k(1) ratio(2) levels(3)
_Q_SIGMA = 0
_Q_RADIUS = 1
_Q_RATIO = 2


def _rowdot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _sym21(i, j):
    """Upper-triangle index of (i, j) in a packed symmetric 6x6."""
    i, j = min(i, j), max(i, j)
    return i * 6 + j - (i * (i + 1)) // 2


# --------------------------- kernel 1: keys ---------------------------------


def _keys_kernel(
    par_ref,      # [1, 64] f32
    pts_ref,      # [3, bs] body-frame points
    rb_ref,       # [9, bs] per-point rotation (row-major)
    pb_ref,       # [3, bs] per-point translation
    piw_ref,      # out [6, bs]: p_i(3), p_w(3)
    covs_ref,     # out [27, bs]: full world cov(9), sensor-only world
                  # cov(9), lidar-frame sensor cov(9) — all row-major
    keys_ref,     # out [6L', bs] i32: own-chain keys then neighbor keys
    vc_ref,       # out [6L', bs]: candidate voxel centers (3 per candidate)
    idx0_ref,     # out [2L', bs] i32: global probe start (lvl*C + hash)
    *,
    levels: int,
    capacity: int,
):
    f32 = pts_ref.dtype
    px = pts_ref[0:1, :]
    py = pts_ref[1:2, :]
    pz = pts_ref[2:3, :]

    def s(i):
        return par_ref[0, i]

    # p_i = ext_r @ p + ext_t
    pix = s(_P_EXT_R + 0) * px + s(_P_EXT_R + 1) * py + s(_P_EXT_R + 2) * pz + s(_P_EXT_T + 0)
    piy = s(_P_EXT_R + 3) * px + s(_P_EXT_R + 4) * py + s(_P_EXT_R + 5) * pz + s(_P_EXT_T + 1)
    piz = s(_P_EXT_R + 6) * px + s(_P_EXT_R + 7) * py + s(_P_EXT_R + 8) * pz + s(_P_EXT_T + 2)

    r = [rb_ref[i : i + 1, :] for i in range(9)]
    tb = [pb_ref[i : i + 1, :] for i in range(3)]
    pwx = r[0] * pix + r[1] * piy + r[2] * piz + tb[0]
    pwy = r[3] * pix + r[4] * piy + r[5] * piz + tb[1]
    pwz = r[6] * pix + r[7] * piy + r[8] * piz + tb[2]

    piw_ref[:] = jnp.concatenate([pix, piy, piz, pwx, pwy, pwz], axis=0)

    # ---- world-frame covariance (calcBodyCov + KILO.cc:134-140) ----
    zsafe = jnp.where(jnp.abs(pz) < 1e-8, 1e-4, pz)
    rng2 = px * px + py * py + zsafe * zsafe
    rng = jnp.sqrt(rng2)
    inv_rng = 1.0 / jnp.maximum(rng, 1e-12)
    dx = px * inv_rng
    dy = py * inv_rng
    dz = zsafe * inv_rng
    dept = s(_P_DEPT)
    beam_rad = s(_P_BEAM) * _DEG2RAD
    range_var = dept * dept
    tangent_sd = jnp.sin(beam_rad)
    tangent_var = tangent_sd * tangent_sd

    # base1 ~ [1, 1, -(dx+dy)/dz] normalized; base2 = base1 x d normalized.
    b1z = -(dx + dy) / jnp.where(jnp.abs(dz) < 1e-12, 1e-12, dz)
    n1 = 1.0 / jnp.sqrt(1.0 + 1.0 + b1z * b1z)
    b1x = n1
    b1y = n1
    b1z = b1z * n1
    c2x = b1y * dz - b1z * dy
    c2y = b1z * dx - b1x * dz
    c2z = b1x * dy - b1y * dx
    n2 = 1.0 / jnp.sqrt(jnp.maximum(c2x * c2x + c2y * c2y + c2z * c2z, 1e-24))
    b2x = c2x * n2
    b2y = c2y * n2
    b2z = c2z * n2

    # dhat = skew(d); A = rng * dhat @ [b1 b2]  ([3, 2] per point)
    a00 = rng * (-dz * b1y + dy * b1z)
    a10 = rng * (dz * b1x - dx * b1z)
    a20 = rng * (-dy * b1x + dx * b1y)
    a01 = rng * (-dz * b2y + dy * b2z)
    a11 = rng * (dz * b2x - dx * b2z)
    a21 = rng * (-dy * b2x + dx * b2y)

    d3 = [dx, dy, dz]
    a = [[a00, a01], [a10, a11], [a20, a21]]
    # body cov (lidar frame): range_var d d^T + tangent_var A A^T
    bc = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(i, 3):
            bc[i][j] = range_var * d3[i] * d3[j] + tangent_var * (
                a[i][0] * a[j][0] + a[i][1] * a[j][1]
            )
            if j != i:
                bc[j][i] = bc[i][j]

    # world: W = (R_b R_ext) bc (R_b R_ext)^T + (R_b [p_i]x) C_rr (.)^T + C_pp
    # R_b here is the per-point pose rotation; R_ext is folded by computing
    # re = rb @ ext_r rows.
    e = [s(_P_EXT_R + i) for i in range(9)]
    re = [None] * 9
    for i in range(3):
        for j in range(3):
            re[3 * i + j] = (
                r[3 * i + 0] * e[0 + j] + r[3 * i + 1] * e[3 + j] + r[3 * i + 2] * e[6 + j]
            )
    # rc = rb @ skew(p_i): skew rows from (pix, piy, piz)
    sk = [
        None, -piz, piy,
        piz, None, -pix,
        -piy, pix, None,
    ]

    def skel(i, j):
        v = sk[3 * i + j]
        return 0.0 if v is None else v

    rc = [None] * 9
    for i in range(3):
        for j in range(3):
            rc[3 * i + j] = (
                r[3 * i + 0] * skel(0, j)
                + r[3 * i + 1] * skel(1, j)
                + r[3 * i + 2] * skel(2, j)
            )

    def sandwich_rows(m, c):
        """rows m (list of 9 [1,bs]) x 3x3 scalar-or-row c -> 9 rows of
        m @ c @ m^T."""
        # t = m @ c
        t = [None] * 9
        for i in range(3):
            for j in range(3):
                t[3 * i + j] = (
                    m[3 * i + 0] * c[0][j] + m[3 * i + 1] * c[1][j] + m[3 * i + 2] * c[2][j]
                )
        out = [None] * 9
        for i in range(3):
            for j in range(3):
                out[3 * i + j] = (
                    t[3 * i + 0] * m[3 * j + 0]
                    + t[3 * i + 1] * m[3 * j + 1]
                    + t[3 * i + 2] * m[3 * j + 2]
                )
        return out

    crr = [[s(_P_COV_RR + 3 * i + j) for j in range(3)] for i in range(3)]
    w1 = sandwich_rows(re, bc)   # sensor noise in the world frame
    w2 = sandwich_rows(rc, crr)  # state rotation uncertainty term
    wc = [
        w1[k] + w2[k] + s(_P_COV_PP + k) for k in range(9)
    ]
    bc_rows = [bc[i][j] for i in range(3) for j in range(3)]
    covs_ref[:] = jnp.concatenate(wc + w1 + bc_rows, axis=0)

    # ---- voxel keys, centers, probe indices ----
    key_rows = []
    vc_rows = []
    idx_rows = []
    pw = [pwx, pwy, pwz]
    for chain in range(2):
        for lvl in range(levels):
            size = s(_P_SIZES + lvl)
            inv_size = 1.0 / size
            ks = [jnp.floor(pw[i] * inv_size) for i in range(3)]
            if chain == 1:
                quarter = size * 0.25
                for i in range(3):
                    vci = (ks[i] + 0.5) * size
                    rel = pw[i] - vci
                    off = jnp.where(rel > quarter, 1.0, 0.0) - jnp.where(
                        rel < -quarter, 1.0, 0.0
                    )
                    ks[i] = ks[i] + off
            ki = [k.astype(jnp.int32) for k in ks]
            key_rows += ki
            vc_rows += [(ks[i] + 0.5) * size for i in range(3)]
            h = (
                (ki[0].astype(jnp.uint32) * jnp.uint32(73856093))
                ^ (ki[1].astype(jnp.uint32) * jnp.uint32(471943))
                ^ (ki[2].astype(jnp.uint32) * jnp.uint32(83492791))
            ) & jnp.uint32(capacity - 1)
            idx_rows.append(h.astype(jnp.int32) + (lvl * capacity))

    keys_ref[:] = jnp.concatenate(key_rows, axis=0)
    vc_ref[:] = jnp.concatenate(vc_rows, axis=0)
    idx0_ref[:] = jnp.concatenate(idx_rows, axis=0)


# --------------------------- kernel 2: select -------------------------------


def _select_kernel(
    par_ref,      # [1, 8] f32
    piw_ref,      # [6, bs]
    bcov_ref,     # [18, bs]: full world cov(9) for gates, sensor-only
                  # world cov(9) for the measurement variance
    vc_ref,       # [6L', bs] candidate voxel centers
    plane_ref,    # [2L'*31, bs] gathered plane rows per candidate
                  # (plane_var packed to its symmetric upper triangle)
    flags_ref,    # [4L', bs] f32: found(2L'), is_plane(2L')
    mask_ref,     # [1, bs] f32 valid-row flag
    bidx_ref,     # [1, bs] f32 owning bucket per row (n_buckets when padded)
    out_ref,      # out [46, bs]: matched(1) w(1) r(1) nmask(1) pad(2) X(40)
    s40_ref,      # out [n_buckets*40, 40]: per-bucket sum w X X^T, grid-
                  # accumulated (ONE MXU contraction per block replaces the
                  # XLA-side [nb, 40, cap] one-hot expansion + einsum)
    nm_ref,       # out [n_buckets, 128]: per-bucket match counts (every
                  # column equals the count; an MXU ones-contraction avoids
                  # both in-kernel cross-lane reductions and the XLA-side
                  # one-hot count einsum)
    *,
    levels: int,
    n_buckets: int,
):
    f32 = piw_ref.dtype
    nc = 2 * levels

    def s(i):
        return par_ref[0, i]

    sigma_num = s(_Q_SIGMA)
    radius_k = s(_Q_RADIUS)
    ratio = s(_Q_RATIO)

    pwx = piw_ref[3:4, :]
    pwy = piw_ref[4:5, :]
    pwz = piw_ref[5:6, :]
    wc = [bcov_ref[i : i + 1, :] for i in range(9)]
    ws = [bcov_ref[9 + i : 9 + i + 1, :] for i in range(9)]

    neg_inf = jnp.float32(-3.0e38)

    # Per-candidate gate + probability; per-chain best selection.
    chain_matched = []
    chain_best = []  # (prob, nx, ny, nz, cx, cy, cz, sl)
    for chain in range(2):
        best_prob = jnp.full(pwx.shape, neg_inf, dtype=f32)
        b_matched = jnp.zeros(pwx.shape, dtype=f32)
        b_n = [jnp.zeros(pwx.shape, dtype=f32) for _ in range(3)]
        b_c = [jnp.zeros(pwx.shape, dtype=f32) for _ in range(3)]
        b_sl = jnp.zeros(pwx.shape, dtype=f32)
        reachable = jnp.ones(pwx.shape, dtype=f32)
        for lvl in range(levels):
            m = chain * levels + lvl
            base = m * 31
            pr = lambda k: plane_ref[base + k : base + k + 1, :]
            found = flags_ref[m : m + 1, :]
            isp = flags_ref[nc + m : nc + m + 1, :]
            cx = vc_ref[3 * m + 0 : 3 * m + 1, :] + pr(0)
            cy = vc_ref[3 * m + 1 : 3 * m + 2, :] + pr(1)
            cz = vc_ref[3 * m + 2 : 3 * m + 3, :] + pr(2)
            nx, ny, nz = pr(3), pr(4), pr(5)
            radius = pr(9)

            relx = pwx - cx
            rely = pwy - cy
            relz = pwz - cz
            sdist = nx * relx + ny * rely + nz * relz
            dist = jnp.abs(sdist)
            d2c = relx * relx + rely * rely + relz * relz
            range_dis2 = jnp.maximum(d2c - dist * dist, 0.0)
            rk = radius_k * radius
            gate_range = jnp.where(range_dis2 <= rk * rk, 1.0, 0.0)

            # sigma_l = j^T plane_var j + n^T W n, j = [rel, -n]
            j6 = [relx, rely, relz, -nx, -ny, -nz]
            sig = jnp.zeros(pwx.shape, dtype=f32)
            for i in range(6):
                row = jnp.zeros(pwx.shape, dtype=f32)
                for jj in range(6):
                    row = row + pr(10 + _sym21(i, jj)) * j6[jj]
                sig = sig + j6[i] * row
            n3 = [nx, ny, nz]
            for i in range(3):
                for jj in range(3):
                    sig = sig + n3[i] * wc[3 * i + jj] * n3[jj]
            sig = jnp.maximum(sig, 1e-12)
            inv_sqrt = jax.lax.rsqrt(sig)
            gate_sigma = jnp.where(dist < sigma_num * jnp.sqrt(sig), 1.0, 0.0)
            prob = inv_sqrt * jnp.exp(-0.5 * dist * dist / sig)

            ok = found * isp * gate_range * gate_sigma * reachable
            better = ok * jnp.where(prob > best_prob, 1.0, 0.0)
            bb = better > 0.5
            best_prob = jnp.where(bb, prob, best_prob)
            b_matched = jnp.maximum(b_matched, ok)
            for i in range(3):
                b_n[i] = jnp.where(bb, n3[i], b_n[i])
                b_c[i] = jnp.where(bb, [cx, cy, cz][i], b_c[i])
            # single_l for the selected candidate (measurement variance uses
            # the plane term only; the sensor term is added once below).
            b_sl = jnp.where(bb, sig - _nwn(n3, wc), b_sl)
            reachable = reachable * found * (1.0 - isp)
        chain_matched.append(b_matched)
        chain_best.append((b_n, b_c, b_sl))

    use_nbr = (1.0 - chain_matched[0]) * chain_matched[1]
    un = use_nbr > 0.5
    matched = jnp.maximum(chain_matched[0], chain_matched[1]) * mask_ref[:]
    n_sel = [
        jnp.where(un, chain_best[1][0][i], chain_best[0][0][i]) for i in range(3)
    ]
    c_sel = [
        jnp.where(un, chain_best[1][1][i], chain_best[0][1][i]) for i in range(3)
    ]
    sl_sel = jnp.where(un, chain_best[1][2], chain_best[0][2])

    # Measurement variance (KILO.cc:201-209): plane term of the selected
    # candidate + n^T W_sensor n (sensor-only world covariance).
    r_meas = ratio * (sl_sel + _nwn(n_sel, ws))

    w = matched / (r_meas + _R_JITTER)

    # 40-feature rows: mt(27), n(3), v(9), d(1) — conventions of
    # core/eskf_fused.point_features.
    pix = piw_ref[0:1, :]
    piy = piw_ref[1:2, :]
    piz = piw_ref[2:3, :]
    zero = jnp.zeros(pix.shape, dtype=f32)
    sp = [
        zero, -piz, piy,
        piz, zero, -pix,
        -piy, pix, zero,
    ]
    feat = []
    for i in range(3):          # mt rows 9i + (3c+b) = n_c * sp[i*3+b]
        for c in range(3):
            for b in range(3):
                feat.append(n_sel[c] * sp[3 * i + b])
    feat += n_sel
    for c in range(3):
        for a in range(3):
            feat.append(n_sel[c] * [pix, piy, piz][a])
    feat.append(
        n_sel[0] * c_sel[0] + n_sel[1] * c_sel[1] + n_sel[2] * c_sel[2]
    )

    out_ref[:] = jnp.concatenate(
        [matched, w, r_meas, matched, zero, zero] + feat, axis=0
    )

    # ---- per-bucket sufficient statistics: s40[b] = sum_{c in b} w X X^T.
    # Build [n_buckets*40, bs] bucket-masked weighted features, then one
    # f32 MXU contraction against X^T; accumulate across grid blocks.
    x_rows = jnp.concatenate(feat, axis=0)                 # [40, bs]
    xw_rows = x_rows * w                                   # w=0 on padding
    bidx = bidx_ref[:]
    lhs_parts = []
    cnt_parts = []
    for b in range(n_buckets):
        maskb = jnp.where(bidx == jnp.float32(b), 1.0, 0.0).astype(f32)
        lhs_parts.append(xw_rows * maskb)
        cnt_parts.append(matched * maskb)
    lhs = jnp.concatenate(lhs_parts, axis=0)               # [nb*40, bs]
    part = jax.lax.dot_general(
        lhs, x_rows,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )                                                      # [nb*40, 40]
    cnt_lhs = jnp.concatenate(cnt_parts, axis=0)           # [nb, bs]
    nm_part = jax.lax.dot_general(
        cnt_lhs, jnp.ones((cnt_lhs.shape[1], 128), dtype=f32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                      # [nb, 128]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        s40_ref[...] = jnp.zeros_like(s40_ref)
        nm_ref[...] = jnp.zeros_like(nm_ref)

    s40_ref[...] += part
    nm_ref[...] += nm_part


def _nwn(n3, wc):
    """n^T W n from rows."""
    out = None
    for i in range(3):
        for j in range(3):
            term = n3[i] * wc[3 * i + j] * n3[j]
            out = term if out is None else out + term
    return out


# ------------------------------- wrappers -----------------------------------


@functools.partial(
    jax.jit, static_argnames=("levels", "capacity", "interpret", "block")
)
def keys_call(par, pts_t, rb_t, pb_t, levels, capacity, interpret=False,
              block=512):
    c = pts_t.shape[1]
    f32 = pts_t.dtype
    grid = (c // block,)
    nl3 = 3 * levels

    def full_row(w):
        return pl.BlockSpec((1, w), lambda g: (0, 0), memory_space=pltpu.VMEM)

    def col(w):
        return pl.BlockSpec((w, block), lambda g: (0, g), memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((6, c), f32),            # piw
        jax.ShapeDtypeStruct((27, c), f32),           # covs
        jax.ShapeDtypeStruct((2 * nl3, c), jnp.int32),  # keys
        jax.ShapeDtypeStruct((2 * nl3, c), f32),      # vc
        jax.ShapeDtypeStruct((2 * levels, c), jnp.int32),  # idx0
    )
    return pl.pallas_call(
        functools.partial(_keys_kernel, levels=levels, capacity=capacity),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[full_row(64), col(3), col(9), col(3)],
        out_specs=(col(6), col(27), col(2 * nl3), col(2 * nl3), col(2 * levels)),
        interpret=interpret,
    )(par, pts_t, rb_t, pb_t)


@functools.partial(
    jax.jit, static_argnames=("levels", "n_buckets", "interpret", "block")
)
def select_call(par, piw_t, bcov_t, vc_t, plane_t, flags_t, mask_t, bidx_t,
                levels, n_buckets, interpret=False, block=512):
    c = piw_t.shape[1]
    f32 = piw_t.dtype
    grid = (c // block,)
    nc = 2 * levels

    def full_row(w):
        return pl.BlockSpec((1, w), lambda g: (0, 0), memory_space=pltpu.VMEM)

    def col(w):
        return pl.BlockSpec((w, block), lambda g: (0, g), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_select_kernel, levels=levels, n_buckets=n_buckets),
        out_shape=(
            jax.ShapeDtypeStruct((46, c), f32),
            jax.ShapeDtypeStruct((n_buckets * 40, 40), f32),
            jax.ShapeDtypeStruct((n_buckets, 128), f32),
        ),
        grid=grid,
        in_specs=[
            full_row(8), col(6), col(18), col(3 * nc), col(31 * nc),
            col(2 * nc), col(1), col(1),
        ],
        out_specs=(
            col(46),
            pl.BlockSpec(
                (n_buckets * 40, 40), lambda g: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_buckets, 128), lambda g: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        interpret=interpret,
    )(par, piw_t, bcov_t, vc_t, plane_t, flags_t, mask_t, bidx_t)
