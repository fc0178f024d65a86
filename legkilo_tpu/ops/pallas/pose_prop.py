"""Pallas kernel for the IMU-propagated per-bucket match poses.

core/filter_deferred._predicted_bucket_poses_imu integrates the packet's
IMU events through the interleaved event/bucket timeline with parallel
cumulative structures (an associative_scan of 3x3 delta rotations, two
cummaxes, two cumsums) — zero-order-hold mean propagation per
KILO.cc:373-395 / eskf.cc:64-70 with innovation-free latched rates.  As an
XLA graph over [M ~ 56]-long sequences that is ~40 tiny kernels (log-depth
scan steps, each a slice+op+concat); on launch-taxed targets the "fixed"
phase of the scan step is largely this soup (docs/PERF_NOTES.md round-5).

This kernel runs the whole timeline in ONE launch.  Sequences live on the
lane axis ([1, MP] rows, MP = M padded to 128); every cumulative structure
is a Hillis-Steele doubling scan built from `pltpu.roll` + an iota mask
(compile-verified on the round-5 rig):

    latch   — value at the last valid event strictly before each slot
              (combine: take right if right.has else left), for the
              post-update rates w = gyr - bw, a = g/|a|*acc - ba
    cummax  — the last-predict clock t_end
    matmul prefix product — the delta-rotation chain (order-preserving:
              combine(left-shifted, current) = shifted @ current)
    cumsum  x2 — velocity and position first-order recursions

Equivalence vs the XLA path: tests/test_pose_prop_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# par row layout
_P_ROT = 0     # rot0 (9)
_P_POS = 9     # pos0 (3)
_P_VEL = 12    # vel0 (3)
_P_BA = 15     # ba (3)
_P_BW = 18     # bw (3)
_P_GRAV = 21   # grav (3)
_P_IMU_W = 24  # latched imu_w (3)
_P_IMU_A = 27  # latched imu_a (3)
_P_LP = 30     # last_predict_t
_P_GSC = 31    # g_over_acc_norm
PAR_W = 32

# input row layout: t(0) gate(1) is_ev(2) gyr(3:6) acc(6:9)
IN_W = 9

_NEG = -3.0e38
_SMALL_ANGLE = 1e-6  # matches core/so3._SMALL_ANGLE


def _pose_kernel(par_ref, in_ref, out_ref, *, mp: int):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, mp), 1)

    def s(i):
        return par_ref[0, i]

    def shift(x, n, fill):
        sh = pltpu.roll(x, n, 1)
        return jnp.where(lane >= n, sh, fill)

    t = in_ref[0:1, :]
    gate = in_ref[1:2, :] > 0.5
    has = in_ref[2:3, :]                                   # is_ev as f32 0/1
    w_meas = [in_ref[3 + i : 4 + i, :] - s(_P_BW + i) for i in range(3)]
    a_meas = [
        s(_P_GSC) * in_ref[6 + i : 7 + i, :] - s(_P_BA + i) for i in range(3)
    ]

    # ---- latch scan: rates from the last valid event strictly before j ----
    val = w_meas + a_meas                                  # 6 rows
    n = 1
    while n < mp:
        has_sh = shift(has, n, 0.0)
        val = [
            jnp.where(has > 0.5, v, shift(v, n, 0.0)) for v in val
        ]
        has = jnp.maximum(has, has_sh)
        n *= 2
    has_p = shift(has, 1, 0.0) > 0.5
    w_seg = [
        jnp.where(has_p, shift(val[i], 1, 0.0), s(_P_IMU_W + i))
        for i in range(3)
    ]
    a_seg = [
        jnp.where(has_p, shift(val[3 + i], 1, 0.0), s(_P_IMU_A + i))
        for i in range(3)
    ]

    # ---- per-segment dt (last-predict clock) ----
    lp = s(_P_LP)
    tv = jnp.where(gate, t, _NEG)
    n = 1
    while n < mp:
        tv = jnp.maximum(tv, shift(tv, n, _NEG))
        n *= 2
    t_end = jnp.maximum(tv, lp)
    t_start = shift(t_end, 1, lp)
    dt = jnp.where(gate, t - t_start, 0.0)

    # ---- d_r = exp_so3(w_seg * dt), Rodrigues with Taylor fallback ----
    wx = w_seg[0] * dt
    wy = w_seg[1] * dt
    wz = w_seg[2] * dt
    th2 = wx * wx + wy * wy + wz * wz
    th = jnp.sqrt(th2)
    small = th < _SMALL_ANGLE
    safe = jnp.where(small, 1.0, th)
    a_c = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(safe) / safe)
    b_c = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(safe)) / (safe * safe))
    # K = skew(w); R = I + a K + b K^2 (rows, row-major)
    kk = [  # K^2 entries
        -(wy * wy + wz * wz), wx * wy, wx * wz,
        wx * wy, -(wx * wx + wz * wz), wy * wz,
        wx * wz, wy * wz, -(wx * wx + wy * wy),
    ]
    k = [
        jnp.zeros_like(wx), -wz, wy,
        wz, jnp.zeros_like(wx), -wx,
        -wy, wx, jnp.zeros_like(wx),
    ]
    eye = [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
    dr = [eye[i] + a_c * k[i] + b_c * kk[i] for i in range(9)]

    # ---- prefix product of delta rotations (order-preserving) ----
    def mat_shift(m, n):
        return [shift(m[i], n, eye[i]) for i in range(9)]

    def mat_mul(a, b):
        out = [None] * 9
        for i in range(3):
            for j in range(3):
                out[3 * i + j] = (
                    a[3 * i + 0] * b[0 + j]
                    + a[3 * i + 1] * b[3 + j]
                    + a[3 * i + 2] * b[6 + j]
                )
        return out

    pref = dr
    n = 1
    while n < mp:
        pref = mat_mul(mat_shift(pref, n), pref)
        n *= 2

    # r_end = rot0 @ prefix (scalar rot0 entries)
    r0 = [s(_P_ROT + i) for i in range(9)]
    r_end = [None] * 9
    for i in range(3):
        for j in range(3):
            r_end[3 * i + j] = (
                r0[3 * i + 0] * pref[0 + j]
                + r0[3 * i + 1] * pref[3 + j]
                + r0[3 * i + 2] * pref[6 + j]
            )
    r_start = [shift(r_end[i], 1, r0[i]) for i in range(9)]

    # dv = dt * (r_start @ a_seg + grav); v_end = vel0 + cumsum(dv)
    dv = [
        dt
        * (
            r_start[3 * i + 0] * a_seg[0]
            + r_start[3 * i + 1] * a_seg[1]
            + r_start[3 * i + 2] * a_seg[2]
            + s(_P_GRAV + i)
        )
        for i in range(3)
    ]
    csum = [x for x in dv]
    n = 1
    while n < mp:
        csum = [c + shift(c, n, 0.0) for c in csum]
        n *= 2
    v_end = [s(_P_VEL + i) + csum[i] for i in range(3)]
    v_start = [shift(v_end[i], 1, s(_P_VEL + i)) for i in range(3)]

    # p_end = pos0 + cumsum(dt * v_start)
    dp = [dt * v for v in v_start]
    n = 1
    while n < mp:
        dp = [p + shift(p, n, 0.0) for p in dp]
        n *= 2
    p_end = [s(_P_POS + i) + dp[i] for i in range(3)]

    out_ref[:] = jnp.concatenate(r_end + p_end, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pose_call(par, rows, interpret=False):
    """One-launch pose propagation: rows [IN_W, MP] -> [12, MP]
    (r_end row-major 9, p_end 3).  MP must be a multiple of 128; padded
    lanes (gate=0) are exact no-ops."""
    mp = rows.shape[1]
    f32 = rows.dtype
    return pl.pallas_call(
        functools.partial(_pose_kernel, mp=mp),
        out_shape=jax.ShapeDtypeStruct((12, mp), f32),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, PAR_W), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((IN_W, mp), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((12, mp), lambda g: (0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(par, rows)
