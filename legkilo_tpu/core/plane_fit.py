"""Probabilistic plane fitting from sufficient statistics (TPU-native).

The reference fits a plane per voxel by iterating over a stored point list —
mean/scatter eigendecomposition plus a per-point 6x3 Jacobian accumulated into
a 6x6 plane-parameter covariance (init_plane,
/root/reference/legkilo/src/core/slam/voxel_map.cc:42-117).  Storing point
lists per voxel is pointer-chasing poison on TPU, so we maintain *moments*
instead and reconstruct the exact same fit in closed form:

    n                               point count
    m1 = sum  p~                    (p~ = p - voxel_center, for f32 safety)
    m2 = sum  p~ p~^T
    S0 = sum  V_i                   per-point world-frame covariance
    S1 = sum  V_i (x) p~            [3,3,3]
    S2 = sum  V_i (x) p~ p~^T       [3,3,3,3]

The plane normal/center/eigenvalues come from (m1, m2); the 6x6 plane_var
follows from expanding the reference's per-point Jacobian sum

    plane_var = sum_i J_i V_i J_i^T,   J_i = [evecs F_i ; I/n],
    F_i[m,:]  = alpha_m q_i^T B_m,  q_i = p_i - center,
    B_m       = e_m e_min^T + e_min e_m^T,
    alpha_m   = 1 / (n (l_min - l_m))       for m != min

which is a bilinear function of q_i and V_i and therefore exactly expressible
through (S0, S1, S2, m1).  This reproduces the reference algebra in closed
form — identical in exact arithmetic — with O(1) memory per voxel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.eig3x3 import eigh3x3

_DEG2RAD = jnp.pi / 180.0
_ALPHA_EPS = 1e-7  # guards alpha_m when l_min ~= l_m (degenerate scatter)


class PlaneMoments(NamedTuple):
    """Per-voxel sufficient statistics (batched over leading dims)."""

    n: jnp.ndarray    # [...]      float (count)
    m1: jnp.ndarray   # [..., 3]
    m2: jnp.ndarray   # [..., 3, 3]
    s0: jnp.ndarray   # [..., 3, 3]
    s1: jnp.ndarray   # [..., 3, 3, 3]
    s2: jnp.ndarray   # [..., 3, 3, 3, 3]


class PlaneFit(NamedTuple):
    """Fitted plane parameters (VoxelPlane analog, voxel_map.h:96-119)."""

    center_rel: jnp.ndarray  # [..., 3] plane center relative to voxel center
    normal: jnp.ndarray      # [..., 3]
    evals: jnp.ndarray       # [..., 3] ascending (min, mid, max)
    radius: jnp.ndarray      # [...]    sqrt(max eigenvalue)
    plane_var: jnp.ndarray   # [..., 6, 6]
    is_plane: jnp.ndarray    # [...]    bool


def point_moments(p_rel: jnp.ndarray, var: jnp.ndarray) -> PlaneMoments:
    """Moments contributed by single points (for scatter-add into slots)."""
    one = jnp.ones(p_rel.shape[:-1], dtype=p_rel.dtype)
    m2 = p_rel[..., :, None] * p_rel[..., None, :]
    s1 = var[..., :, :, None] * p_rel[..., None, None, :]
    s2 = var[..., :, :, None, None] * m2[..., None, None, :, :]
    return PlaneMoments(n=one, m1=p_rel, m2=m2, s0=var, s1=s1, s2=s2)


def fit_planes(m: PlaneMoments, planer_threshold: float) -> PlaneFit:
    """Closed-form plane fit from moments, batched over leading dims.

    Semantics parity with init_plane (voxel_map.cc:42-117): scatter
    eigendecomposition, is_plane iff min eigenvalue < threshold, 6x6
    plane-parameter covariance from the per-point Jacobian sum.
    Slots with n < 1 produce garbage; callers mask on their own init
    thresholds (layer_init_num).
    """
    n = jnp.maximum(m.n, 1.0)
    inv_n = 1.0 / n
    cr = m.m1 * inv_n[..., None]                            # center (rel)
    cov = m.m2 * inv_n[..., None, None] - cr[..., :, None] * cr[..., None, :]
    evals, evecs = eigh3x3(cov)
    e_min = evecs[..., :, 0]
    lam_min = evals[..., 0]
    is_plane = lam_min < planer_threshold

    # alpha_m, B_m for m in {mid, max}
    alphas = []
    bs = []
    for k in (1, 2):
        e_m = evecs[..., :, k]
        lam_m = evals[..., k]
        denom = n * (lam_min - lam_m)
        denom = jnp.where(jnp.abs(denom) < _ALPHA_EPS, -_ALPHA_EPS, denom)
        alphas.append(1.0 / denom)
        bs.append(
            e_m[..., :, None] * e_min[..., None, :]
            + e_min[..., :, None] * e_m[..., None, :]
        )

    # T[b,c,d,a] = sum_i V[b,c] q[d] q[a], q = p~ - cr
    s1 = m.s1
    t = (
        m.s2
        - s1[..., :, :, :, None] * cr[..., None, None, None, :]
        - s1[..., :, :, None, :] * cr[..., None, None, :, None]
        + m.s0[..., :, :, None, None]
        * (cr[..., :, None] * cr[..., None, :])[..., None, None, :, :]
    )
    # P1[b,c,a] = sum_i V[b,c] q[a]
    p1 = s1 - m.s0[..., :, :, None] * cr[..., None, None, :]

    # Top-left 3x3: sum_{m,m'} alpha_m alpha_m' c_{mm'} e_m e_m'^T
    t_nn = jnp.zeros(cov.shape, dtype=cov.dtype)
    t_nq = jnp.zeros(cov.shape, dtype=cov.dtype)
    for i, (a_i, b_i) in enumerate(zip(alphas, bs)):
        e_i = evecs[..., :, i + 1]
        u_i = jnp.einsum("...ab,...bca->...c", b_i, p1)
        t_nq = t_nq + (a_i * inv_n)[..., None, None] * (
            e_i[..., :, None] * u_i[..., None, :]
        )
        for j, (a_j, b_j) in enumerate(zip(alphas, bs)):
            e_j = evecs[..., :, j + 1]
            c_ij = jnp.einsum("...ab,...cd,...bcda->...", b_i, b_j, t)
            t_nn = t_nn + (a_i * a_j * c_ij)[..., None, None] * (
                e_i[..., :, None] * e_j[..., None, :]
            )

    t_qq = m.s0 * (inv_n * inv_n)[..., None, None]
    top = jnp.concatenate([t_nn, t_nq], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(t_nq, -1, -2), t_qq], axis=-1)
    plane_var = jnp.concatenate([top, bot], axis=-2)
    plane_var = jnp.where(is_plane[..., None, None], plane_var, 0.0)

    return PlaneFit(
        center_rel=cr,
        normal=e_min,
        evals=evals,
        radius=jnp.sqrt(jnp.maximum(evals[..., 2], 0.0)),
        plane_var=plane_var,
        is_plane=is_plane,
    )


def calc_body_cov(
    pb: jnp.ndarray, range_inc: float, degree_inc: float
) -> jnp.ndarray:
    """Per-point sensor-noise covariance in the LiDAR frame, batched.

    Parity: calcBodyCov (voxel_map.cc:22-40) — range noise along the bearing
    plus angular (beam divergence) noise in the tangent plane.  The z==0
    singularity guard widens the reference's exact-zero check to |z| < 1e-8
    for f32 safety.
    """
    z = pb[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-4, z)
    pb = pb.at[..., 2].set(z_safe)
    rng = jnp.linalg.norm(pb, axis=-1)
    range_var = range_inc * range_inc
    tangent_var = jnp.sin(degree_inc * _DEG2RAD) ** 2

    direction = pb / jnp.maximum(rng[..., None], 1e-12)
    dx, dy, dz = direction[..., 0], direction[..., 1], direction[..., 2]
    zero = jnp.zeros_like(dx)
    dhat = jnp.stack(
        [
            jnp.stack([zero, -dz, dy], axis=-1),
            jnp.stack([dz, zero, -dx], axis=-1),
            jnp.stack([-dy, dx, zero], axis=-1),
        ],
        axis=-2,
    )
    base1 = jnp.stack(
        [jnp.ones_like(dx), jnp.ones_like(dx), -(dx + dy) / jnp.where(jnp.abs(dz) < 1e-12, 1e-12, dz)],
        axis=-1,
    )
    base1 = base1 / jnp.linalg.norm(base1, axis=-1, keepdims=True)
    base2 = jnp.cross(base1, direction)
    base2 = base2 / jnp.linalg.norm(base2, axis=-1, keepdims=True)
    nmat = jnp.stack([base1, base2], axis=-1)              # [..., 3, 2]
    amat = rng[..., None, None] * (dhat @ nmat)            # [..., 3, 2]
    cov = range_var * direction[..., :, None] * direction[..., None, :] + (
        tangent_var * (amat @ jnp.swapaxes(amat, -1, -2))
    )
    return cov
