"""SO(3) math primitives (batched, jit-safe).

Capability parity with the reference's hand-rolled Rodrigues helpers
(/root/reference/legkilo/src/common/math_utils.hpp:12-94): skew, Exp, Log,
rotation-matrix -> euler.  Everything here is pure jnp, works with arbitrary
leading batch dimensions, and is written to be numerically safe near the
identity (Taylor fallbacks) so it can run in float32 on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

# Angle below which we switch to Taylor expansions.  f32-safe.
_SMALL_ANGLE = 1e-6


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [v]x, batched over leading dims.

    Parity: SKEW_SYM_MATRIX (math_utils.hpp:12-17).
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exponential map: axis-angle vector -> rotation matrix.

    Parity: Exp(v) overloads (math_utils.hpp:19-68).  Near-zero angles use the
    2nd-order Taylor expansion so gradients and f32 evaluation are stable.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    small = theta < _SMALL_ANGLE

    # sin(t)/t and (1-cos t)/t^2 with Taylor fallback.
    safe_t = jnp.where(small, jnp.ones_like(theta), theta)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe_t) / safe_t)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_t)) / (safe_t * safe_t))

    K = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map: rotation matrix -> axis-angle vector.

    Parity: Log(R) (math_utils.hpp:70-76), which uses
    theta = acos((tr(R)-1)/2), axis from the antisymmetric part.  We add
    clamping and a small-angle fallback for numerical safety.
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)

    # Antisymmetric part gives axis * 2 sin(theta).
    ax = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    small = theta < _SMALL_ANGLE
    # theta / (2 sin theta), Taylor: 0.5 + theta^2/12 near 0.
    safe_sin = jnp.where(small, jnp.ones_like(sin_theta), sin_theta)
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, theta / (2.0 * safe_sin))
    # Note: near theta = pi the antisymmetric part vanishes; the reference has
    # the same limitation (math_utils.hpp:70-76).  Boxminus deltas in the
    # filter are always small so this is fine in practice.
    return scale[..., None] * ax


def rot_to_euler(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> (roll, pitch, yaw), ZYX convention.

    Parity: RotMtoEuler (math_utils.hpp:78-94).
    """
    sy = jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2)
    singular = sy < 1e-6

    x = jnp.where(
        singular,
        jnp.arctan2(-R[..., 1, 2], R[..., 1, 1]),
        jnp.arctan2(R[..., 2, 1], R[..., 2, 2]),
    )
    y = jnp.arctan2(-R[..., 2, 0], sy)
    z = jnp.where(
        singular,
        jnp.zeros_like(sy),
        jnp.arctan2(R[..., 1, 0], R[..., 0, 0]),
    )
    return jnp.stack([x, y, z], axis=-1)


def quat_from_rot(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (w, x, y, z), branch-free (batched).

    Used by the trajectory writer (reference uses Eigen::Quaterniond at
    ros_interface.cc:340).  Shepperd's method via jnp.where for jit safety.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically best.
    q0 = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    q1 = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    q2 = jnp.stack([m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21], axis=-1)
    q3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11], axis=-1)

    cases = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4, 4]
    mags = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11],
        axis=-1,
    )
    best = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cases, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)
