"""SO(3) primitives vs SciPy/NumPy oracles (SURVEY.md §4a)."""

import numpy as np
import jax.numpy as jnp

from legkilo_tpu.core import so3
import oracle


def test_skew(rng):
    v = rng.normal(size=(5, 3)).astype(np.float32)
    out = np.asarray(so3.skew(jnp.asarray(v)))
    for i in range(5):
        np.testing.assert_allclose(out[i], oracle.skew(v[i]), atol=1e-6)


def test_exp_matches_oracle(rng):
    w = rng.normal(size=(20, 3)).astype(np.float32)
    w[0] = 0.0
    w[1] = [1e-8, 0, 0]
    out = np.asarray(so3.exp_so3(jnp.asarray(w)))
    for i in range(len(w)):
        np.testing.assert_allclose(out[i], oracle.exp_so3(w[i].astype(np.float64)), atol=2e-4)


def test_exp_log_roundtrip(rng):
    w = rng.normal(size=(50, 3)).astype(np.float32) * 0.5
    R = so3.exp_so3(jnp.asarray(w))
    w2 = np.asarray(so3.log_so3(R))
    np.testing.assert_allclose(w2, w, atol=1e-5)


def test_rotation_orthonormal(rng):
    w = rng.normal(size=(10, 3)).astype(np.float32) * 2.0
    R = np.asarray(so3.exp_so3(jnp.asarray(w)))
    for i in range(10):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(R[i]) - 1) < 1e-5


def test_quat_from_rot(rng):
    w = rng.normal(size=(30, 3)) * 3.0
    R = np.stack([oracle.exp_so3(x) for x in w])
    q = np.asarray(so3.quat_from_rot(jnp.asarray(R, dtype=jnp.float32)))
    for i in range(len(w)):
        wq, xq, yq, zq = q[i]
        # Rebuild rotation from quaternion, compare.
        Rq = np.array(
            [
                [1 - 2 * (yq**2 + zq**2), 2 * (xq * yq - wq * zq), 2 * (xq * zq + wq * yq)],
                [2 * (xq * yq + wq * zq), 1 - 2 * (xq**2 + zq**2), 2 * (yq * zq - wq * xq)],
                [2 * (xq * zq - wq * yq), 2 * (yq * zq + wq * xq), 1 - 2 * (xq**2 + yq**2)],
            ]
        )
        np.testing.assert_allclose(Rq, R[i], atol=1e-5)


def test_rot_to_euler_roundtrip(rng):
    rpy = rng.uniform(-1.2, 1.2, size=(20, 3))
    for r, p, y in rpy:
        R = oracle.exp_so3(np.array([0, 0, y])) @ oracle.exp_so3(
            np.array([0, p, 0])
        ) @ oracle.exp_so3(np.array([r, 0, 0]))
        out = np.asarray(so3.rot_to_euler(jnp.asarray(R, dtype=jnp.float32)))
        np.testing.assert_allclose(out, [r, p, y], atol=1e-5)
