"""Moment-based plane fit + eig3x3 vs the reference per-point-loop oracle."""

import numpy as np
import jax.numpy as jnp

from legkilo_tpu.core import plane_fit
from legkilo_tpu.ops.eig3x3 import eigh3x3
import oracle


def make_voxel_points(rng, n=20, extent=0.25, thickness=0.01):
    """Points near a random plane inside a voxel, plus per-point covariances."""
    normal = rng.normal(size=3)
    normal /= np.linalg.norm(normal)
    basis = np.linalg.svd(np.eye(3) - np.outer(normal, normal))[0][:, :2]
    uv = rng.uniform(-extent, extent, size=(n, 2))
    pts = uv @ basis.T + normal * rng.normal(scale=thickness, size=(n, 1))
    vars_ = []
    for _ in range(n):
        a = rng.normal(size=(3, 3)) * 0.01
        vars_.append(a @ a.T + 1e-6 * np.eye(3))
    return pts, np.stack(vars_)


def test_eigh3x3_matches_numpy(rng):
    mats = []
    for _ in range(50):
        a = rng.normal(size=(3, 3))
        mats.append(a @ a.T)
    mats.append(np.eye(3))  # degenerate: all equal
    mats.append(np.diag([1.0, 1.0, 2.0]))  # repeated pair
    mats.append(np.diag([3.0, 1e-8, 1e-8]))
    mats = np.stack(mats)
    evals, evecs = eigh3x3(jnp.asarray(mats, dtype=jnp.float32))
    evals, evecs = np.asarray(evals), np.asarray(evecs)
    for i in range(len(mats)):
        ref_vals = np.linalg.eigh(mats[i])[0]
        np.testing.assert_allclose(evals[i], ref_vals, atol=2e-5 * max(1, abs(ref_vals).max()))
        for k in range(3):
            v = evecs[i][:, k]
            np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-5)
            np.testing.assert_allclose(
                mats[i] @ v, evals[i][k] * v, atol=5e-4 * max(1, abs(ref_vals).max())
            )


def moments_from_points(pts, vars_, vc):
    prel = jnp.asarray(pts - vc, dtype=jnp.float32)
    var = jnp.asarray(vars_, dtype=jnp.float32)
    m = plane_fit.point_moments(prel, var)
    return plane_fit.PlaneMoments(*[jnp.sum(x, axis=0) for x in m])


def test_plane_fit_matches_oracle(rng):
    for trial in range(5):
        pts, vars_ = make_voxel_points(rng)
        vc = rng.normal(size=3) * 20.0  # voxel center far from origin
        world = pts + vc
        om = oracle.plane_fit(world, vars_, planer_threshold=0.01)
        assert om["is_plane"]

        m = moments_from_points(world, vars_, vc)
        fit = plane_fit.fit_planes(m, 0.01)
        assert bool(fit.is_plane)
        np.testing.assert_allclose(
            np.asarray(fit.center_rel) + vc, om["center"], atol=1e-4
        )
        # Normal defined up to sign.
        n_j = np.asarray(fit.normal)
        sign = np.sign(n_j @ om["normal"])
        np.testing.assert_allclose(sign * n_j, om["normal"], atol=1e-3)
        np.testing.assert_allclose(np.asarray(fit.evals), om["evals"], atol=1e-4)
        np.testing.assert_allclose(float(fit.radius), np.sqrt(om["evals"][2]), atol=1e-4)
        # plane_var: blocks flip sign with the normal; compare canonically.
        pv_j = np.asarray(fit.plane_var, dtype=np.float64).copy()
        if sign < 0:
            pv_j[0:3, 3:6] *= -1
            pv_j[3:6, 0:3] *= -1
        scale = max(np.abs(om["plane_var"]).max(), 1e-8)
        np.testing.assert_allclose(pv_j, om["plane_var"], atol=2e-3 * scale)


def test_non_planar_detection(rng):
    pts = rng.uniform(-0.25, 0.25, size=(40, 3))  # volumetric blob
    vars_ = np.tile(np.eye(3)[None] * 1e-4, (40, 1, 1))
    m = moments_from_points(pts, vars_, np.zeros(3))
    fit = plane_fit.fit_planes(m, 0.001)
    assert not bool(fit.is_plane)


def test_calc_body_cov_matches_oracle(rng):
    pts = rng.normal(size=(12, 3)) * 5
    pts[0, 2] = 0.0  # singularity guard path
    out = np.asarray(
        plane_fit.calc_body_cov(jnp.asarray(pts, dtype=jnp.float32), 0.04, 0.2)
    )
    for i in range(len(pts)):
        ref = oracle.calc_body_cov(pts[i], 0.04, 0.2)
        np.testing.assert_allclose(out[i], ref, atol=1e-5)


def test_moment_accumulation_incremental(rng):
    """Adding points in two batches must equal one batch (map update path)."""
    pts, vars_ = make_voxel_points(rng, n=30)
    vc = np.zeros(3)
    m_all = moments_from_points(pts, vars_, vc)
    m_a = moments_from_points(pts[:13], vars_[:13], vc)
    m_b = moments_from_points(pts[13:], vars_[13:], vc)
    for x, a, b in zip(m_all, m_a, m_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(a) + np.asarray(b), rtol=2e-5, atol=1e-6)
