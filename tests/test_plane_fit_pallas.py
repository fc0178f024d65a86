"""Pallas refit kernel (plane_fit_rows) vs fit_planes, interpret mode.

Both paths share the acos polynomial (ops/eig3x3.acos_poly), so on
well-conditioned inputs they agree to float rounding; degenerate inputs are
checked for the same fallback behavior (unit normal, zeroed plane_var).
"""

import numpy as np
import jax.numpy as jnp

from legkilo_tpu.core import plane_fit
from legkilo_tpu.core.voxel_map import _pack_moments
from legkilo_tpu.ops.pallas.plane_fit_rows import fit_rows_call

from test_plane_fit import make_voxel_points

THRESHOLD = 0.01


def _pack_rows(moment_list, meta_list, width=128):
    rows = jnp.stack(
        [jnp.concatenate(_pack_moments(m), axis=-1) for m in moment_list]
    )
    meta = jnp.asarray(np.stack(meta_list), dtype=jnp.float32)
    pad = width - rows.shape[0]
    rows = jnp.pad(rows, ((0, pad), (0, 0)))
    meta = jnp.pad(meta, ((0, pad), (0, 0)))
    return rows, meta


def _summed_moments(pts, vars_, vc):
    prel = jnp.asarray(pts - vc, dtype=jnp.float32)
    var = jnp.asarray(vars_, dtype=jnp.float32)
    m = plane_fit.point_moments(prel, var)
    return plane_fit.PlaneMoments(*[jnp.sum(x, axis=0) for x in m])


def test_fit_rows_matches_fit_planes(rng):
    moments, metas = [], []
    for i in range(24):
        n = int(rng.integers(5, 40))
        pts, vars_ = make_voxel_points(rng, n=n)
        m = _summed_moments(pts, vars_, vc=np.zeros(3))
        moments.append(m._replace(n=None))
        metas.append([n, 3.0, 1.0, 0.0])
    # degenerates: collinear points, identical points, near-empty slot
    line = np.outer(np.linspace(-0.2, 0.2, 12), np.array([1.0, 0.5, -0.2]))
    vl = np.tile(1e-6 * np.eye(3), (12, 1, 1))
    moments.append(_summed_moments(line, vl, np.zeros(3))._replace(n=None))
    metas.append([12.0, 0.0, 1.0, 0.0])
    same = np.tile(np.array([0.1, -0.2, 0.05]), (6, 1))
    moments.append(_summed_moments(same, vl[:6], np.zeros(3))._replace(n=None))
    metas.append([6.0, 0.0, 0.0, 0.0])

    k = len(moments)
    mom_rows, meta_rows = _pack_rows(moments, metas)
    par = jnp.zeros((1, 8), jnp.float32).at[0, 0].set(THRESHOLD)
    out = fit_rows_call(par, mom_rows.T, meta_rows.T, interpret=True, block=128)
    out = np.asarray(out.T)

    from legkilo_tpu.core.voxel_map import _unpack_moments

    n_r = jnp.maximum(meta_rows[:, 0], 1.0)
    fit = plane_fit.fit_planes(
        _unpack_moments(mom_rows[:, :9], mom_rows[:, 9:], n_r), THRESHOLD
    )

    n_wellcond = k - 2  # the last two rows are eigenvalue-degenerate
    for i in range(k):
        np.testing.assert_allclose(
            out[i, 0:3], np.asarray(fit.center_rel)[i], atol=1e-5,
            err_msg=f"center row {i}")
        np.testing.assert_allclose(
            out[i, 6:9], np.asarray(fit.evals)[i], atol=1e-5,
            err_msg=f"evals row {i}")
        np.testing.assert_allclose(
            out[i, 9], np.asarray(fit.radius)[i], atol=1e-5,
            err_msg=f"radius row {i}")
        # meta_fit: n, 0, 1, is_plane
        np.testing.assert_allclose(
            out[i, 31:35],
            [metas[i][0], 0.0, 1.0,
             float(np.asarray(fit.is_plane)[i])],
            atol=1e-6, err_msg=f"meta row {i}")
        if i < n_wellcond:
            np.testing.assert_allclose(
                out[i, 3:6], np.asarray(fit.normal)[i], atol=2e-4,
                err_msg=f"normal row {i}")
            from legkilo_tpu.core.voxel_map import _TRIU36
            pv_ref = np.asarray(fit.plane_var)[i].reshape(36)[list(_TRIU36)]
            scale = max(1.0, np.abs(pv_ref).max())
            np.testing.assert_allclose(
                out[i, 10:31], pv_ref, atol=5e-4 * scale,
                err_msg=f"plane_var row {i}")
        else:
            # Repeated min eigenvalue -> the normal direction is ambiguous;
            # both paths must return a unit vector in the null space.
            np.testing.assert_allclose(
                np.linalg.norm(out[i, 3:6]), 1.0, atol=1e-4,
                err_msg=f"degenerate normal row {i} not unit")


def test_insert_points_pallas_refit_equivalent(rng):
    """insert_points with/without the Pallas refit produce the same map."""
    from legkilo_tpu.core.voxel_map import (
        MapConfig, insert_points, make_map,
    )

    base = dict(
        levels=2, capacity=256, probe=4, voxel_size=0.5,
        planer_threshold=0.01, sigma_num=3.0, max_points_num=50,
        init_num=(5, 5), insert_rounds=4, refit_budget=128,
    )
    cfg_x = MapConfig(**base, use_pallas_refit=False)
    cfg_p = MapConfig(**base, use_pallas_refit=True)

    n = 300
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.8
    pts[:, 2] *= 0.02  # near-planar sheet -> plenty of plane fits
    var = np.tile(1e-4 * np.eye(3, dtype=np.float32), (n, 1, 1))
    mask = np.ones(n, dtype=bool)

    vm_x = insert_points(make_map(cfg_x), cfg_x, jnp.asarray(pts),
                         jnp.asarray(var), jnp.asarray(mask))
    vm_p = insert_points(make_map(cfg_p), cfg_p, jnp.asarray(pts),
                         jnp.asarray(var), jnp.asarray(mask))

    np.testing.assert_array_equal(np.asarray(vm_x.occ), np.asarray(vm_p.occ))
    np.testing.assert_allclose(
        np.asarray(vm_x.meta), np.asarray(vm_p.meta), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(vm_x.mom), np.asarray(vm_p.mom), atol=1e-6)
    pl_x, pl_p = np.asarray(vm_x.plane), np.asarray(vm_p.plane)
    scale = max(1.0, np.abs(pl_x).max())
    np.testing.assert_allclose(pl_p, pl_x, atol=5e-4 * scale)
