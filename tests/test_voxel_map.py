"""Voxel hash map: insertion, plane formation, matching, sliding."""

import numpy as np
import jax.numpy as jnp

from legkilo_tpu.core import voxel_map as vmap
import oracle


def small_cfg(levels=3, capacity=1024):
    return vmap.MapConfig(
        levels=levels,
        capacity=capacity,
        probe=8,
        voxel_size=0.5,
        planer_threshold=0.01,
        sigma_num=3.0,
        max_points_num=50,
        init_num=(5,) * levels,
    )


def plane_points(rng, n, z=0.0, extent=2.0, noise=0.002):
    pts = np.zeros((n, 3))
    pts[:, 0] = rng.uniform(-extent, extent, n)
    pts[:, 1] = rng.uniform(-extent, extent, n)
    pts[:, 2] = z + rng.normal(scale=noise, size=n)
    return pts


def default_vars(n, scale=1e-4):
    return np.tile(np.eye(3)[None] * scale, (n, 1, 1))


def test_hash_insert_lookup_roundtrip(rng):
    cfg = small_cfg()
    vm = vmap.make_map(cfg)
    pts = rng.uniform(-5, 5, size=(200, 3)).astype(np.float32)
    keys = np.floor(pts / cfg.voxel_size).astype(np.int32)
    ptab, slot, ok = vmap._find_or_insert(
        vm.ptab[: cfg.capacity], jnp.asarray(keys), jnp.ones(200, dtype=bool), cfg
    )
    ok = np.asarray(ok)
    assert ok.all(), f"dropped {200 - ok.sum()} inserts"
    # Same keys must find the same slots.
    slot2, found, _, _, _ = vmap._probe_find(ptab, jnp.asarray(keys), cfg)
    assert np.asarray(found).all()
    np.testing.assert_array_equal(np.asarray(slot2), np.asarray(slot))
    # Duplicate keys share one slot.
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    slots = np.asarray(slot)
    for u in range(len(uniq)):
        assert len(set(slots[inv == u])) == 1


def test_masked_points_not_inserted(rng):
    cfg = small_cfg()
    vm = vmap.make_map(cfg)
    pts = jnp.asarray(plane_points(rng, 40), dtype=jnp.float32)
    var = jnp.asarray(default_vars(40), dtype=jnp.float32)
    mask = jnp.zeros(40, dtype=bool)
    vm2 = vmap.insert_points(vm, cfg, pts, var, mask)
    assert not bool(np.asarray(vm2.occ).any())
    assert float(np.asarray(vm2.n()).sum()) == 0.0


def test_plane_formation_matches_oracle(rng):
    """Points on z=0 in one voxel -> plane with normal ~ +-z and the oracle's
    plane_var."""
    cfg = small_cfg()
    vm = vmap.make_map(cfg)
    n = 30
    pts = plane_points(rng, n, extent=0.24)
    pts += 0.25  # plane z=0.25, strictly inside voxel [0, 0.5)^3
    var = default_vars(n)
    vm2 = vmap.insert_points(
        vm, cfg,
        jnp.asarray(pts, dtype=jnp.float32),
        jnp.asarray(var, dtype=jnp.float32),
        jnp.ones(n, dtype=bool),
    )
    occ = np.asarray(vm2.occ[: cfg.capacity])
    assert occ.sum() >= 1
    keys = np.floor(pts / cfg.voxel_size).astype(np.int32)
    assert (keys == keys[0]).all()
    slot, found, _, _, _ = vmap._probe_find(
        vm2.ptab[: cfg.capacity], jnp.asarray(keys[:1]), cfg
    )
    s = int(np.asarray(slot)[0])
    assert bool(np.asarray(found)[0])
    assert bool(np.asarray(vm2.is_plane())[s])
    normal = np.asarray(vm2.normal())[s]
    assert abs(abs(normal[2]) - 1.0) < 1e-3

    om = oracle.plane_fit(pts, var, 0.01)
    vc = (keys[0] + 0.5) * cfg.voxel_size
    np.testing.assert_allclose(
        np.asarray(vm2.center_rel())[s] + vc, om["center"], atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(vm2.evals())[s], om["evals"], atol=1e-4)
    pv = np.asarray(vm2.plane_var())[s].astype(np.float64)
    sign = np.sign(normal @ om["normal"])
    if sign < 0:
        pv[0:3, 3:6] *= -1
        pv[3:6, 0:3] *= -1
    scale = max(np.abs(om["plane_var"]).max(), 1e-9)
    np.testing.assert_allclose(pv, om["plane_var"], atol=5e-3 * scale)


def test_match_points_on_plane(rng):
    cfg = small_cfg()
    vm = vmap.make_map(cfg)
    n = 1500
    pts = plane_points(rng, n, z=0.25, extent=2.0)
    var = default_vars(n)
    vm = vmap.insert_points(
        vm, cfg,
        jnp.asarray(pts, dtype=jnp.float32),
        jnp.asarray(var, dtype=jnp.float32),
        jnp.ones(n, dtype=bool),
    )
    # Query points on the same plane.
    q = plane_points(rng, 64, z=0.25, extent=1.5, noise=0.001)
    qvar = default_vars(64)
    res = vmap.match_points(
        vm, cfg,
        jnp.asarray(q, dtype=jnp.float32),
        jnp.asarray(qvar, dtype=jnp.float32),
        jnp.ones(64, dtype=bool),
    )
    matched = np.asarray(res.matched)
    assert matched.mean() > 0.9, f"only {matched.mean():.2f} matched"
    normals = np.asarray(res.normal)[matched]
    assert (np.abs(normals[:, 2]) > 0.99).all()
    dists = np.asarray(res.signed_dist)[matched]
    assert np.abs(dists).max() < 0.02

    # Far-away query points must not match.
    far = q + np.array([0.0, 0.0, 5.0])
    res_far = vmap.match_points(
        vm, cfg,
        jnp.asarray(far, dtype=jnp.float32),
        jnp.asarray(qvar, dtype=jnp.float32),
        jnp.ones(64, dtype=bool),
    )
    assert not np.asarray(res_far.matched).any()


def test_match_respects_mask(rng):
    cfg = small_cfg()
    vm = vmap.make_map(cfg)
    pts = plane_points(rng, 100, z=0.25)
    vm = vmap.insert_points(
        vm, cfg,
        jnp.asarray(pts, dtype=jnp.float32),
        jnp.asarray(default_vars(100), dtype=jnp.float32),
        jnp.ones(100, dtype=bool),
    )
    q = plane_points(rng, 8, z=0.25, extent=1.0)
    res = vmap.match_points(
        vm, cfg,
        jnp.asarray(q, dtype=jnp.float32),
        jnp.asarray(default_vars(8), dtype=jnp.float32),
        jnp.zeros(8, dtype=bool),
    )
    assert not np.asarray(res.matched).any()


def test_two_planes_pick_nearest(rng):
    """Floor at z=0 and wall at x=3: points near each must match the right
    plane."""
    cfg = small_cfg()
    vm = vmap.make_map(cfg)
    floor = plane_points(rng, 600, z=0.25, extent=2.0)
    wall = np.zeros((600, 3))
    wall[:, 0] = 3.1 + rng.normal(scale=0.002, size=600)
    wall[:, 1] = rng.uniform(-2, 2, 600)
    wall[:, 2] = rng.uniform(0.5, 3.0, 600)
    allp = np.concatenate([floor, wall])
    vm = vmap.insert_points(
        vm, cfg,
        jnp.asarray(allp, dtype=jnp.float32),
        jnp.asarray(default_vars(1200), dtype=jnp.float32),
        jnp.ones(1200, dtype=bool),
    )
    q = np.array([[1.0, 0.3, 0.254], [3.102, 0.5, 1.5]], dtype=np.float32)
    res = vmap.match_points(
        vm, cfg,
        jnp.asarray(q),
        jnp.asarray(default_vars(2), dtype=jnp.float32),
        jnp.ones(2, dtype=bool),
    )
    assert np.asarray(res.matched).all()
    n0, n1 = np.asarray(res.normal)
    assert abs(n0[2]) > 0.95  # floor normal ~ z
    assert abs(n1[0]) > 0.95  # wall normal ~ x


def test_freeze_stops_accumulation(rng):
    cfg = small_cfg()
    vm = vmap.make_map(cfg)
    pts = plane_points(rng, 60, extent=0.2)
    pts += 0.25  # strictly inside voxel [0, 0.5)^3
    var = default_vars(60)
    vm = vmap.insert_points(
        vm, cfg, jnp.asarray(pts, dtype=jnp.float32),
        jnp.asarray(var, dtype=jnp.float32), jnp.ones(60, dtype=bool),
    )
    n_before = np.asarray(vm.n()[: cfg.capacity]).sum()
    frozen = np.asarray(vm.frozen(cfg.max_points_num)[: cfg.capacity])
    assert frozen.any()
    # Insert more points into the same voxel: count must not grow there.
    vm2 = vmap.insert_points(
        vm, cfg, jnp.asarray(pts[:20], dtype=jnp.float32),
        jnp.asarray(var[:20], dtype=jnp.float32), jnp.ones(20, dtype=bool),
    )
    assert np.asarray(vm2.n()[: cfg.capacity])[frozen].sum() == np.asarray(vm.n()[: cfg.capacity])[frozen].sum()
    assert n_before >= 60  # all points landed pre-freeze


def test_slide_map_evicts_far_voxels(rng):
    cfg = small_cfg()
    vm = vmap.make_map(cfg)
    near = plane_points(rng, 300, z=0.25, extent=1.0)
    far = near + np.array([100.0, 0, 0])
    allp = np.concatenate([near, far])
    vm = vmap.insert_points(
        vm, cfg, jnp.asarray(allp, dtype=jnp.float32),
        jnp.asarray(default_vars(600), dtype=jnp.float32),
        jnp.ones(600, dtype=bool),
    )
    occ0 = np.asarray(vm.occ).sum()
    vm2 = vmap.slide_map(vm, cfg, jnp.zeros(3, dtype=jnp.float32), half_map_size=20)
    occ1 = np.asarray(vm2.occ).sum()
    assert occ1 < occ0
    # Near-plane still matchable, far voxels gone.
    q = plane_points(rng, 8, z=0.25, extent=0.8)
    res = vmap.match_points(
        vm2, cfg, jnp.asarray(q, dtype=jnp.float32),
        jnp.asarray(default_vars(8), dtype=jnp.float32), jnp.ones(8, dtype=bool),
    )
    assert np.asarray(res.matched).sum() >= 6
    qf = q + np.array([100.0, 0, 0])
    resf = vmap.match_points(
        vm2, cfg, jnp.asarray(qf, dtype=jnp.float32),
        jnp.asarray(default_vars(8), dtype=jnp.float32), jnp.ones(8, dtype=bool),
    )
    assert not np.asarray(resf.matched).any()
