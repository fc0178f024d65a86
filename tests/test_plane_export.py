"""Plane-map export: extraction honors hierarchy; PLY is well-formed."""

import numpy as np
import jax.numpy as jnp

from legkilo_tpu.core import voxel_map as vmap
from legkilo_tpu.io import plane_export


def test_extract_and_write(tmp_path, rng):
    cfg = vmap.MapConfig(
        levels=2, capacity=512, probe=8, voxel_size=0.5,
        planer_threshold=0.01, sigma_num=3.0, max_points_num=50,
        init_num=(5, 5),
    )
    vm = vmap.make_map(cfg)
    n = 600
    pts = np.zeros((n, 3))
    pts[:, 0] = rng.uniform(-2, 2, n)
    pts[:, 1] = rng.uniform(-2, 2, n)
    pts[:, 2] = 0.25 + rng.normal(scale=0.002, size=n)
    var = np.tile(np.eye(3)[None] * 1e-4, (n, 1, 1))
    vm = vmap.insert_points(
        vm, cfg, jnp.asarray(pts, dtype=jnp.float32),
        jnp.asarray(var, dtype=jnp.float32), jnp.ones(n, dtype=bool),
    )
    planes = plane_export.extract_planes(vm, cfg)
    assert len(planes) >= 5
    # All extracted planes are near z=0.25 with +-z normals.
    for p in planes:
        assert abs(abs(p["normal"][2]) - 1.0) < 0.05
        assert abs(p["center"][2] - 0.25) < 0.02
    # No level-1 plane may be shadowed by a planar parent.
    l0_keys = {
        tuple(k) for k, o, ip in zip(
            np.asarray(vm.key[:cfg.capacity]),
            np.asarray(vm.occ[:cfg.capacity]),
            np.asarray(vm.is_plane()[:cfg.capacity]),
        ) if o and ip
    }
    for p in planes:
        if p["level"] == 1:
            key = tuple(np.floor(np.asarray(p["center"]) / 0.25).astype(int) >> 1)
            assert key not in l0_keys

    ply = tmp_path / "planes.ply"
    js = tmp_path / "planes.json"
    count = plane_export.export_plane_map(vm, cfg, str(ply), str(js))
    assert count == len(planes)
    text = ply.read_text().splitlines()
    assert text[0] == "ply"
    nverts = int([l for l in text if l.startswith("element vertex")][0].split()[-1])
    assert nverts == count * 13  # center + 12 rim vertices per disk


def test_map_jet_endpoints():
    assert plane_export.map_jet(0.0) == (0, 0, int(255 * 0.504))
    r, g, b = plane_export.map_jet(0.5)
    assert g == 255 or g >= 250  # mid is green-dominated
    r, g, b = plane_export.map_jet(1.0)
    assert r > 100 and g == 0 and b == 0
