"""Pallas match kernels (interpret mode) vs the XLA match phase."""

import numpy as np
import jax
import jax.numpy as jnp

from legkilo_tpu.config import Config
from legkilo_tpu.core import eskf as eskf_mod
from legkilo_tpu.core.filter import FilterParams, StaticConfig, init_carry
from legkilo_tpu.core import filter_deferred as fd
from legkilo_tpu.core.voxel_map import insert_points, map_config_from
from legkilo_tpu.io.dataset import PacketBuilder, to_device_packet
from legkilo_tpu.models import sim


def _setup(match_cap=1024):
    cfg = Config()
    cfg.only_imu_use = True
    cfg.lidar.filter_num = 2
    cfg.lidar.blind = 0.3
    cfg.lidar.voxel_grid_resolution = 0.4
    cfg.voxel_map.capacity_log2 = 12
    cfg.tpu.max_buckets = 16
    cfg.tpu.max_points_per_bucket = 96

    scfg = StaticConfig(
        map_cfg=map_config_from(cfg.voxel_map),
        use_kin=False,
        dept_err=cfg.voxel_map.dept_err,
        beam_err=cfg.voxel_map.beam_err,
        pipeline="deferred",
        match_cap=match_cap,
        insert_cap=match_cap,
    )
    params = FilterParams(
        noise=eskf_mod.make_noise_params(cfg.eskf),
        ext_r=jnp.eye(3),
        ext_t=jnp.asarray([0.0, 0.0, 0.2]),
        g_over_acc_norm=jnp.asarray(1.0),
    )
    data = sim.simulate(sim.SimConfig(duration=1.2, scan_points=2500, seed=11))
    builder = PacketBuilder(cfg)
    for ev in data.imu:
        builder.add_imu(ev)
    packets = []
    for scan in data.scans:
        builder.add_scan(scan)
        while builder.ready():
            packets.append(builder.pop())
    dev = [to_device_packet(p) for p in packets]

    # Run a few scans through the reference fused pipeline to build a real
    # map + carry, then compare the match phase on the next packet.
    step = jax.jit(fd.process_scan_deferred, static_argnums=3)
    carry = init_carry(scfg)
    for p in dev[:6]:
        carry, _ = step(carry, p, params, scfg)
    return scfg, params, carry, dev[6]


def test_match_pallas_matches_xla():
    scfg, params, carry, pkt = _setup()
    cap = scfg.match_cap

    s40_r, nm_r, aux_r = fd._match_compact_stats(carry, pkt, params, scfg, cap)
    s40_p, nm_p, aux_p = fd._match_compact_stats_pallas(
        carry, pkt, params, scfg, cap
    )

    np.testing.assert_array_equal(np.asarray(nm_p), np.asarray(nm_r))
    # s40 entries span ~1e4 dynamic range; compare with mixed tolerance.
    np.testing.assert_allclose(
        np.asarray(s40_p), np.asarray(s40_r), rtol=2e-4, atol=2e-3
    )

    names = [
        "order", "bidx", "pts_c", "p_i_c", "cross_c", "body_cov_c",
        "mask_c", "own_keys", "own_slot", "own_found", "own_plane",
    ]
    for name, a_r, a_p in zip(names, aux_r, aux_p):
        if name in ("order", "bidx", "mask_c", "own_keys", "own_slot",
                    "own_found", "own_plane"):
            np.testing.assert_array_equal(
                np.asarray(a_p), np.asarray(a_r), err_msg=name
            )
        else:
            np.testing.assert_allclose(
                np.asarray(a_p), np.asarray(a_r), rtol=1e-5, atol=1e-6,
                err_msg=name,
            )


def test_match_pallas_full_pipeline_agrees():
    """End-to-end: trajectories agree between XLA and Pallas match phases."""
    scfg, params, carry0, pkt = _setup()
    scfg_p = scfg._replace(use_pallas_match=True)

    step_r = jax.jit(fd.process_scan_deferred, static_argnums=3)
    step_p = jax.jit(fd.process_scan_deferred, static_argnums=3)
    c_r, o_r = step_r(carry0, pkt, params, scfg)
    c_p, o_p = step_p(carry0, pkt, params, scfg_p)

    np.testing.assert_array_equal(int(o_p.n_matched), int(o_r.n_matched))
    np.testing.assert_allclose(
        np.asarray(o_p.pos), np.asarray(o_r.pos), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(c_p.state.lin), np.asarray(c_r.state.lin), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(c_p.vm.occ).sum(), np.asarray(c_r.vm.occ).sum()
    )
