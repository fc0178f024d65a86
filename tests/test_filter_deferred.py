"""Deferred pipeline: must track ground truth like the sequential rollout."""

import numpy as np
import pytest

from legkilo_tpu.config import Config
from legkilo_tpu.io.tum import ate_rmse
from legkilo_tpu.models import sim
from legkilo_tpu.runner import run_offline


def make_config(pipeline, only_imu=True, use_pallas=False):
    cfg = Config()
    cfg.only_imu_use = only_imu
    cfg.lidar.filter_num = 1
    cfg.lidar.blind = 0.3
    cfg.lidar.voxel_grid_resolution = 0.4
    cfg.voxel_map.capacity_log2 = 13
    cfg.tpu.max_buckets = 56
    cfg.tpu.max_points_per_bucket = 96
    cfg.tpu.max_imu_per_bucket = 3
    cfg.tpu.pipeline = pipeline
    cfg.tpu.use_pallas = use_pallas
    return cfg


@pytest.fixture(scope="module")
def simdata():
    return sim.simulate(sim.SimConfig(duration=5.0, scan_points=3000, seed=3))


def run_ate(cfg, simdata, events):
    results = run_offline(cfg, simdata.scans, events)
    assert len(results) >= 45
    est_t = np.array([r.time for r in results])
    est_p = np.stack([r.pos for r in results])
    _, gt_pos_f = simdata.gt_in_filter_frame()
    gtm = {round(t, 6): i for i, t in enumerate(simdata.gt_times)}
    sel = [i for i, t in enumerate(est_t) if round(t, 6) in gtm]
    idx = [gtm[round(est_t[i], 6)] for i in sel]
    ratios = [
        r.n_matched / max(r.n_points, 1) for r in results[len(results) // 2 :]
    ]
    return ate_rmse(est_p[sel], gt_pos_f[idx], align=False), float(np.mean(ratios))


def test_deferred_imu_tracks_ground_truth(simdata):
    err, ratio = run_ate(make_config("deferred"), simdata, simdata.imu)
    assert ratio > 0.5, f"match ratio {ratio:.2f}"
    assert err < 0.08, f"ATE {err:.3f} m"


def test_deferred_kin_tracks_ground_truth(simdata):
    err, ratio = run_ate(
        make_config("deferred", only_imu=False), simdata, simdata.kin
    )
    assert err < 0.08, f"ATE {err:.3f} m"


def test_deferred_close_to_sequential(simdata):
    """Pipelines share semantics: trajectories must agree closely."""
    res_s = run_offline(make_config("sequential"), simdata.scans, simdata.imu)
    res_d = run_offline(make_config("deferred"), simdata.scans, simdata.imu)
    ps = np.stack([r.pos for r in res_s])
    pd = np.stack([r.pos for r in res_d])
    n = min(len(ps), len(pd))
    diff = np.linalg.norm(ps[:n] - pd[:n], axis=-1)
    assert diff.max() < 0.05, f"max pipeline divergence {diff.max():.3f} m"


def test_insert_cap_equivalence(simdata):
    """Compacted insertion (cap >= #valid) must match uncompacted exactly."""
    import jax
    import jax.numpy as jnp
    from legkilo_tpu.core import eskf as eskf_mod
    from legkilo_tpu.core.filter import FilterParams, StaticConfig, init_carry
    from legkilo_tpu.core.filter_deferred import process_scan_deferred
    from legkilo_tpu.core.voxel_map import map_config_from
    from legkilo_tpu.io.dataset import PacketBuilder, to_device_packet

    cfg = make_config("deferred")
    builder = PacketBuilder(cfg)
    for ev in simdata.imu:
        builder.add_imu(ev)
    packets = []
    for scan in simdata.scans[:8]:
        builder.add_scan(scan)
        while builder.ready():
            packets.append(builder.pop())
    base = StaticConfig(
        map_cfg=map_config_from(cfg.voxel_map), use_kin=False,
        dept_err=cfg.voxel_map.dept_err, beam_err=cfg.voxel_map.beam_err,
        pipeline="deferred",
    )
    params = FilterParams(
        noise=eskf_mod.make_noise_params(cfg.eskf),
        ext_r=jnp.eye(3), ext_t=jnp.asarray([0.0, 0.0, 0.2]),
        g_over_acc_norm=jnp.asarray(1.0),
    )
    outs = {}
    for cap in (0, 4096):
        scfg = base._replace(insert_cap=cap, match_cap=cap)
        carry = init_carry(scfg)
        for pkt in packets[:5]:
            carry, out = jax.jit(process_scan_deferred, static_argnums=3)(
                carry, to_device_packet(pkt), params, scfg
            )
        outs[cap] = (np.asarray(out.pos), np.asarray(carry.vm.n()).sum())
    np.testing.assert_allclose(outs[0][0], outs[4096][0], atol=1e-6)
    assert outs[0][1] == outs[4096][1]  # same number of points in the map


def test_ancestor_gated_insert_close_to_ungated(simdata):
    """insert_row_cap gates child-level rows on non-plane ancestors (the
    reference's UpdateOctoTree descent); trajectories must stay close to
    ungated all-level insertion and still track ground truth."""
    cfg_g = make_config("deferred")
    cfg_g.voxel_map.insert_row_cap = 4096
    err_g, ratio_g = run_ate(cfg_g, simdata, simdata.imu)
    assert ratio_g > 0.5, f"match ratio {ratio_g:.2f}"
    assert err_g < 0.08, f"gated ATE {err_g:.3f} m"

    res_u = run_offline(make_config("deferred"), simdata.scans, simdata.imu)
    res_g = run_offline(cfg_g, simdata.scans, simdata.imu)
    pu = np.stack([r.pos for r in res_u])
    pg = np.stack([r.pos for r in res_g])
    n = min(len(pu), len(pg))
    diff = np.linalg.norm(pu[:n] - pg[:n], axis=-1)
    assert diff.max() < 0.05, f"max gated/ungated divergence {diff.max():.3f} m"


def test_cap_overflow_is_counted_not_silent(simdata):
    """Overflowing match/insert caps and insert_row_cap must surface as
    nonzero counters (VERDICT weak #5: the reference has no caps, so any
    capped drop in the TPU build needs visibility)."""
    import jax
    import jax.numpy as jnp
    from legkilo_tpu.core import eskf as eskf_mod
    from legkilo_tpu.core.filter import FilterParams, StaticConfig, init_carry
    from legkilo_tpu.core.filter_deferred import process_scan_deferred
    from legkilo_tpu.core.voxel_map import OCNT_ROWCAP, map_config_from
    from legkilo_tpu.io.dataset import PacketBuilder, to_device_packet

    cfg = make_config("deferred")
    cfg.voxel_map.insert_row_cap = 64   # far below the gated row count
    builder = PacketBuilder(cfg)
    for ev in simdata.imu:
        builder.add_imu(ev)
    packets = []
    for scan in simdata.scans[:4]:
        builder.add_scan(scan)
        while builder.ready():
            packets.append(builder.pop())
    scfg = StaticConfig(
        map_cfg=map_config_from(cfg.voxel_map), use_kin=False,
        dept_err=cfg.voxel_map.dept_err, beam_err=cfg.voxel_map.beam_err,
        pipeline="deferred", insert_cap=128, match_cap=128,
    )
    params = FilterParams(
        noise=eskf_mod.make_noise_params(cfg.eskf),
        ext_r=jnp.eye(3), ext_t=jnp.asarray([0.0, 0.0, 0.2]),
        g_over_acc_norm=jnp.asarray(1.0),
    )
    carry = init_carry(scfg)
    step = jax.jit(process_scan_deferred, static_argnums=3)
    total_capped = 0
    for pkt in packets[:3]:
        carry, out = step(carry, to_device_packet(pkt), params, scfg)
        total_capped += int(out.n_cap_dropped)
    assert total_capped > 0, "cap overflow was not counted"
    assert int(carry.vm.ocnt[OCNT_ROWCAP]) > 0, "row-cap overflow not counted"
    assert int(out.map_overflow[OCNT_ROWCAP]) > 0, "per-scan delta missing"

    # And with generous caps the counters stay zero.
    cfg2 = make_config("deferred")
    scfg2 = StaticConfig(
        map_cfg=map_config_from(cfg2.voxel_map), use_kin=False,
        dept_err=cfg2.voxel_map.dept_err, beam_err=cfg2.voxel_map.beam_err,
        pipeline="deferred",
    )
    carry2 = init_carry(scfg2)
    for pkt in packets[:3]:
        carry2, out2 = step(carry2, to_device_packet(pkt), params, scfg2)
    assert int(out2.n_cap_dropped) == 0
    assert int(carry2.vm.ocnt[OCNT_ROWCAP]) == 0


def test_chunked_replay_bit_identical(simdata):
    """process_scan_chunk (lax.scan over pre-staged packets, one dispatch)
    must be bit-identical to per-scan stepping — it exists purely to
    amortize host dispatch on rigs where the device outruns the host."""
    import jax
    import jax.numpy as jnp

    from legkilo_tpu.core import eskf as eskf_mod
    from legkilo_tpu.core.filter import (
        FilterParams, init_carry, process_scan_any, process_scan_chunk,
        stack_scan_packets,
    )
    from legkilo_tpu.io.dataset import PacketBuilder, to_device_packet
    from legkilo_tpu.runner import make_static_config

    cfg = make_config("deferred")
    scfg = make_static_config(cfg)
    params = FilterParams(
        noise=eskf_mod.make_noise_params(cfg.eskf),
        ext_r=jnp.eye(3),
        ext_t=jnp.asarray([0.0, 0.0, 0.2]),
        g_over_acc_norm=jnp.asarray(1.0),
    )
    builder = PacketBuilder(cfg)
    for ev in simdata.imu:
        builder.add_imu(ev)
    pkts = []
    for scan in simdata.scans:
        builder.add_scan(scan)
        while builder.ready() and len(pkts) < 8:
            pkts.append(to_device_packet(builder.pop()))
    step = jax.jit(process_scan_any, static_argnums=3)
    c1 = init_carry(scfg)
    pos1 = []
    for p in pkts:
        c1, o = step(c1, p, params, scfg)
        pos1.append(np.asarray(o.pos))
    chunk = jax.jit(process_scan_chunk, static_argnums=3)
    c2 = init_carry(scfg)
    for k in range(0, 8, 4):
        c2, o = chunk(c2, stack_scan_packets(pkts[k : k + 4]), params, scfg)
        for i in range(4):
            np.testing.assert_array_equal(pos1[k + i], np.asarray(o.pos[i]))
    np.testing.assert_array_equal(
        np.asarray(c1.state.pos), np.asarray(c2.state.pos)
    )
    np.testing.assert_array_equal(np.asarray(c1.vm.mom), np.asarray(c2.vm.mom))
