"""Pallas pose-propagation kernel (interpret mode) vs the XLA IMU path.

The kernel folds the IMU match-pose propagation's parallel scans (latch,
cummax, matmul prefix product, two cumsums over the interleaved
event/bucket timeline — core/filter_deferred._predicted_bucket_poses_imu,
semantics of KILO.cc:373-395 zero-order-hold mean propagation) into one
launch; this pins its per-bucket poses to the XLA path.
"""

import numpy as np
import jax
import jax.numpy as jnp

from legkilo_tpu.config import Config
from legkilo_tpu.core import eskf as eskf_mod
from legkilo_tpu.core.filter import FilterParams, StaticConfig, init_carry
from legkilo_tpu.core import filter_deferred as fd
from legkilo_tpu.core.voxel_map import map_config_from
from legkilo_tpu.io.dataset import PacketBuilder, to_device_packet
from legkilo_tpu.models import sim


def _setup():
    cfg = Config()
    cfg.only_imu_use = True
    cfg.lidar.filter_num = 2
    cfg.lidar.blind = 0.3
    cfg.lidar.voxel_grid_resolution = 0.4
    cfg.voxel_map.capacity_log2 = 12
    cfg.tpu.max_buckets = 16
    cfg.tpu.max_points_per_bucket = 96
    cfg.tpu.max_imu_per_bucket = 2

    scfg = StaticConfig(
        map_cfg=map_config_from(cfg.voxel_map),
        use_kin=False,
        dept_err=cfg.voxel_map.dept_err,
        beam_err=cfg.voxel_map.beam_err,
        pipeline="deferred",
        match_cap=1024,
        insert_cap=1024,
        match_pose="imu",
    )
    params = FilterParams(
        noise=eskf_mod.make_noise_params(cfg.eskf),
        ext_r=jnp.eye(3),
        ext_t=jnp.asarray([0.0, 0.0, 0.2]),
        g_over_acc_norm=jnp.asarray(1.0),
    )
    # Rich dynamics so the latched rates and rotation chain matter.
    data = sim.simulate(
        sim.SimConfig(duration=1.5, scan_points=2000, seed=5)
    )
    builder = PacketBuilder(cfg)
    for ev in data.imu:
        builder.add_imu(ev)
    packets = []
    for scan in data.scans:
        builder.add_scan(scan)
        while builder.ready():
            packets.append(builder.pop())
    return scfg, params, [to_device_packet(p) for p in packets]


def test_pose_prop_pallas_matches_xla():
    scfg, params, dev = _setup()
    step = jax.jit(fd.process_scan_deferred, static_argnums=3)
    carry = init_carry(scfg)
    for pkt in dev[:4]:
        carry, _ = step(carry, pkt, params, scfg)

    for pkt in dev[4:7]:
        rb_x, pb_x = fd._predicted_bucket_poses_imu(carry, pkt, params)
        rb_p, pb_p = jax.jit(fd._predicted_bucket_poses_imu_pallas)(
            carry, pkt, params
        )
        np.testing.assert_allclose(
            np.asarray(rb_p), np.asarray(rb_x), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(pb_p), np.asarray(pb_x), rtol=1e-5, atol=1e-6
        )
        carry, _ = step(carry, pkt, params, scfg)


def test_pose_prop_full_pipeline_agrees():
    scfg, params, dev = _setup()
    scfg_p = scfg._replace(use_pallas_pose=True)
    step_x = jax.jit(fd.process_scan_deferred, static_argnums=3)
    step_p = jax.jit(fd.process_scan_deferred, static_argnums=3)
    cx = init_carry(scfg)
    cp = init_carry(scfg_p)
    for pkt in dev[:8]:
        cx, ox = step_x(cx, pkt, params, scfg)
        cp, op = step_p(cp, pkt, params, scfg_p)
    np.testing.assert_allclose(
        np.asarray(cp.state.pos), np.asarray(cx.state.pos),
        rtol=1e-3, atol=1e-3,
    )
