"""Vmapped-Pallas fleet step vs the plain-XLA fleet step (CPU interpret).

Round-5 fleet finding (docs/PERF_NOTES.md): at B=64 XLA lowers the
batched probe/symmetry gathers of the plain fleet step to serialized
while loops; running the Pallas kernels inside the vmapped step removes
those gathers entirely and measures +22-25% replica throughput on the
round-5 rig.  This pins the two lowerings to the same trajectory.
"""

import numpy as np
import jax
import jax.numpy as jnp

from legkilo_tpu.config import Config
from legkilo_tpu.core import eskf as eskf_mod
from legkilo_tpu.core.filter import FilterParams, first_frame_map
from legkilo_tpu.models import sim
from legkilo_tpu.io.dataset import PacketBuilder, to_device_packet
from legkilo_tpu.parallel.sweep import (
    batched_carry, broadcast_packets, make_fleet_step, perturb_params,
)
from legkilo_tpu.runner import make_static_config


def _build(pallas):
    cfg = Config()
    cfg.only_imu_use = True
    cfg.lidar.filter_num = 1
    cfg.lidar.blind = 0.3
    cfg.lidar.voxel_grid_resolution = 0.4
    cfg.voxel_map.capacity_log2 = 11
    cfg.voxel_map.insert_row_cap = 512
    cfg.tpu.max_buckets = 8
    cfg.tpu.max_points_per_bucket = 128
    cfg.tpu.max_imu_per_bucket = 1
    cfg.tpu.pipeline = "deferred"
    cfg.tpu.insert_cap = 512
    cfg.tpu.match_cap = 512
    if pallas:
        cfg.tpu.use_pallas = True
        cfg.tpu.use_pallas_match = True
        cfg.tpu.use_pallas_insert = True
        cfg.tpu.use_pallas_pose = True
    return make_static_config(cfg), cfg


def test_fleet_step_pallas_matches_xla():
    scfg_p, cfg = _build(True)
    scfg_x, _ = _build(False)
    params = FilterParams(
        noise=eskf_mod.make_noise_params(cfg.eskf),
        ext_r=jnp.eye(3),
        ext_t=jnp.asarray([0.0, 0.0, 0.2]),
        g_over_acc_norm=jnp.asarray(1.0),
    )
    data = sim.simulate(sim.SimConfig(duration=0.8, scan_points=5000, seed=3))
    builder = PacketBuilder(cfg)
    for ev in data.imu:
        builder.add_imu(ev)
    pk = []
    for s in data.scans:
        builder.add_scan(s)
        while builder.ready():
            pk.append(builder.pop())
    dev = [to_device_packet(p) for p in pk]
    B = 2
    bparams = perturb_params(params, B, scale=0.0)

    def run(scfg):
        carry = batched_carry(scfg, B)
        pts0 = jnp.stack([dev[0].points.reshape(-1, 3)] * B)
        m0 = jnp.stack([dev[0].point_mask.reshape(-1)] * B)
        boot = jax.vmap(
            lambda c, p, pt, m: first_frame_map(c, scfg, p, pt, m)
        )
        carry = boot(carry, bparams, pts0, m0)
        step = make_fleet_step(scfg)
        for p in dev[1:5]:
            carry, out, stats = step(carry, broadcast_packets(p, B), bparams)
        return carry, stats

    cp, sp = run(scfg_p)
    cx, sx = run(scfg_x)
    assert float(sx.mean_matched) > 0, "XLA fleet arm never matched"
    assert float(sp.mean_matched) > 0, "Pallas fleet arm never matched"
    # Float-reassociation drift only (match flips of +-1 allowed).
    np.testing.assert_allclose(
        float(sp.mean_matched), float(sx.mean_matched), atol=3.0
    )
    np.testing.assert_allclose(
        np.asarray(cp.state.pos), np.asarray(cx.state.pos),
        rtol=2e-3, atol=2e-3,
    )
