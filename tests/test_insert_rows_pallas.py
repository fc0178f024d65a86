"""Pallas insert-rows kernel (interpret mode) vs the XLA insert phase.

The kernel folds the deferred insert phase's post-update pose transform,
world-covariance propagation, and packed-moment construction into one
launch (ops/pallas/insert_rows.py); this pins its output and the resulting
map state to the XLA path (KILO.cc:216-231 + voxel_map.cc:185-241
semantics, realized in core/voxel_map.insert_points_hinted).
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


def _setup(use_pallas_insert):
    cfg = Config()
    cfg.only_imu_use = True
    cfg.lidar.filter_num = 2
    cfg.lidar.blind = 0.3
    cfg.lidar.voxel_grid_resolution = 0.4
    cfg.voxel_map.capacity_log2 = 12
    cfg.voxel_map.insert_row_cap = 1024
    cfg.tpu.max_buckets = 16
    cfg.tpu.max_points_per_bucket = 96

    scfg = StaticConfig(
        map_cfg=map_config_from(cfg.voxel_map),
        use_kin=False,
        dept_err=cfg.voxel_map.dept_err,
        beam_err=cfg.voxel_map.beam_err,
        pipeline="deferred",
        match_cap=1024,
        insert_cap=1024,
        use_pallas_insert=use_pallas_insert,
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
    return scfg, params, [to_device_packet(p) for p in packets]


def test_insert_rows_pallas_matches_xla():
    """One fused-pipeline step from a shared prebuilt carry: map state and
    outputs agree tightly (the kernel only reassociates float products);
    a short replay then bounds the compounding drift."""
    scfg_x, params, dev = _setup(False)
    scfg_p, _, _ = _setup(True)
    assert scfg_p.use_pallas_insert and not scfg_x.use_pallas_insert

    step_x = jax.jit(fd.process_scan_deferred, static_argnums=3)
    step_p = jax.jit(fd.process_scan_deferred, static_argnums=3)
    carry = init_carry(scfg_x)
    for pkt in dev[:6]:
        carry, _ = step_x(carry, pkt, params, scfg_x)

    cx, ox = step_x(carry, dev[6], params, scfg_x)
    cp, op = step_p(carry, dev[6], params, scfg_p)
    np.testing.assert_array_equal(
        np.asarray(op.n_matched), np.asarray(ox.n_matched)
    )
    np.testing.assert_allclose(
        np.asarray(op.pos), np.asarray(ox.pos), rtol=1e-6, atol=1e-7
    )
    # Map state: occupancy/slot metadata identical, float tables close.
    np.testing.assert_array_equal(np.asarray(cp.vm.ptab), np.asarray(cx.vm.ptab))
    np.testing.assert_array_equal(np.asarray(cp.vm.ocnt), np.asarray(cx.vm.ocnt))
    np.testing.assert_allclose(
        np.asarray(cp.vm.meta), np.asarray(cx.vm.meta), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(cp.vm.mom), np.asarray(cx.vm.mom), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(cp.vm.moms), np.asarray(cx.vm.moms), rtol=2e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(cp.vm.plane), np.asarray(cx.vm.plane), rtol=5e-2, atol=1e-3
    )

    # Replay drift stays at float-noise level over a few more scans.
    for pkt in dev[7:10]:
        cx, _ = step_x(cx, pkt, params, scfg_x)
        cp, _ = step_p(cp, pkt, params, scfg_p)
    np.testing.assert_allclose(
        np.asarray(cp.state.pos), np.asarray(cx.state.pos),
        rtol=1e-3, atol=1e-3,
    )


def test_moment_rows_match_pack_moments():
    """Kernel rows == _pack_moments(point_moments(...)) on random inputs."""
    from legkilo_tpu.core.voxel_map import _pack_moments
    from legkilo_tpu.core.plane_fit import point_moments
    from legkilo_tpu.ops.pallas import insert_rows as ir

    rng = np.random.default_rng(3)
    r = 256
    p_i = rng.normal(size=(r, 3)).astype(np.float32)
    rb = np.tile(np.eye(3, dtype=np.float32), (r, 1, 1))
    # random small rotations per row
    ang = rng.normal(scale=0.2, size=(r,)).astype(np.float32)
    rb[:, 0, 0] = np.cos(ang); rb[:, 0, 1] = -np.sin(ang)
    rb[:, 1, 0] = np.sin(ang); rb[:, 1, 1] = np.cos(ang)
    pb = rng.normal(size=(r, 3)).astype(np.float32)
    a = rng.normal(size=(r, 3, 3)).astype(np.float32)
    bc = a @ np.swapaxes(a, 1, 2) * 0.01
    b = rng.normal(size=(r, 3, 3)).astype(np.float32)
    rc = b @ np.swapaxes(b, 1, 2) * 0.001
    c = rng.normal(size=(r, 3, 3)).astype(np.float32)
    pc = c @ np.swapaxes(c, 1, 2) * 0.001
    ext_r = np.asarray(
        [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], np.float32
    )
    keys = rng.integers(-20, 20, size=(r, 3)).astype(np.float32)
    size = np.full((1, r), 0.5, np.float32)

    par = np.zeros((1, ir.PAR_W), np.float32)
    par[0, 0:9] = ext_r.reshape(9)
    prow = np.concatenate([p_i, bc.reshape(r, 9)], axis=1).T
    brow = np.concatenate(
        [rb.reshape(r, 9), pb, rc.reshape(r, 9), pc.reshape(r, 9)], axis=1
    ).T
    out = ir.moments_call(
        jnp.asarray(par), jnp.asarray(prow), jnp.asarray(brow),
        jnp.asarray(keys.T), jnp.asarray(size),
        interpret=True, block=128,
    )

    # Reference: the XLA phase-3 math.
    p_w = np.einsum("cij,cj->ci", rb, p_i) + pb
    re = np.einsum("cij,jk->cik", rb, ext_r)
    sk = np.zeros((r, 3, 3), np.float32)
    sk[:, 0, 1] = -p_i[:, 2]; sk[:, 0, 2] = p_i[:, 1]
    sk[:, 1, 0] = p_i[:, 2]; sk[:, 1, 2] = -p_i[:, 0]
    sk[:, 2, 0] = -p_i[:, 1]; sk[:, 2, 1] = p_i[:, 0]
    rcm = np.einsum("cij,cjk->cik", rb, sk)
    var = (
        np.einsum("cij,cjk,clk->cil", re, bc, re)
        + np.einsum("cij,cjk,clk->cil", rcm, rc, rcm)
        + pc
    )
    vc = (keys + 0.5) * 0.5
    p_rel = p_w - vc
    mom_ref, moms_ref = _pack_moments(
        point_moments(jnp.asarray(p_rel), jnp.asarray(var))
    )
    np.testing.assert_allclose(
        np.asarray(out[0:9].T), np.asarray(mom_ref), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out[9:69].T), np.asarray(moms_ref), rtol=1e-4, atol=1e-6
    )
