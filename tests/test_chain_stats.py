"""Suffstats Pallas chain kernel (interpret mode) vs _chain_fused_core."""

import numpy as np
import jax.numpy as jnp

from legkilo_tpu.core import eskf_fused as ef
from legkilo_tpu.core.filter_deferred import _chain_fused_core
from legkilo_tpu.ops.pallas.chain_stats import run_chain_stats

from legkilo_tpu.config import EskfConfig
from legkilo_tpu.core import eskf as eskf_mod
from legkilo_tpu.core.filter import (
    FilterParams, ScanPacket, StaticConfig, init_carry,
)
from legkilo_tpu.core.voxel_map import MapConfig


def setup(rng, nb=8, p=32, k=2):
    scfg = StaticConfig(
        map_cfg=MapConfig(
            levels=2, capacity=256, probe=4, voxel_size=0.5,
            planer_threshold=0.01, sigma_num=3.0, max_points_num=50,
            init_num=(5, 5),
        ),
        use_kin=False, dept_err=0.04, beam_err=0.2,
    )
    params = FilterParams(
        noise=eskf_mod.make_noise_params(EskfConfig()),
        ext_r=jnp.eye(3),
        ext_t=jnp.asarray([0.0, 0.0, 0.2]),
        g_over_acc_norm=jnp.asarray(1.0),
    )
    carry = init_carry(scfg)
    # Perturb the state/cov so the chain isn't trivially at the origin.
    carry = carry._replace(
        cov=jnp.asarray(
            (lambda a: a @ a.T * 1e-4 + 1e-5 * np.eye(30))(rng.normal(size=(30, 30))),
            dtype=jnp.float32,
        ),
    )
    bt = (np.arange(nb, dtype=np.float32) + 1) * 0.002
    acc = rng.normal(scale=0.05, size=(nb, k, 3)).astype(np.float32)
    acc[..., 2] += 9.81
    imu_mask = rng.random((nb, k)) < 0.3
    packet = ScanPacket(
        rebase=jnp.float32(0.0),
        end_offset=jnp.float32(nb * 0.002),
        bucket_time=jnp.asarray(bt),
        bucket_mask=jnp.ones(nb, dtype=bool),
        points=jnp.asarray(rng.uniform(1, 3, size=(nb, p, 3)).astype(np.float32)),
        point_mask=jnp.asarray(rng.random((nb, p)) < 0.9),
        imu_time=jnp.asarray(np.clip(bt[:, None] - 0.001, 0, None).astype(np.float32) * np.ones((1, k), np.float32)),
        imu_mask=jnp.asarray(imu_mask),
        imu_acc=jnp.asarray(acc),
        imu_gyr=jnp.asarray(rng.normal(scale=0.02, size=(nb, k, 3)).astype(np.float32)),
        foot_pos=jnp.zeros((nb, k, 4, 3), dtype=jnp.float32),
        foot_vel=jnp.zeros((nb, k, 4, 3), dtype=jnp.float32),
        contact=jnp.zeros((nb, k, 4), dtype=bool),
    )
    # Synthetic match data: floor plane z=0 for ~70% of points.
    normal = np.zeros((nb, p, 3), dtype=np.float32)
    normal[..., 2] = 1.0
    center = rng.uniform(-1, 1, size=(nb, p, 3)).astype(np.float32)
    center[..., 2] = 0.0
    matched = (rng.random((nb, p)) < 0.7) & np.asarray(packet.point_mask)
    r_meas = rng.uniform(0.05, 0.3, size=(nb, p)).astype(np.float32)
    p_i = np.asarray(packet.points) @ np.eye(3) + np.asarray(params.ext_t)
    return scfg, params, carry, packet, (
        jnp.asarray(p_i), jnp.asarray(normal), jnp.asarray(center),
        jnp.asarray(r_meas), jnp.asarray(matched),
    )



def _stats(packet, aux):
    p_i, normal, center, r_meas, matched = aux
    s40 = ef.point_suffstats(p_i, normal, center, r_meas, matched)
    nmatch_b = jnp.sum(matched.astype(jnp.int32), axis=-1)
    return s40, nmatch_b


def _compare(c_ref, outs_ref, c_pal, outs_pal, atol_pose=3e-5, atol_cov=2e-4):
    rot_j, pos_j, rc_j, pc_j, nm_j = outs_ref
    rot_p, pos_p, rc_p, pc_p, nm_p = outs_pal
    np.testing.assert_allclose(np.asarray(pos_p), np.asarray(pos_j), atol=atol_pose)
    np.testing.assert_allclose(np.asarray(rot_p), np.asarray(rot_j), atol=atol_pose)
    np.testing.assert_allclose(np.asarray(rc_p), np.asarray(rc_j), atol=atol_cov)
    np.testing.assert_allclose(np.asarray(pc_p), np.asarray(pc_j), atol=atol_cov)
    np.testing.assert_array_equal(np.asarray(nm_p), np.asarray(nm_j))
    np.testing.assert_allclose(
        np.asarray(c_pal.state.lin), np.asarray(c_ref.state.lin), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(c_pal.state.rot), np.asarray(c_ref.state.rot), atol=3e-5
    )
    np.testing.assert_allclose(np.asarray(c_pal.cov), np.asarray(c_ref.cov), atol=2e-4)
    np.testing.assert_allclose(
        float(c_pal.last_predict_t), float(c_ref.last_predict_t), atol=1e-6
    )
    np.testing.assert_allclose(
        float(c_pal.last_update_t), float(c_ref.last_update_t), atol=1e-6
    )


def test_chain_stats_matches_fused_core(rng):
    scfg, params, carry, packet, aux = setup(rng)
    s40, nmatch_b = _stats(packet, aux)

    c_ref, *outs_ref = _chain_fused_core(carry, packet, params, scfg, s40, nmatch_b)
    c_pal, *outs_pal = run_chain_stats(carry, packet, params, s40, nmatch_b)
    _compare(c_ref, outs_ref, c_pal, outs_pal)


def test_chain_stats_kin_matches_fused_core(rng):
    scfg, params, carry, packet, aux = setup(rng)
    scfg = scfg._replace(use_kin=True)
    nb, k = packet.imu_time.shape
    foot_pos = rng.normal(scale=0.2, size=(nb, k, 4, 3)).astype(np.float32)
    foot_pos[..., 2] -= 0.3
    foot_vel = rng.normal(scale=0.1, size=(nb, k, 4, 3)).astype(np.float32)
    contact = rng.random((nb, k, 4)) < 0.6
    packet = packet._replace(
        foot_pos=jnp.asarray(foot_pos),
        foot_vel=jnp.asarray(foot_vel),
        contact=jnp.asarray(contact),
    )
    s40, nmatch_b = _stats(packet, aux)

    c_ref, *outs_ref = _chain_fused_core(carry, packet, params, scfg, s40, nmatch_b)
    c_pal, *outs_pal = run_chain_stats(
        carry, packet, params, s40, nmatch_b, use_kin=True
    )
    _compare(c_ref, outs_ref, c_pal, outs_pal, atol_pose=1e-4, atol_cov=5e-4)


def test_chain_stats_empty_noop(rng):
    """Fully-masked packet: state must pass through unchanged."""
    scfg, params, carry, packet, aux = setup(rng)
    packet = packet._replace(
        bucket_mask=jnp.zeros_like(packet.bucket_mask),
        imu_mask=jnp.zeros_like(packet.imu_mask),
    )
    p_i, normal, center, r_meas, matched = aux
    aux = (p_i, normal, center, r_meas, jnp.zeros_like(matched))
    s40, nmatch_b = _stats(packet, aux)

    c_pal, *_ = run_chain_stats(carry, packet, params, s40, nmatch_b)
    np.testing.assert_allclose(
        np.asarray(c_pal.state.rot), np.asarray(carry.state.rot), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(c_pal.state.lin), np.asarray(carry.state.lin), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(c_pal.cov), np.asarray(carry.cov), atol=1e-6)
