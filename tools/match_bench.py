"""Sub-step timing of the Pallas match phase on the current device.

Splits _match_compact_stats_pallas into stages and times each standalone
(jitted, pipelined reps) to locate the remaining cost: compaction/gathers,
keys kernel, probe gathers, meta/plane gathers, select kernel, suffstats.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from legkilo_tpu.utils.timing import sync as _sync


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from legkilo_tpu.config import Config
    from legkilo_tpu.core import eskf as eskf_mod
    from legkilo_tpu.core.filter import FilterParams, StaticConfig, init_carry
    from legkilo_tpu.core import filter_deferred as fd
    from legkilo_tpu.core.voxel_map import map_config_from
    from legkilo_tpu.io.dataset import PacketBuilder, to_device_packet
    from legkilo_tpu.models import sim
    from legkilo_tpu.ops.pallas import match_geom as mg

    cfg = Config()
    cfg.only_imu_use = True
    cfg.lidar.filter_num = 1
    cfg.lidar.blind = 0.3
    cfg.lidar.voxel_grid_resolution = 0.3
    cfg.voxel_map.capacity_log2 = 16
    cfg.voxel_map.insert_rounds = 1
    cfg.tpu.bucket_quantum_ms = 4.0
    cfg.tpu.max_buckets = 28
    cfg.tpu.max_points_per_bucket = 256
    cfg.tpu.max_imu_per_bucket = 1
    scfg = StaticConfig(
        map_cfg=map_config_from(cfg.voxel_map), use_kin=False,
        dept_err=cfg.voxel_map.dept_err, beam_err=cfg.voxel_map.beam_err,
        pipeline="deferred", insert_cap=3584, match_cap=3584,
        use_pallas=True, use_pallas_match=True)
    params = FilterParams(
        noise=eskf_mod.make_noise_params(cfg.eskf),
        ext_r=jnp.eye(3), ext_t=jnp.asarray([0.0, 0.0, 0.2]),
        g_over_acc_norm=jnp.asarray(1.0))

    data = sim.simulate(sim.SimConfig(duration=6.0, scan_points=8000, seed=7))
    builder = PacketBuilder(cfg)
    for ev in data.imu:
        builder.add_imu(ev)
    packets = []
    for scan in data.scans:
        builder.add_scan(scan)
        while builder.ready():
            packets.append(builder.pop())
    dev = [to_device_packet(p) for p in packets]

    step = jax.jit(fd.process_scan_deferred, static_argnums=3)
    carry = init_carry(scfg)
    for p in dev[:10]:
        carry, out = step(carry, p, params, scfg)
    _sync(out.pos)
    pkt = dev[10]

    mcfg = scfg.map_cfg
    L, C = mcfg.levels, mcfg.capacity
    cap = scfg.match_cap
    miss = L * C
    nb, pp, _ = pkt.points.shape
    dtype = jnp.float32
    block = fd._pick_block(cap)

    # ---- stage 1: compaction + gathers -------------------------------------
    def stage1(carry, packet):
        rb, pb = fd._predicted_bucket_poses(carry, packet, params, scfg)
        mask_f = (packet.point_mask & packet.bucket_mask[:, None]).reshape(-1)
        order = fd._compact_order(mask_f, cap)
        mask_c = fd._gather(mask_f, order, fill=False)
        bidx = order // pp
        bidx_c = jnp.minimum(bidx, nb - 1)
        pts_c = fd._gather(packet.points.reshape(-1, 3), order)
        pts_t = pts_c.T
        rb_t = jnp.take(rb.reshape(nb, 9).T, bidx_c, axis=1)
        pb_t = jnp.take(pb.T, bidx_c, axis=1)
        return order, mask_c, bidx, pts_t, rb_t, pb_t

    j1 = jax.jit(stage1)
    order, mask_c, bidx, pts_t, rb_t, pb_t = j1(carry, pkt)

    # ---- stage 2: keys kernel ----------------------------------------------
    sizes = [mcfg.voxel_size / (2.0 ** l) for l in range(L)] + [0.0] * (4 - L)

    def stage2(cov0, pts_t, rb_t, pb_t):
        par1 = jnp.zeros((1, 64), dtype=dtype)
        par1 = par1.at[0, mg._P_EXT_R : mg._P_EXT_R + 9].set(params.ext_r.reshape(9))
        par1 = par1.at[0, mg._P_EXT_T : mg._P_EXT_T + 3].set(params.ext_t)
        par1 = par1.at[0, mg._P_SIZES : mg._P_SIZES + 4].set(jnp.asarray(sizes, dtype))
        par1 = par1.at[0, mg._P_COV_RR : mg._P_COV_RR + 9].set(cov0[0:3, 0:3].reshape(9))
        par1 = par1.at[0, mg._P_COV_PP : mg._P_COV_PP + 9].set(cov0[3:6, 3:6].reshape(9))
        par1 = par1.at[0, mg._P_DEPT].set(scfg.dept_err)
        par1 = par1.at[0, mg._P_BEAM].set(scfg.beam_err)
        return mg.keys_call(par1, pts_t, rb_t, pb_t, levels=L, capacity=C,
                            interpret=False, block=block)

    j2 = jax.jit(stage2)
    piw_t, covs_t, keys_t, vc_t, idx0_t = j2(carry.cov, pts_t, rb_t, pb_t)

    # ---- stage 3: probe gathers --------------------------------------------
    def stage3(vm, keys_t, idx0_t):
        offs = jnp.arange(mcfg.probe, dtype=jnp.int32)
        h0 = idx0_t & (C - 1)
        base = idx0_t - h0
        idx = base[:, :, None] + ((h0[:, :, None] + offs[None, None, :]) & (C - 1))
        k_at = vm.ptab[idx]
        keys_cmp = keys_t.reshape(2 * L, 3, cap).transpose(0, 2, 1)
        match = (k_at[..., 3] > 0) & jnp.all(
            k_at[..., 0:3] == keys_cmp[:, :, None, :], axis=-1
        )
        found = jnp.any(match, axis=-1)
        first = jnp.argmax(match, axis=-1)
        slot = jnp.where(
            found,
            jnp.take_along_axis(idx, first[:, :, None], axis=-1)[..., 0],
            miss,
        )
        return found, slot

    j3 = jax.jit(stage3)
    found, slot = j3(carry.vm, keys_t, idx0_t)

    # ---- stage 4: meta/plane gathers ---------------------------------------
    def stage4(vm, slot, found):
        # is_plane rides in the meta row's LAST column (_M_PLANE = 3).
        meta_at = vm.meta.at[slot].get(mode="fill", fill_value=0.0)
        isp = meta_at[..., 3] > 0.5
        plane_at = vm.plane.at[slot].get(mode="fill", fill_value=0.0)
        plane_t = plane_at.transpose(0, 2, 1).reshape(2 * L * 31, cap)
        flags_t = jnp.concatenate([found.astype(dtype), isp.astype(dtype)], axis=0)
        return plane_t, flags_t

    j4 = jax.jit(stage4)
    plane_t, flags_t = j4(carry.vm, slot, found)

    # ---- stage 5: select kernel --------------------------------------------
    def stage5(piw_t, covs_t, vc_t, plane_t, flags_t, mask_c, bidx):
        par2 = jnp.zeros((1, 8), dtype=dtype)
        par2 = par2.at[0, mg._Q_SIGMA].set(mcfg.sigma_num)
        par2 = par2.at[0, mg._Q_RADIUS].set(mcfg.radius_k)
        par2 = par2.at[0, mg._Q_RATIO].set(params.noise.lidar_point_meas_ratio)
        mask_t = mask_c.astype(dtype)[None, :]
        return mg.select_call(par2, piw_t, covs_t[0:18], vc_t, plane_t, flags_t,
                              mask_t, bidx.astype(dtype)[None, :],
                              levels=L, n_buckets=nb,
                              interpret=False, block=block)

    j5 = jax.jit(stage5)
    out, s40_flat, nm = j5(piw_t, covs_t, vc_t, plane_t, flags_t, mask_c, bidx)

    # ---- stage 6: nmatch extraction (kernel-computed since round 5) --------
    def stage6(nm):
        return nm[:, 0].astype(jnp.int32)

    j6 = jax.jit(stage6)
    nmb = j6(nm)

    def timeit(label, fn, *a, reps=50):
        outs = fn(*a)
        _sync(jax.tree.leaves(outs)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            outs = fn(*a)
        _sync(jax.tree.leaves(outs)[0])
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{label:32s} {dt:7.3f} ms")

    timeit("1 compaction+gathers", j1, carry, pkt)
    timeit("2 keys kernel", j2, carry.cov, pts_t, rb_t, pb_t)
    timeit("3 probe gathers", j3, carry.vm, keys_t, idx0_t)
    timeit("4 meta/plane gathers", j4, carry.vm, slot, found)
    timeit("5 select kernel", j5, piw_t, covs_t, vc_t, plane_t, flags_t, mask_c, bidx)
    timeit("6 nmatch", j6, nm)


if __name__ == "__main__":
    main()
