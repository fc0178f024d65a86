"""Per-phase latency breakdown of the deferred pipeline on the current device.

Times each phase of process_scan_deferred (match / chain / insert) as a
standalone jitted function over the same steady-state packets bench.py uses,
plus the full pipeline, so regressions can be attributed.  Run with the chip
free (the tunnel serializes clients).

Usage: python tools/phase_bench.py [--chain jax|fused] [--unroll N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from legkilo_tpu.utils.timing import sync as _sync


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", default="fused")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--pallas-match", action="store_true")
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from legkilo_tpu.config import Config
    from legkilo_tpu.core import eskf as eskf_mod
    from legkilo_tpu.core.filter import FilterParams, StaticConfig, init_carry
    from legkilo_tpu.core import filter_deferred as fd
    from legkilo_tpu.core.voxel_map import insert_points, map_config_from
    from legkilo_tpu.core.plane_fit import calc_body_cov
    from legkilo_tpu.io.dataset import PacketBuilder, to_device_packet
    from legkilo_tpu.models import sim

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
        map_cfg=map_config_from(cfg.voxel_map),
        use_kin=False,
        dept_err=cfg.voxel_map.dept_err,
        beam_err=cfg.voxel_map.beam_err,
        pipeline="deferred",
        insert_cap=3584,
        match_cap=3584,
        chain_impl=args.chain,
        chain_unroll=args.unroll,
        use_pallas=args.pallas,
        use_pallas_match=args.pallas_match,
    )
    params = FilterParams(
        noise=eskf_mod.make_noise_params(cfg.eskf),
        ext_r=jnp.eye(3),
        ext_t=jnp.asarray([0.0, 0.0, 0.2]),
        g_over_acc_norm=jnp.asarray(1.0),
    )

    data = sim.simulate(sim.SimConfig(duration=6.0, scan_points=8000, seed=7))
    builder = PacketBuilder(cfg)
    for ev in data.imu:
        builder.add_imu(ev)
    packets = []
    for scan in data.scans:
        builder.add_scan(scan)
        while builder.ready():
            packets.append(builder.pop())
    dev_packets = [to_device_packet(p) for p in packets]

    # Build a steady-state carry by running the full pipeline over the
    # first 10 packets.
    step = jax.jit(fd.process_scan_deferred, static_argnums=3)
    carry = init_carry(scfg)
    for p in dev_packets[:10]:
        carry, out = step(carry, p, params, scfg)
    _sync(out.pos)
    pkt = dev_packets[10]

    # --- standalone phases --------------------------------------------------
    if args.chain == "fused":
        import jax.numpy as jnp2

        nb_, p_, _ = pkt.points.shape
        cap = max(scfg.match_cap, scfg.insert_cap) or nb_ * p_

        def phase_match_c(carry, packet):
            if args.pallas_match:
                return fd._match_compact_stats_pallas(carry, packet, params, scfg, cap)
            return fd._match_compact_stats(carry, packet, params, scfg, cap)

        jmc = jax.jit(phase_match_c)
        s40, nmatch_b, aux = jmc(carry, pkt)
        _sync(s40)
        (order, bidx, pts_c, p_i_c, cross_c, body_cov_c, mask_c,
         own_keys, own_slot, own_found, own_plane) = aux

        def phase_chain_c(carry, packet, s40, nmatch_b):
            if args.pallas:
                from legkilo_tpu.ops.pallas.chain_stats import run_chain_stats
                return run_chain_stats(carry, packet, params, s40, nmatch_b,
                                       use_kin=scfg.use_kin)
            return fd._chain_fused_core(carry, packet, params, scfg, s40, nmatch_b)

        jcc = jax.jit(phase_chain_c)
        cc_out = jcc(carry, pkt, s40, nmatch_b)
        _sync(cc_out[1])
        _, rots_c, poss_c, rcov_c, pcov_c, _ = cc_out

        def phase_insert_c(carry, bidx, p_i_c, cross_c, body_cov_c, mask_c,
                           rots, poss, rot_covs, pos_covs,
                           own_keys, own_slot, own_found, own_plane):
            bidx_c = jnp.minimum(bidx, nb_ - 1)
            rb2 = rots[bidx_c]
            pb2 = poss[bidx_c]
            p_w_c = jnp.einsum("cij,cj->ci", rb2, p_i_c) + pb2
            rot_ext2 = jnp.einsum("cij,jk->cik", rb2, params.ext_r)
            rot_cross2 = jnp.einsum("cij,cjk->cik", rb2, cross_c)
            var_c = (
                jnp.einsum("cij,cjk,clk->cil", rot_ext2, body_cov_c, rot_ext2)
                + jnp.einsum(
                    "cij,cjk,clk->cil", rot_cross2, rot_covs[bidx_c], rot_cross2
                )
                + pos_covs[bidx_c]
            )
            from legkilo_tpu.core.voxel_map import insert_points_hinted as iph
            return iph(carry.vm, scfg.map_cfg, p_w_c, var_c, mask_c,
                       own_keys, own_slot, own_found, own_plane)

        jic = jax.jit(phase_insert_c)
        iout = jic(carry, bidx, p_i_c, cross_c, body_cov_c, mask_c,
                   rots_c, poss_c, rcov_c, pcov_c, own_keys, own_slot,
                   own_found, own_plane)
        _sync(iout.occ)

        def timeit2(label, fn, *a):
            outs = fn(*a)
            _sync(jax.tree.leaves(outs)[0])
            t0 = time.perf_counter()
            for _ in range(args.reps):
                outs = fn(*a)
            _sync(jax.tree.leaves(outs)[0])
            dt = (time.perf_counter() - t0) / args.reps * 1e3
            print(f"{label:28s} {dt:7.2f} ms")

        timeit2("match+stats (compact)", jmc, carry, pkt)
        timeit2("chain (core)", jcc, carry, pkt, s40, nmatch_b)
        timeit2("insert (compact)", jic, carry, bidx, p_i_c, cross_c,
                body_cov_c, mask_c, rots_c, poss_c, rcov_c, pcov_c,
                own_keys, own_slot, own_found, own_plane)

        t0 = time.perf_counter()
        c = carry
        for p in dev_packets[10:]:
            c, out = step(c, p, params, scfg)
        _sync(out.pos)
        dt = (time.perf_counter() - t0) / len(dev_packets[10:]) * 1e3
        print(f"{'full pipeline':28s} {dt:7.2f} ms")
        return

    def phase_match(carry, packet):
        return fd._batched_match(carry, packet, params, scfg)

    match_out = jax.jit(phase_match)(carry, pkt)
    _sync(match_out[0])

    p_i, normal, center, r_meas, matched, crossmat = match_out

    chain_fn = fd._chain_jax_fused if args.chain == "fused" else fd._chain_jax

    def phase_chain(carry, packet, p_i, normal, center, r_meas, matched):
        return chain_fn(
            carry, packet, params, scfg, p_i, normal, center, r_meas, matched
        )

    chain_out = jax.jit(phase_chain)(
        carry, pkt, p_i, normal, center, r_meas, matched
    )
    _sync(chain_out[1])
    _, rots, poss, rot_covs, pos_covs, nmatch = chain_out

    nb, pp, _ = pkt.points.shape

    def phase_insert(carry, packet, rots, poss, rot_covs, pos_covs, crossmat):
        p_w = jnp.einsum("bij,bpj->bpi", rots, packet.points @ params.ext_r.T + params.ext_t) + poss[:, None, :]
        body_cov = calc_body_cov(packet.points, scfg.dept_err, scfg.beam_err)
        rot_ext = jnp.einsum("bij,jk->bik", rots, params.ext_r)
        rot_cross = jnp.einsum("bij,bpjk->bpik", rots, crossmat)
        var = (
            jnp.einsum("bij,bpjk,blk->bpil", rot_ext, body_cov, rot_ext)
            + jnp.einsum("bpij,bjk,bplk->bpil", rot_cross, rot_covs, rot_cross)
            + pos_covs[:, None]
        )
        mask = packet.point_mask & packet.bucket_mask[:, None]
        p_w_f = p_w.reshape(nb * pp, 3)
        var_f = var.reshape(nb * pp, 3, 3)
        mask_f = mask.reshape(-1)
        if scfg.insert_cap and scfg.insert_cap < nb * pp:
            order = jnp.argsort(~mask_f, stable=True)[: scfg.insert_cap]
            p_w_f = p_w_f[order]
            var_f = var_f[order]
            mask_f = mask_f[order]
        return insert_points(carry.vm, scfg.map_cfg, p_w_f, var_f, mask_f)

    ins_out = jax.jit(phase_insert)(
        carry, pkt, rots, poss, rot_covs, pos_covs, crossmat
    )
    _sync(ins_out.occ)

    def timeit(label, fn, *a):
        # Pipelined dispatch: launch reps then sync once.
        outs = fn(*a)
        _sync(jax.tree.leaves(outs)[0])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            outs = fn(*a)
        _sync(jax.tree.leaves(outs)[0])
        dt = (time.perf_counter() - t0) / args.reps * 1e3
        print(f"{label:28s} {dt:7.2f} ms")
        return dt

    jm = jax.jit(phase_match)
    jc = jax.jit(phase_chain)
    ji = jax.jit(phase_insert)
    js = step

    timeit("match", jm, carry, pkt)
    timeit("chain", jc, carry, pkt, p_i, normal, center, r_meas, matched)
    timeit("insert", ji, carry, pkt, rots, poss, rot_covs, pos_covs, crossmat)

    # Full pipeline, steady-state packets, pipelined like bench.py.
    t0 = time.perf_counter()
    c = carry
    for p in dev_packets[10:]:
        c, out = js(c, p, params, scfg)
    _sync(out.pos)
    dt = (time.perf_counter() - t0) / len(dev_packets[10:]) * 1e3
    print(f"{'full pipeline':28s} {dt:7.2f} ms")


if __name__ == "__main__":
    main()
