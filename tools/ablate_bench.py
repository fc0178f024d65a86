"""In-pipeline phase attribution by ablation.

Standalone phase timings (tools/phase_bench.py) are inflated by per-call
tunnel sync and un-donated map copies, so they don't attribute the full
pipeline's latency.  This tool times the WHOLE donated scan step with phases
selectively disabled; differences between variants are the true in-pipeline
costs:

    full                 match + chain + insert
    no-insert            match + chain      (vm passed through untouched)
    no-chain-no-insert   match only
    empty                fixed per-step overhead (carry round-trip)

Run with the chip free (the tunnel serializes clients).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=40)
    ap.add_argument("--no-pallas", action="store_true")
    args = ap.parse_args()

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

    cfg = Config()
    cfg.only_imu_use = True
    cfg.lidar.filter_num = 1
    cfg.lidar.blind = 0.3
    cfg.lidar.voxel_grid_resolution = 0.3
    cfg.voxel_map.capacity_log2 = 16
    cfg.voxel_map.insert_rounds = 1
    cfg.voxel_map.insert_row_cap = 4096
    cfg.tpu.bucket_quantum_ms = 4.0
    cfg.tpu.max_buckets = 28
    cfg.tpu.max_points_per_bucket = 256
    cfg.tpu.max_imu_per_bucket = 1

    use_pallas = not args.no_pallas
    scfg = StaticConfig(
        map_cfg=map_config_from(cfg.voxel_map),
        use_kin=False,
        dept_err=cfg.voxel_map.dept_err,
        beam_err=cfg.voxel_map.beam_err,
        pipeline="deferred",
        insert_cap=3584,
        match_cap=3584,
        chain_impl="fused",
        use_pallas=use_pallas,
        use_pallas_match=use_pallas,
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

    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    dev = jax.devices()[0]
    carry = init_carry(scfg)
    def _fmt(x):
        # ptab/meta: compiler default layout (see bench.py for why)
        # Narrow tables (ptab/meta — trailing dim < 8) stay on compiler
        # default layouts: auto-layout disagrees with row-major there and
        # the pin either converts per scan or trips the strict check
        # (docs/PERF_NOTES.md "Layout pinning").  Tables are 2-D flat
        # since round 5.
        if jnp.issubdtype(x.dtype, jnp.integer) or (
            x.ndim >= 2 and x.shape[-1] < 8
        ):
            return SingleDeviceSharding(dev)
        return Format(Layout(tuple(range(x.ndim))), SingleDeviceSharding(dev))

    row_major = jax.tree.map(_fmt, carry)
    # Explicit copies: an identity jit degenerates to an aliasing no-op when
    # loaded from the persistent compilation cache.  Pins stay ABSTRACT
    # (tiling=None): concrete tiled pins are violated by the executables'
    # outputs on this jax/XLA.
    carry_fmt = row_major
    relayout = jax.jit(
        lambda t: jax.tree.map(jnp.copy, t), out_shardings=carry_fmt
    )
    carry = relayout(carry)
    step = jax.jit(
        fd.process_scan_deferred, static_argnums=3, donate_argnums=0,
        in_shardings=(carry_fmt, None, None), out_shardings=(carry_fmt, None),
    )
    for p in dev_packets[:10]:
        carry, out = step(carry, p, params, scfg)
    np.asarray(out.pos)
    pkt = dev_packets[10]

    # ---- ablated whole-step variants (copies of _process_scan_fused) ----
    def make_step(do_match=True, do_chain=True, do_insert=True):
        def stepfn(carry, packet):
            nb, p, _ = packet.points.shape
            cap = max(scfg.match_cap, scfg.insert_cap) or nb * p
            cap = min(cap, nb * p)
            if do_match:
                if scfg.use_pallas_match and fd._pick_block(cap):
                    s40, nmatch_b, aux = fd._match_compact_stats_pallas(
                        carry, packet, params, scfg, cap
                    )
                else:
                    s40, nmatch_b, aux = fd._match_compact_stats(
                        carry, packet, params, scfg, cap
                    )
            else:
                dtype = carry.cov.dtype
                L = scfg.map_cfg.levels
                s40 = jnp.zeros((nb, 40, 40), dtype)
                nmatch_b = jnp.zeros((nb,), jnp.int32)
                aux = (
                    jnp.zeros((cap,), jnp.int32),
                    jnp.zeros((cap,), jnp.int32),
                    jnp.zeros((cap, 3), dtype),
                    jnp.zeros((cap, 3), dtype),
                    jnp.zeros((cap, 3, 3), dtype),
                    jnp.zeros((cap, 3, 3), dtype),
                    jnp.zeros((cap,), bool),
                    jnp.zeros((L, cap, 3), jnp.int32),
                    jnp.full((L, cap), L * scfg.map_cfg.capacity, jnp.int32),
                    jnp.zeros((L, cap), bool),
                    jnp.zeros((L, cap), bool),
                )
            (order, bidx, pts_c, p_i_c, cross_c, body_cov_c, mask_c,
             own_keys, own_slot, own_found, own_plane) = aux

            if do_chain:
                if scfg.use_pallas:
                    from legkilo_tpu.ops.pallas.chain_stats import run_chain_stats
                    carry, rots, poss, rot_covs, pos_covs, nmatch = run_chain_stats(
                        carry, packet, params, s40, nmatch_b, use_kin=scfg.use_kin
                    )
                else:
                    carry, rots, poss, rot_covs, pos_covs, nmatch = (
                        fd._chain_fused_core(carry, packet, params, scfg, s40, nmatch_b)
                    )
            else:
                dtype = carry.cov.dtype
                rots = jnp.tile(carry.state.rot[None], (nb, 1, 1)) * (
                    1.0 + 0.0 * s40[:, :1, :1]
                )
                poss = jnp.tile(carry.state.pos[None], (nb, 1))
                rot_covs = jnp.tile(carry.cov[None, 0:3, 0:3], (nb, 1, 1))
                pos_covs = jnp.tile(carry.cov[None, 3:6, 3:6], (nb, 1, 1))
                nmatch = nmatch_b

            if do_insert:
                from legkilo_tpu.core.voxel_map import insert_points_hinted
                bidx_c = jnp.minimum(bidx, nb - 1)
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
                vm = insert_points_hinted(
                    carry.vm, scfg.map_cfg, p_w_c, var_c, mask_c,
                    own_keys, own_slot, own_found, own_plane,
                )
                carry = carry._replace(vm=vm)
            return carry, (carry.state.pos + jnp.sum(nmatch) * 0.0)

        return jax.jit(
            stepfn, donate_argnums=0,
            in_shardings=(carry_fmt, None), out_shardings=(carry_fmt, None),
        )

    def timeit(label, fn):
        # np.asarray sync: this rig's block_until_ready resolves without
        # waiting for execution (PERF_NOTES "Round-4 rig") — only host
        # materialization is a real barrier.
        c = relayout(jax.tree.map(jnp.copy, carry))
        c, o = fn(c, pkt)
        np.asarray(o)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            c, o = fn(c, pkt)
        np.asarray(o)
        dt = (time.perf_counter() - t0) / args.reps * 1e3
        print(f"{label:28s} {dt:7.2f} ms")
        return dt

    t_full = timeit("full", make_step(True, True, True))
    t_mc = timeit("match+chain", make_step(True, True, False))
    t_m = timeit("match only", make_step(True, False, False))
    t_mi = timeit("match+insert", make_step(True, False, True))
    t_e = timeit("empty", make_step(False, False, False))
    print()
    print(f"{'insert (full - match+chain)':28s} {t_full - t_mc:7.2f} ms")
    print(f"{'chain (match+chain - match)':28s} {t_mc - t_m:7.2f} ms")
    print(f"{'match (match - empty)':28s} {t_m - t_e:7.2f} ms")


if __name__ == "__main__":
    main()
