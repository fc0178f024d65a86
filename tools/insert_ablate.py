"""In-pipeline ablation WITHIN the insert phase (see tools/ablate_bench.py).

Times the whole donated scan step (match + chain + staged insert) with the
insert phase truncated after each stage:

    resolve      var compute + hinted slot resolution (claim path) only
    accumulate   + moments + meta/mom scatter-adds
    thresholds   + refit decision + meta writeback (freeze)
    refit        + dedup + budgeted plane refit (== full insert)
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
    ap.add_argument("--reps", type=int, default=40)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from legkilo_tpu.config import Config
    from legkilo_tpu.core import eskf as eskf_mod
    from legkilo_tpu.core.filter import FilterParams, StaticConfig, init_carry
    from legkilo_tpu.core import filter_deferred as fd
    from legkilo_tpu.core import voxel_map as vmx
    from legkilo_tpu.core.plane_fit import fit_planes, point_moments
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

    scfg = StaticConfig(
        map_cfg=map_config_from(cfg.voxel_map),
        use_kin=False,
        dept_err=cfg.voxel_map.dept_err,
        beam_err=cfg.voxel_map.beam_err,
        pipeline="deferred",
        insert_cap=3584,
        match_cap=3584,
        chain_impl="fused",
        use_pallas=True,
        use_pallas_match=True,
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
        if jnp.issubdtype(x.dtype, jnp.integer) or (
            x.ndim == 3 and x.shape[-1] < 8
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
    _sync(out.pos)
    pkt = dev_packets[10]

    mcfg = scfg.map_cfg

    def staged_insert(vm, p_w, var, mask, own_keys, own_slot, own_found,
                      own_plane, stage):
        L, C, N = mcfg.levels, mcfg.capacity, p_w.shape[0]
        miss = L * C
        keys = own_keys.reshape(L * N, 3)
        lvl_ids = jnp.repeat(jnp.arange(L, dtype=jnp.int32), N)
        mask_f = jnp.tile(mask, L)
        found0 = own_found.reshape(L * N) & mask_f
        slot0 = jnp.where(found0, own_slot.reshape(L * N), miss)
        need = mask_f & ~found0
        n_new = jnp.sum(need.astype(jnp.int32))
        ptab_flat = vm.ptab.reshape(miss, vmx.PTAB_DIM)
        cap = mcfg.insert_new_cap

        def fast(pt):
            order = vmx.compact_order(need, cap)
            k_c = keys.at[order].get(mode="fill", fill_value=0)
            lvl_c = lvl_ids.at[order].get(mode="fill", fill_value=0)
            act_c = need.at[order].get(mode="fill", fill_value=False)
            pt, slot_c, ok_c = vmx._find_or_insert_flat(
                pt, k_c, lvl_c, act_c, mcfg
            )
            slot = slot0.at[order].set(jnp.where(ok_c, slot_c, miss), mode="drop")
            return pt, slot, slot < miss

        def slow(pt):
            return vmx._find_or_insert_flat(pt, keys, lvl_ids, mask_f, mcfg)

        ptab_flat, slot, ok = jax.lax.cond(n_new <= cap, fast, slow, ptab_flat)
        vm = vm._replace(ptab=ptab_flat.reshape(L, C, vmx.PTAB_DIM))
        if stage == "resolve":
            # keep slot live
            m0 = vm.meta.reshape(miss, -1).at[0, 0].add(
                jnp.sum(slot).astype(vm.meta.dtype) * 0.0
            )
            return vm._replace(meta=m0.reshape(vm.meta.shape))

        dtype = vm.mom.dtype
        sizes = jnp.asarray(
            [vmx.level_size(mcfg, l) for l in range(L)], dtype=dtype
        )[lvl_ids]
        vc = (keys.astype(dtype) + 0.5) * sizes[:, None]
        meta_flat = vm.meta.reshape(miss, vmx.META_DIM)
        # split-precision layout: concat the geometry + uncertainty tables
        mom_flat = jnp.concatenate(
            [vm.mom, vm.moms.astype(vm.mom.dtype)], axis=-1
        ).reshape(miss, vmx.MOM_DIM)
        plane_flat = vm.plane.reshape(miss, vmx.PLANE_DIM)
        meta_at = meta_flat.at[slot].get(mode="fill", fill_value=0.0)
        contrib = ok & (meta_at[:, vmx._M_N] < float(mcfg.max_points_num))
        tgt = jnp.where(contrib, slot, miss)
        p_rel = jnp.tile(p_w, (L, 1)) - vc
        if stage == "gathers":
            m0 = meta_flat.at[0, 0].add(
                jnp.sum(meta_at) * 0.0 + jnp.sum(p_rel) * 0.0
            )
            return vm._replace(meta=m0.reshape(L, C, vmx.META_DIM))
        mom_rows = jnp.concatenate(
            vmx._pack_moments(point_moments(p_rel, jnp.tile(var, (L, 1, 1)))),
            axis=-1,
        )
        if stage == "moments":
            m0 = meta_flat.at[0, 0].add(jnp.sum(mom_rows) * 0.0)
            return vm._replace(meta=m0.reshape(L, C, vmx.META_DIM))
        counts = jnp.zeros((L * N, vmx.META_DIM), dtype=dtype)
        counts = counts.at[:, vmx._M_N].set(1.0).at[:, vmx._M_NEW].set(1.0)
        if stage == "accmeta":
            meta_flat = meta_flat.at[tgt].add(counts, mode="drop")
            m0 = meta_flat.at[0, 0].add(jnp.sum(mom_rows) * 0.0)
            return vm._replace(meta=m0.reshape(L, C, vmx.META_DIM))
        if stage == "accmom":
            mom_flat = mom_flat.at[tgt].add(mom_rows, mode="drop")
            return vm._replace(mom=mom_flat.reshape(L, C, vmx.MOM_DIM))
        if stage == "accmom_unique":
            # WRONG results; diagnostic: does unique_indices change the cost?
            mom_flat = mom_flat.at[tgt].add(
                mom_rows, mode="drop", unique_indices=True
            )
            return vm._replace(mom=mom_flat.reshape(L, C, vmx.MOM_DIM))
        if stage == "accmom_narrow":
            # diagnostic: 8-wide update rows instead of 129
            mom_flat = mom_flat.at[tgt, 0:8].add(mom_rows[:, 0:8], mode="drop")
            m0 = mom_flat.at[0, 0].add(jnp.sum(mom_rows) * 0.0)
            return vm._replace(mom=m0.reshape(L, C, vmx.MOM_DIM))
        if stage == "accmom_seg":
            # diagnostic: sort by slot + cumsum-diff segment reduction,
            # then a sorted-unique scatter
            perm = jnp.argsort(tgt)
            tgt_s = tgt[perm]
            rows_s = mom_rows[perm]
            cs = jnp.cumsum(rows_s, axis=0)
            last = jnp.concatenate([tgt_s[1:] != tgt_s[:-1], jnp.ones((1,), bool)])
            ucap = 4096
            oid = vmx.compact_order(last, ucap)
            cs_u = cs.at[oid].get(mode="fill", fill_value=0.0)
            tgt_u = tgt_s.at[oid].get(mode="fill", fill_value=miss)
            sum_u = cs_u - jnp.concatenate(
                [jnp.zeros((1, cs_u.shape[1]), cs_u.dtype), cs_u[:-1]], axis=0
            )
            mom_flat = mom_flat.at[tgt_u].add(
                sum_u, mode="drop", unique_indices=True
            )
            return vm._replace(mom=mom_flat.reshape(L, C, vmx.MOM_DIM))
        meta_flat = meta_flat.at[tgt].add(counts, mode="drop")
        mom_flat = mom_flat.at[tgt].add(mom_rows, mode="drop")
        if stage == "accumulate":
            return vm._replace(
                meta=meta_flat.reshape(L, C, vmx.META_DIM),
                mom=mom_flat.reshape(L, C, vmx.MOM_DIM),
            )

        meta_t = meta_flat.at[tgt].get(mode="fill", fill_value=0.0)
        n_t = meta_t[:, vmx._M_N]
        init_t = meta_t[:, vmx._M_INIT] > 0.5
        init_thresh = jnp.asarray(mcfg.init_num, dtype=dtype)[lvl_ids]
        refit = (
            contrib
            & (n_t > init_thresh)
            & (~init_t | (meta_t[:, vmx._M_NEW] > float(mcfg.update_size_threshold)))
        )
        if stage == "thresholds":
            return vm._replace(
                meta=meta_flat.reshape(L, C, vmx.META_DIM),
                mom=mom_flat.reshape(L, C, vmx.MOM_DIM),
            )

        cand = jnp.where(refit, tgt, miss)
        srt = jnp.sort(cand)
        first = jnp.concatenate([jnp.ones((1,), dtype=bool), srt[1:] != srt[:-1]])
        first = first & (srt < miss)
        pos = jnp.cumsum(first.astype(jnp.int32)) - 1
        pos_t = jnp.where(first & (pos < mcfg.refit_budget), pos, mcfg.refit_budget)
        fs = jnp.full((mcfg.refit_budget,), miss, dtype=jnp.int32).at[pos_t].set(
            srt, mode="drop"
        )
        if stage == "dedup":
            m0 = meta_flat.at[0, 0].add(jnp.sum(fs).astype(dtype) * 0.0)
            return vm._replace(
                meta=m0.reshape(L, C, vmx.META_DIM),
                mom=mom_flat.reshape(L, C, vmx.MOM_DIM),
            )

        meta_r = meta_flat.at[fs].get(mode="fill", fill_value=0.0)
        mom_r = mom_flat.at[fs].get(mode="fill", fill_value=0.0)
        n_r = jnp.maximum(meta_r[:, vmx._M_N], 1.0)
        fit = fit_planes(vmx._unpack_moments(mom_r, n_r), mcfg.planer_threshold)
        plane_rows = jnp.concatenate(
            [
                fit.center_rel,
                fit.normal,
                fit.evals,
                fit.radius[:, None],
                fit.plane_var.reshape(-1, 36),
            ],
            axis=-1,
        )
        plane_flat = plane_flat.at[fs].set(plane_rows, mode="drop")
        meta_fit = jnp.stack(
            [
                meta_r[:, vmx._M_N],
                jnp.zeros_like(n_r),
                jnp.ones_like(n_r),
                fit.is_plane.astype(dtype),
            ],
            axis=-1,
        )
        meta_flat = meta_flat.at[fs].set(meta_fit, mode="drop")
        return vm._replace(
            meta=meta_flat.reshape(L, C, vmx.META_DIM),
            mom=mom_flat.reshape(L, C, vmx.MOM_DIM),
            plane=plane_flat.reshape(L, C, vmx.PLANE_DIM),
        )

    def make_step(stage):
        def stepfn(carry, packet):
            nb, p, _ = packet.points.shape
            cap = max(scfg.match_cap, scfg.insert_cap) or nb * p
            cap = min(cap, nb * p)
            s40, nmatch_b, aux = fd._match_compact_stats_pallas(
                carry, packet, params, scfg, cap
            )
            (order, bidx, pts_c, p_i_c, cross_c, body_cov_c, mask_c,
             own_keys, own_slot, own_found, own_plane) = aux
            from legkilo_tpu.ops.pallas.chain_stats import run_chain_stats
            carry, rots, poss, rot_covs, pos_covs, nmatch = run_chain_stats(
                carry, packet, params, s40, nmatch_b, use_kin=scfg.use_kin
            )
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
            if stage == "none":
                vm = carry.vm
            else:
                vm = staged_insert(
                    carry.vm, p_w_c, var_c, mask_c,
                    own_keys, own_slot, own_found, own_plane, stage,
                )
            carry = carry._replace(vm=vm)
            return carry, (carry.state.pos + jnp.sum(nmatch) * 0.0)

        return jax.jit(
            stepfn, donate_argnums=0,
            in_shardings=(carry_fmt, None), out_shardings=(carry_fmt, None),
        )

    def timeit(label, fn):
        # Truncated stage programs may return ptab in a non-pinned layout
        # (their cond pass-through ignores the output pin), so feeding the
        # output back breaks the pinned-input check.  Pre-build pinned
        # donated inputs instead; donation frees each after its call.
        cs = [relayout(jax.tree.map(jnp.copy, carry)) for _ in range(args.reps + 1)]
        c, o = fn(cs.pop(), pkt)
        _sync(o)
        t0 = time.perf_counter()
        for ci in cs:
            c, o = fn(ci, pkt)
        _sync(o)
        dt = (time.perf_counter() - t0) / args.reps * 1e3
        print(f"{label:28s} {dt:7.2f} ms")
        return dt

    prev = timeit("none (match+chain)", make_step("none"))
    for stage in ["moments", "accmom", "accmom_unique", "accmom_seg"]:
        t = timeit(stage, make_step(stage))
        print(f"{'  delta':28s} {t - prev:7.2f} ms")
        prev = t


if __name__ == "__main__":
    main()
