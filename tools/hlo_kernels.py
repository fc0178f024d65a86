"""Count compiled-HLO kernels of the deferred-pipeline phases on TPU.

On this rig every sequential kernel launch costs ~50 us (docs/PERF_NOTES.md),
so entry-computation instruction counts of the *optimized* HLO are a direct
latency model: ms ~ 0.05 * kernels + flops/bandwidth terms.  This tool
compiles (AOT, no execution) the full scan step plus each phase standalone
and prints instruction histograms of the entry computation.

Usage: python tools/hlo_kernels.py [--phase all|full|match|chain|insert]
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def entry_histogram(compiled_text: str):
    """Histogram of opcodes in the ENTRY computation of optimized HLO."""
    lines = compiled_text.splitlines()
    in_entry = False
    hist = collections.Counter()
    total = 0
    for ln in lines:
        if ln.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry:
            if ln.startswith("}"):
                break
            m = re.match(r"\s+(?:ROOT\s+)?%?[\w.\-]+\s*=\s*[^=]*?\s([\w\-]+)\(", ln)
            if m:
                op = m.group(1)
                if op in ("parameter", "constant", "tuple", "get-tuple-element",
                          "bitcast"):
                    continue
                hist[op] += 1
                total += 1
    return hist, total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
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
        use_pallas=True,
    )
    params = FilterParams(
        noise=eskf_mod.make_noise_params(cfg.eskf),
        ext_r=jnp.eye(3),
        ext_t=jnp.asarray([0.0, 0.0, 0.2]),
        g_over_acc_norm=jnp.asarray(1.0),
    )

    data = sim.simulate(sim.SimConfig(duration=1.0, scan_points=8000, seed=7))
    builder = PacketBuilder(cfg)
    for ev in data.imu:
        builder.add_imu(ev)
    packets = []
    for scan in data.scans:
        builder.add_scan(scan)
        while builder.ready():
            packets.append(builder.pop())
    pkt = to_device_packet(packets[0])
    carry = init_carry(scfg)

    def report(name, fn, *a, **kw):
        lowered = jax.jit(fn, **kw).lower(*a)
        comp = lowered.compile()
        hist, total = entry_histogram(comp.as_text())
        print(f"\n== {name}: {total} entry instructions ==")
        for op, n in hist.most_common():
            print(f"  {op:24s} {n}")

    nb_, p_, _ = pkt.points.shape
    cap = max(scfg.match_cap, scfg.insert_cap) or nb_ * p_

    if args.phase in ("all", "full"):
        report("full step", fd.process_scan_deferred, carry, pkt, params, scfg,
               static_argnums=3)
    if args.phase in ("all", "match"):
        report(
            "match+stats",
            lambda c, p: fd._match_compact_stats(c, p, params, scfg, cap),
            carry, pkt,
        )
    if args.phase in ("all", "insert"):
        import jax.numpy as jnp2
        from legkilo_tpu.core.voxel_map import insert_points_hinted

        s40, nmatch_b, aux = jax.jit(
            lambda c, p: fd._match_compact_stats(c, p, params, scfg, cap)
        )(carry, pkt)
        (order, bidx, pts_c, p_i_c, cross_c, body_cov_c, mask_c,
         own_keys, own_slot, own_found) = aux
        rots = jnp.broadcast_to(jnp.eye(3), (nb_, 3, 3))
        poss = jnp.zeros((nb_, 3))
        rcov = jnp.broadcast_to(jnp.eye(3) * 1e-6, (nb_, 3, 3))
        pcov = rcov

        def insert_phase(vm, bidx, p_i_c, cross_c, body_cov_c, mask_c,
                         rots, poss, rcov, pcov, own_keys, own_slot, own_found):
            bidx_c = jnp.minimum(bidx, nb_ - 1)
            rb2 = rots[bidx_c]
            pb2 = poss[bidx_c]
            p_w_c = jnp.einsum("cij,cj->ci", rb2, p_i_c) + pb2
            rot_ext2 = jnp.einsum("cij,jk->cik", rb2, params.ext_r)
            rot_cross2 = jnp.einsum("cij,cjk->cik", rb2, cross_c)
            var_c = (
                jnp.einsum("cij,cjk,clk->cil", rot_ext2, body_cov_c, rot_ext2)
                + jnp.einsum("cij,cjk,clk->cil", rot_cross2, rcov[bidx_c], rot_cross2)
                + pcov[bidx_c]
            )
            return insert_points_hinted(
                vm, scfg.map_cfg, p_w_c, var_c, mask_c,
                own_keys, own_slot, own_found,
            )

        report("insert (hinted)", insert_phase, carry.vm, bidx, p_i_c, cross_c,
               body_cov_c, mask_c, rots, poss, rcov, pcov,
               own_keys, own_slot, own_found)


if __name__ == "__main__":
    main()
