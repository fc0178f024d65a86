"""Count compiled-HLO kernels of the deferred-pipeline phases on TPU.

On launch-taxed rigs every kernel in the entry computation carries a fixed
cost (docs/PERF_NOTES.md: ~12 us in-program on the round-4 rig), so entry
instruction counts of the *optimized* HLO are a direct latency model.
This tool compiles (AOT, no execution) the full scan step plus each phase
standalone and prints instruction histograms of the entry computation.

The configuration mirrors bench.py's deferred config exactly (2^14 maps,
4 ms buckets, caps 3584, insert_row_cap 4096, refit_budget 1024) and obeys
the same LEGKILO_BENCH_PALLAS* env toggles, so before/after censuses line
up with bench numbers.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/hlo_kernels.py \
           [--phase all|full|match|insert] [--platform tpu|cpu]
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
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from legkilo_tpu.config import Config
    from legkilo_tpu.core import eskf as eskf_mod
    from legkilo_tpu.core.filter import FilterParams, StaticConfig, init_carry
    from legkilo_tpu.core import filter_deferred as fd
    from legkilo_tpu.core.voxel_map import map_config_from
    from legkilo_tpu.io.dataset import PacketBuilder, to_device_packet
    from legkilo_tpu.models import sim

    # == bench.py deferred configuration (keep in sync) ==
    cfg = Config()
    cfg.only_imu_use = True
    cfg.lidar.filter_num = 1
    cfg.lidar.blind = 0.3
    cfg.lidar.voxel_grid_resolution = 0.3
    cfg.voxel_map.capacity_log2 = 14
    cfg.tpu.bucket_quantum_ms = 4.0
    cfg.tpu.max_buckets = 28
    cfg.tpu.max_points_per_bucket = 256
    cfg.tpu.max_imu_per_bucket = 1
    cfg.voxel_map.insert_rounds = 1
    cfg.voxel_map.insert_row_cap = 4096
    cfg.voxel_map.refit_budget = 1024
    cfg.voxel_map.probe_length = 4

    use_pallas = os.environ.get("LEGKILO_BENCH_PALLAS", "1") == "1"
    use_pallas_match = os.environ.get("LEGKILO_BENCH_PALLAS_MATCH", "1") == "1"
    use_pallas_refit = os.environ.get("LEGKILO_BENCH_PALLAS_REFIT", "1") == "1"
    use_pallas_insert = os.environ.get("LEGKILO_BENCH_PALLAS_INSERT", "1") == "1"
    use_pallas_pose = os.environ.get("LEGKILO_BENCH_PALLAS_POSE", "1") == "1"

    scfg = StaticConfig(
        map_cfg=map_config_from(cfg.voxel_map, use_pallas_refit=use_pallas_refit),
        use_kin=False,
        dept_err=cfg.voxel_map.dept_err,
        beam_err=cfg.voxel_map.beam_err,
        pipeline="deferred",
        insert_cap=3584,
        match_cap=3584,
        use_pallas=use_pallas,
        use_pallas_match=use_pallas_match,
        use_pallas_insert=use_pallas_insert,
        use_pallas_pose=use_pallas_pose,
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

    print(f"platform={jax.default_backend()} pallas(chain/match/refit/insert)="
          f"{use_pallas}/{use_pallas_match}/{use_pallas_refit}/{use_pallas_insert}"
          f"/pose={use_pallas_pose}")

    def report(name, fn, *a, **kw):
        lowered = jax.jit(fn, **kw).lower(*a)
        comp = lowered.compile()
        hist, total = entry_histogram(comp.as_text())
        print(f"\n== {name}: {total} entry instructions ==")
        for op, n in hist.most_common():
            print(f"  {op:24s} {n}")

    nb_, p_, _ = pkt.points.shape
    cap = max(scfg.match_cap, scfg.insert_cap) or nb_ * p_

    match_fn = (
        fd._match_compact_stats_pallas if use_pallas_match
        else fd._match_compact_stats
    )

    if args.phase in ("all", "full"):
        # donate the carry like the production runner does — without it the
        # census counts input->output copies of the map tables that the
        # real program never executes.
        report("full step", fd.process_scan_deferred, carry, pkt, params, scfg,
               static_argnums=3, donate_argnums=0)
    if args.phase in ("all", "match"):
        report(
            "match+stats",
            lambda c, p: match_fn(c, p, params, scfg, cap),
            carry, pkt,
        )
    if args.phase in ("all", "insert"):
        from legkilo_tpu.core.voxel_map import insert_points_hinted

        s40, nmatch_b, aux = jax.jit(
            lambda c, p: match_fn(c, p, params, scfg, cap)
        )(carry, pkt)
        (order, bidx, pts_c, p_i_c, cross_c, body_cov_c, mask_c,
         own_keys, own_slot, own_found, own_plane) = aux
        rots = jnp.broadcast_to(jnp.eye(3), (nb_, 3, 3))
        poss = jnp.zeros((nb_, 3))
        rcov = jnp.broadcast_to(jnp.eye(3) * 1e-6, (nb_, 3, 3))
        pcov = rcov
        mcfg = scfg.map_cfg
        dtype = jnp.float32

        def insert_phase_xla(vm, bidx, p_i_c, cross_c, body_cov_c, mask_c,
                             rots, poss, rcov, pcov,
                             own_keys, own_slot, own_found, own_plane):
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
                vm, mcfg, p_w_c, var_c, mask_c,
                own_keys, own_slot, own_found, own_plane,
            )

        def insert_phase_pallas(vm, bidx, p_i_c, body_cov_c, mask_c,
                                rots, poss, rcov, pcov,
                                own_keys, own_slot, own_found, own_plane):
            # The exact production lowering (shared helper — no copy drift).
            return fd.insert_phase_pallas(
                vm, mcfg, params, bidx, p_i_c, body_cov_c, mask_c,
                own_keys, own_slot, own_found, own_plane,
                rots, poss, rcov, pcov,
            )

        if use_pallas_insert and mcfg.insert_row_cap:
            report("insert (pallas rows)", insert_phase_pallas, carry.vm, bidx,
                   p_i_c, body_cov_c, mask_c, rots, poss, rcov, pcov,
                   own_keys, own_slot, own_found, own_plane)
        else:
            report("insert (hinted xla)", insert_phase_xla, carry.vm, bidx,
                   p_i_c, cross_c, body_cov_c, mask_c, rots, poss, rcov, pcov,
                   own_keys, own_slot, own_found, own_plane)


if __name__ == "__main__":
    main()
