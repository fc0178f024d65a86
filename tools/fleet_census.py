"""HLO census of the compiled fleet step at different batch widths.

Round-4 verdict task 3: per-replica cost GROWS with B on the round-4 rig
(170 replica-scans/s at B=32 -> 145 at B=64 -> 114 at B=128) and no
kernel-level diagnosis existed.  This tool AOT-compiles the fleet step
(per-scan and chunked) at several B and prints the entry-instruction
histogram plus the ops whose count or shape scales anomalously — if
doubling B doubles per-replica cost through serialized lowering (e.g. a
batched gather lowering to a while loop, or layout copies growing
superlinearly), it shows up here; if histograms are identical and only
shapes double, the growth is memory-system (working-set) behavior, not
lowering.

Usage (TPU): PYTHONPATH=/root/repo:$PYTHONPATH python tools/fleet_census.py \
                 [--B 32,64] [--storage f16] [--pallas 0|1] [--chunk 0|K]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hlo_kernels import entry_histogram  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", default="32,64")
    ap.add_argument("--storage", choices=["f32", "f16"], default="f16")
    ap.add_argument("--capacity_log2", type=int, default=14)
    ap.add_argument("--pallas", type=int, default=0,
                    help="enable the Pallas chain/match/insert kernels in "
                         "the vmapped fleet step")
    ap.add_argument("--chunk", type=int, default=0,
                    help="also census the chunked step at this K (0 = skip)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from legkilo_tpu.config import Config
    from legkilo_tpu.core import eskf as eskf_mod
    from legkilo_tpu.core.filter import FilterParams
    from legkilo_tpu.models import sim
    from legkilo_tpu.io.dataset import PacketBuilder, to_device_packet
    from legkilo_tpu.parallel.sweep import (
        batched_carry, broadcast_packets, make_fleet_chunk_step,
        make_fleet_step, perturb_params, stack_fleet_chunks,
    )
    from legkilo_tpu.runner import make_static_config

    cfg = Config()
    cfg.only_imu_use = True
    cfg.lidar.filter_num = 1
    cfg.lidar.blind = 0.3
    cfg.lidar.voxel_grid_resolution = 0.3
    cfg.voxel_map.capacity_log2 = args.capacity_log2
    cfg.voxel_map.storage_dtype = args.storage
    cfg.tpu.bucket_quantum_ms = 4.0
    cfg.tpu.max_buckets = 28
    cfg.tpu.max_points_per_bucket = 256
    cfg.tpu.max_imu_per_bucket = 1
    cfg.tpu.pipeline = "deferred"
    cfg.tpu.insert_cap = 3584
    cfg.tpu.match_cap = 3584
    cfg.voxel_map.insert_row_cap = 4096
    cfg.voxel_map.refit_budget = 1024
    cfg.voxel_map.probe_length = 4
    cfg.voxel_map.insert_rounds = 1
    if args.pallas:
        cfg.tpu.use_pallas = True
        cfg.tpu.use_pallas_match = True
        cfg.tpu.use_pallas_insert = True
        cfg.tpu.use_pallas_pose = True
        cfg.tpu.use_pallas_refit = True
    scfg = make_static_config(cfg)
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

    print(f"platform={jax.default_backend()} storage={args.storage} "
          f"pallas={args.pallas}")

    hists = {}
    for b in [int(x) for x in args.B.split(",")]:
        carry = jax.eval_shape(lambda: batched_carry(scfg, b))
        bparams = jax.eval_shape(lambda: perturb_params(params, b, scale=0.0))
        packet = jax.eval_shape(lambda: broadcast_packets(pkt, b))

        def census(name, step, feed):
            lowered = step.lower(carry, feed, bparams)
            comp = lowered.compile()
            hist, total = entry_histogram(comp.as_text())
            hists[name] = hist
            print(f"\n== {name}: {total} entry instructions ==")
            for op, n in hist.most_common():
                print(f"  {op:24s} {n}")

        census(f"fleet B={b}", make_fleet_step(scfg), packet)
        if args.chunk:
            chunk_pkt = jax.tree.map(
                lambda x: jnp.broadcast_to(
                    jnp.asarray(x)[None], (args.chunk,) + jnp.shape(x)
                ),
                pkt,
            )
            chunk_b = jax.eval_shape(
                lambda: broadcast_packets(chunk_pkt, b)
            )
            census(f"fleet-chunk B={b} K={args.chunk}",
                   make_fleet_chunk_step(scfg), chunk_b)

    names = list(hists)
    if len(names) >= 2:
        a, b = names[0], names[-1]
        diff = {
            op: hists[b].get(op, 0) - hists[a].get(op, 0)
            for op in set(hists[a]) | set(hists[b])
            if hists[b].get(op, 0) != hists[a].get(op, 0)
        }
        print(f"\n== histogram diff {b} - {a} ==")
        if not diff:
            print("  identical — instruction count does not scale with B; "
                  "per-replica growth is execution/memory-system behavior")
        for op, d in sorted(diff.items(), key=lambda kv: -abs(kv[1])):
            print(f"  {op:24s} {d:+d}")


if __name__ == "__main__":
    main()
