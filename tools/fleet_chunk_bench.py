"""Chunked-fleet throughput on the real chip (round-3 verdict task 4).

The per-scan fleet step is dispatch-bound (~2 ms/step regardless of B,
docs/PERF_NOTES.md fleet table): 93.8k replica-scans/s at B=192/f16 pays
one dispatch per scan.  make_fleet_chunk_step amortizes that dispatch
over K scans; this tool measures replica-scans/s vs K at fixed B.

    python tools/fleet_chunk_bench.py [--B 192] [--chunks 1,4,8,16]

Run on the real TPU (one device job at a time — the tunnel serializes).
Respects the documented remote-compile ceiling: failures at a given K
are reported per-row, not fatal.  Results go to the PERF_NOTES fleet
table.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=192)
    ap.add_argument("--storage", choices=["f32", "f16"], default="f16")
    ap.add_argument("--capacity_log2", type=int, default=14)
    ap.add_argument("--chunks", default="1,4,8")
    ap.add_argument("--windows", type=int, default=3,
                    help="timed chunk dispatches per row")
    ap.add_argument("--pallas", type=int, default=0,
                    help="enable the Pallas chain/match/insert/pose kernels "
                         "inside the vmapped fleet step")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
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

    print(f"device: {jax.devices()[0]}", file=sys.stderr)

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

    chunks = [int(c) for c in args.chunks.split(",")]
    kmax = max(chunks)
    n_need = 2 + kmax * (args.windows + 1)
    data = sim.simulate(sim.SimConfig(
        duration=max(2.0, 0.1 * (n_need + 2)), scan_points=8000, seed=7,
    ))
    builder = PacketBuilder(cfg)
    for ev in data.imu:
        builder.add_imu(ev)
    packets = []
    for scan in data.scans:
        builder.add_scan(scan)
        while builder.ready():
            packets.append(builder.pop())
    assert len(packets) >= n_need, f"{len(packets)} < {n_need}"

    B = args.B
    bparams = perturb_params(params, B, scale=0.05)
    # Pre-stage the broadcast per-step fleet packets once.
    steps = [broadcast_packets(to_device_packet(p), B) for p in packets]

    rows = []
    for K in chunks:
        try:
            carry = batched_carry(scfg, B)
            if K == 1:
                step = make_fleet_step(scfg)
                feed = steps
                spc = 1
            else:
                step = make_fleet_chunk_step(scfg)
                feed = stack_fleet_chunks(steps, K)
                spc = K
            # np.asarray sync: this rig's block_until_ready resolves
            # WITHOUT waiting for execution (PERF_NOTES "Round-4 rig") —
            # only host materialization is a real barrier.
            t_first = time.perf_counter()
            carry, out, stats = step(carry, feed[0], bparams)
            np.asarray(stats.mean_pos)
            compile_s = time.perf_counter() - t_first
            n_timed = min(args.windows, len(feed) - 1)
            t0 = time.perf_counter()
            for f in feed[1 : 1 + n_timed]:
                carry, out, stats = step(carry, f, bparams)
            np.asarray(stats.mean_pos)
            dt = (time.perf_counter() - t0) / n_timed
            row = {
                "K": K, "B": B,
                "dispatch_ms": round(dt * 1e3, 2),
                "ms_per_scan": round(dt / spc * 1e3, 4),
                "replica_scans_per_s": round(B * spc / dt, 0),
                "compile_s": round(compile_s, 1),
            }
            rows.append(row)
            print(json.dumps(row), file=sys.stderr, flush=True)
            del carry, out, stats
        except Exception as exc:
            print(f"K={K} failed: {type(exc).__name__}: {str(exc)[:2000]}",
                  file=sys.stderr)
            rows.append({"K": K, "B": B, "error": type(exc).__name__})

    print(json.dumps({
        "B": B, "storage": args.storage, "pallas": args.pallas,
        "capacity_log2": args.capacity_log2, "rows": rows,
    }))


if __name__ == "__main__":
    main()
