"""Fleet HBM/replica + max-batch measurement (replicas-per-chip story).

Round-2 finding: B=256 x 2^14-slot maps OOM the 16 GB chip; the map
tables are the limiter.  This tool measures, for f32 vs split-precision
f16 storage (MapConfig.storage_dtype): bytes/replica from device memory
stats, the largest B that completes a fleet step, and step throughput.

    python tools/fleet_hbm.py [--storage f32|f16] [--bmax 1024]

Run on the real TPU (one device job at a time — the tunnel serializes).
Results recorded in docs/PERF_NOTES.md ("Reduced-precision map storage").
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time

import numpy as np
from legkilo_tpu.utils.timing import sync as _sync


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--storage", choices=["f32", "f16"], default="f16")
    ap.add_argument("--capacity_log2", type=int, default=14)
    ap.add_argument("--bstart", type=int, default=64)
    ap.add_argument("--bmax", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=5)
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
        batched_carry, broadcast_packets, make_fleet_step, perturb_params,
    )
    from legkilo_tpu.runner import make_static_config

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    # The round-2 fleet workload: leg_fusion-like geometry, 2^14 maps.
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
    scfg = make_static_config(cfg)
    params = FilterParams(
        noise=eskf_mod.make_noise_params(cfg.eskf),
        ext_r=jnp.eye(3),
        ext_t=jnp.asarray([0.0, 0.0, 0.2]),
        g_over_acc_norm=jnp.asarray(1.0),
    )

    data = sim.simulate(sim.SimConfig(duration=2.0, scan_points=8000, seed=7))
    builder = PacketBuilder(cfg)
    for ev in data.imu:
        builder.add_imu(ev)
    packets = []
    for scan in data.scans:
        builder.add_scan(scan)
        while builder.ready():
            packets.append(builder.pop())
    dev_packets = [to_device_packet(p) for p in packets[: args.steps + 2]]

    def mem_mb():
        try:
            return dev.memory_stats()["bytes_in_use"] / 1e6
        except Exception:
            return float("nan")

    # The tunneled PJRT plugin does not expose memory_stats(); report the
    # analytic carry footprint (exact buffer bytes of one replica's filter
    # carry — map tables dominate) alongside whatever the device reports.
    carry1 = batched_carry(scfg, 1)
    analytic_mb = sum(
        int(np.prod(l.shape)) * l.dtype.itemsize
        for l in jax.tree.leaves(carry1)
    ) / 1e6
    del carry1
    print(f"analytic carry bytes/replica: {analytic_mb:.2f} MB", file=sys.stderr)

    results = []
    b = args.bstart
    best = None
    while b <= args.bmax:
        try:
            carry = batched_carry(scfg, b)
            bparams = perturb_params(params, b, scale=0.05)
            step = make_fleet_step(scfg)
            m0 = mem_mb()
            t_first = time.perf_counter()
            carry, out, stats = step(
                carry, broadcast_packets(dev_packets[0], b), bparams
            )
            _sync(stats)
            compile_s = time.perf_counter() - t_first
            t0 = time.perf_counter()
            for pk in dev_packets[1 : 1 + args.steps]:
                carry, out, stats = step(carry, broadcast_packets(pk, b), bparams)
            _sync(stats)
            dt = (time.perf_counter() - t0) / args.steps
            # memory_stats() is unimplemented on this PJRT plugin -> NaN;
            # json.dumps would emit a literal NaN (invalid JSON), so map
            # unavailable readings to None (docs/PERF_NOTES.md).
            m = mem_mb()
            m = m if math.isfinite(m) else None
            row = {
                "B": b,
                "mem_mb": round(m, 1) if m is not None else None,
                "mem_per_replica_mb": round(m / b, 2) if m is not None else None,
                "carry_mb_per_replica": round(analytic_mb, 2),
                "step_ms": round(dt * 1e3, 2),
                "replica_scans_per_s": round(b / dt, 0),
                "compile_s": round(compile_s, 1),
            }
            results.append(row)
            best = row
            print(json.dumps(row), file=sys.stderr, flush=True)
            del carry, bparams, out, stats
            b *= 2
        except Exception as exc:
            print(f"B={b} failed: {type(exc).__name__}: {str(exc)[:3000]}",
                  file=sys.stderr)
            break

    print(json.dumps({
        "storage": args.storage,
        "capacity_log2": args.capacity_log2,
        "carry_mb_per_replica": round(analytic_mb, 2),
        "rows": results,
        "max_B": best["B"] if best else 0,
    }))


if __name__ == "__main__":
    main()
