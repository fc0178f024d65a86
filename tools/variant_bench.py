"""Measure scan-latency across pipeline/knob variants on the current rig.

Round-1 tuned every knob for a rig where each in-executable kernel boundary
cost ~50 us (docs/PERF_NOTES.md).  When the rig changes (e.g. the round-2
hardware has sub-microsecond kernel boundaries), the knob trade-offs change
with it — this tool re-measures the matrix so defaults can follow the
hardware, not folklore.

Usage: python tools/variant_bench.py [--variants a,b,c] [--reps 3]
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
    ap.add_argument("--variants", type=str, default="")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_variants")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from legkilo_tpu.config import Config
    from legkilo_tpu.core import eskf as eskf_mod
    from legkilo_tpu.core.filter import (
        FilterParams, StaticConfig, init_carry, process_scan,
    )
    from legkilo_tpu.core.filter_deferred import process_scan_deferred
    from legkilo_tpu.core.voxel_map import map_config_from
    from legkilo_tpu.io.dataset import PacketBuilder, to_device_packet
    from legkilo_tpu.models import sim

    data = sim.simulate(sim.SimConfig(duration=6.0, scan_points=8000, seed=7))

    def build(bucket_ms=4.0, nb=28, p=256, probe=4, insert_rounds=1,
              row_cap=4096, refit_budget=1024, caps=3584, use_pallas=True,
              use_pallas_match=True, use_pallas_insert=True,
              use_pallas_pose=True, use_pallas_refit=True,
              pipeline="deferred", reuse_probe=True,
              kin=False):
        cfg = Config()
        cfg.only_imu_use = not kin
        cfg.lidar.filter_num = 1
        cfg.lidar.blind = 0.3
        cfg.lidar.voxel_grid_resolution = 0.3
        cfg.voxel_map.capacity_log2 = 16
        cfg.tpu.bucket_quantum_ms = bucket_ms
        cfg.tpu.max_buckets = nb
        cfg.tpu.max_points_per_bucket = p
        cfg.tpu.max_imu_per_bucket = 1
        cfg.voxel_map.insert_rounds = insert_rounds
        cfg.voxel_map.insert_row_cap = row_cap
        cfg.voxel_map.refit_budget = refit_budget
        cfg.voxel_map.probe_length = probe
        scfg = StaticConfig(
            map_cfg=map_config_from(
                cfg.voxel_map,
                use_pallas_refit=(pipeline == "deferred" and use_pallas_refit),
            ),
            use_kin=kin,
            dept_err=cfg.voxel_map.dept_err,
            beam_err=cfg.voxel_map.beam_err,
            pipeline=pipeline,
            use_pallas=(pipeline == "deferred" and use_pallas),
            use_pallas_match=(pipeline == "deferred" and use_pallas_match),
            use_pallas_insert=(pipeline == "deferred" and use_pallas_insert),
            use_pallas_pose=(pipeline == "deferred" and use_pallas_pose),
            insert_cap=caps if pipeline == "deferred" else 0,
            match_cap=caps if pipeline == "deferred" else 0,
            insert_reuse_probe=reuse_probe,
        )
        params = FilterParams(
            noise=eskf_mod.make_noise_params(cfg.eskf),
            ext_r=jnp.eye(3),
            ext_t=jnp.asarray([0.0, 0.0, 0.2]),
            g_over_acc_norm=jnp.asarray(1.0),
        )
        builder = PacketBuilder(cfg)
        for ev in (data.kin if kin else data.imu):
            (builder.add_kin_imu if kin else builder.add_imu)(ev)
        packets = []
        for scan in data.scans:
            builder.add_scan(scan)
            while builder.ready():
                packets.append(builder.pop())
        return cfg, scfg, params, [to_device_packet(pk) for pk in packets]

    def measure(scfg, params, dev_packets, pipeline, reps):
        step_fn = process_scan_deferred if pipeline == "deferred" else process_scan
        best = np.inf
        compile_s = 0.0
        for rep in range(reps):
            carry = init_carry(scfg)
            step = jax.jit(step_fn, static_argnums=3, donate_argnums=0)
            t0 = time.perf_counter()
            carry, out = step(carry, dev_packets[0], params, scfg)
            _sync(out.pos)
            if rep == 0:
                # Later reps hit the in-process compile cache; only the
                # first rep's first call measures the real compile cost.
                compile_s = time.perf_counter() - t0
            for pk in dev_packets[1:10]:
                carry, out = step(carry, pk, params, scfg)
            _sync(out.pos)
            timed = dev_packets[10:]
            t0 = time.perf_counter()
            for pk in timed:
                carry, out = step(carry, pk, params, scfg)
            _sync(out.pos)
            best = min(best, (time.perf_counter() - t0) / len(timed) * 1e3)
        return best, compile_s

    variants = {
        "base": dict(),
        "probe8": dict(probe=8),
        "2ms": dict(bucket_ms=2.0, nb=56, p=128),
        "nopallas_chain": dict(use_pallas=False),
        "nopallas_match": dict(use_pallas_match=False),
        "nopallas_insert": dict(use_pallas_insert=False),
        "nopallas_pose": dict(use_pallas_pose=False),
        "nopallas_refit": dict(use_pallas_refit=False),
        "r4_config": dict(use_pallas_insert=False, use_pallas_pose=False),
        "rounds6": dict(insert_rounds=6),
        "nocaps": dict(caps=0, row_cap=0),
        "refit2048": dict(refit_budget=2048),
        "noreuse": dict(reuse_probe=False),
        "sequential": dict(pipeline="sequential"),
        "kin": dict(kin=True),
        "kin_sequential": dict(kin=True, pipeline="sequential"),
    }
    sel = [v for v in args.variants.split(",") if v] or list(variants)
    for name in sel:
        kw = variants[name]
        cfg, scfg, params, dev_packets = build(**kw)
        try:
            ms, compile_s = measure(
                scfg, params, dev_packets, kw.get("pipeline", "deferred"),
                args.reps,
            )
            print(f"{name:18s} {ms:8.3f} ms/scan   (compile {compile_s:6.1f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - survey tool, keep going
            print(f"{name:18s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
