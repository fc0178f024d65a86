"""Long-horizon f32 covariance-stability measurement (SURVEY.md §7).

The delicate operation is the Joseph-free downdate ``P -= KHP``
(eskf.cc:91-145): at ~50 updates/scan x 10 scans/s, a minutes-long run is
10^4-10^5 asymmetric downdates in float32.  This tool replays a long rich
sim and tracks, every few scans:

  * max |P - P^T|          (asymmetry drift)
  * min eig of (P+P^T)/2   (loss of positive-definiteness)
  * |pos - gt|             (trajectory divergence)

Run with --dtype f64 (CPU) for the double-precision yardstick.

    env -u PALLAS_AXON_POOL_IPS python tools/longrun_stability.py \
        --mode imu --duration 60 --dtype f32 [--symmetrize]

Findings are recorded in docs/PERF_NOTES.md ("Long-horizon f32 stability").
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["imu", "kin"], default="imu")
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--dtype", choices=["f32", "f64"], default="f32")
    ap.add_argument("--pipeline", choices=["sequential", "deferred"],
                    default="sequential")
    ap.add_argument("--scan_points", type=int, default=2000)
    ap.add_argument("--every", type=int, default=10)
    ap.add_argument("--symmetrize", action="store_true",
                    help="enable the per-scan covariance symmetrization")
    ap.add_argument("--platform", choices=["cpu", "tpu"], default="cpu",
                    help="tpu = run on the real chip (f32 only; the "
                         "asymmetry probe reads P back every --every scans)")
    ap.add_argument("--json_out", default="")
    ap.add_argument("--pallas", action="store_true",
                    help="enable the full round-5 Pallas kernel set "
                         "(deferred pipeline only)")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        assert args.dtype == "f32", "TPU arm is f32-only"
        jax.config.update(
            "jax_compilation_cache_dir", "/root/repo/.jax_cache"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.dtype == "f64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from legkilo_tpu.config import Config
    from legkilo_tpu.models import sim
    from legkilo_tpu.runner import OdometryRunner

    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32

    traj = sim.Trajectory(
        speed=0.8, roll_amp=0.05, pitch_amp=0.03, bob=0.03,
        speed_segments=[(10.0, 1.3), (20.0, 0.0), (25.0, 0.9)],
    )
    data = sim.simulate(
        sim.SimConfig(duration=args.duration, scan_points=args.scan_points,
                      seed=5),
        traj=traj,
    )

    cfg = Config()
    cfg.only_imu_use = args.mode == "imu"
    cfg.lidar.filter_num = 1
    cfg.lidar.blind = 0.3
    cfg.lidar.voxel_grid_resolution = 0.4
    cfg.voxel_map.capacity_log2 = 15
    cfg.voxel_map.max_layer = 2
    cfg.tpu.max_buckets = 56
    cfg.tpu.max_points_per_bucket = 96
    cfg.tpu.max_imu_per_bucket = 3
    cfg.tpu.pipeline = args.pipeline
    cfg.tpu.pipeline_depth = 0
    cfg.tpu.symmetrize_cov = bool(args.symmetrize)
    if args.pallas:
        assert args.pipeline == "deferred"
        cfg.tpu.use_pallas = True
        cfg.tpu.use_pallas_match = True
        cfg.tpu.use_pallas_insert = True
        cfg.tpu.use_pallas_pose = True
        cfg.tpu.use_pallas_refit = True
        cfg.tpu.match_cap = 2560
        cfg.tpu.insert_cap = 2560
        cfg.voxel_map.insert_row_cap = 2560

    runner = OdometryRunner(cfg, dtype=dtype)
    events = data.imu if args.mode == "imu" else data.kin
    ev = iter(sorted(events, key=lambda e: e.time))
    pending = next(ev, None)
    gt_rot_f, gt_pos_f = data.gt_in_filter_frame()
    gt_map = {round(t, 6): i for i, t in enumerate(data.gt_times)}

    rows = []
    t0 = time.time()
    n_done = 0
    for scan in data.scans:
        while pending is not None and pending.time <= scan.end_time + 0.5:
            if cfg.only_imu_use:
                runner.add_imu(pending)
            else:
                runner.add_kin_imu(pending)
            pending = next(ev, None)
        runner.add_scan(scan)
        runner.flush()
        n_done += 1
        if n_done % args.every == 0 and runner.results:
            P = np.asarray(runner.carry.cov, dtype=np.float64)
            asym = float(np.abs(P - P.T).max())
            sym = 0.5 * (P + P.T)
            eigs = np.linalg.eigvalsh(sym)
            r = runner.results[-1]
            gi = gt_map.get(round(r.time, 6))
            err = (
                float(np.linalg.norm(r.pos - gt_pos_f[gi]))
                if gi is not None else float("nan")
            )
            rows.append({
                "scan": n_done, "t": r.time, "asym": asym,
                "min_eig": float(eigs[0]), "max_eig": float(eigs[-1]),
                "pos_err": err,
            })
            print(
                f"scan {n_done:5d} t={r.time:7.1f}s  asym={asym:.3e}  "
                f"min_eig={eigs[0]:.3e}  max_eig={eigs[-1]:.3e}  "
                f"err={err:.4f} m", flush=True,
            )

    # Final summary line (parse-friendly).
    errs = np.array([r["pos_err"] for r in rows])
    summary = {
        "mode": args.mode, "dtype": args.dtype, "pipeline": args.pipeline,
        "symmetrize": bool(args.symmetrize),
        "scans": n_done, "duration": args.duration,
        "final_asym": rows[-1]["asym"] if rows else None,
        "max_asym": max((r["asym"] for r in rows), default=None),
        "min_eig_overall": min((r["min_eig"] for r in rows), default=None),
        "ate_rmse": float(np.sqrt(np.nanmean(errs**2))) if len(errs) else None,
        "final_err": rows[-1]["pos_err"] if rows else None,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(summary))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"summary": summary, "rows": rows}, f, indent=1)


if __name__ == "__main__":
    sys.exit(main())
