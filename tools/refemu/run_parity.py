"""Trajectory-level parity report: legkilo_tpu vs the reference-semantics
float64 emulator, on long rich legged-robot sims.

Produces the numbers committed in docs/PARITY_EMULATOR.md:

    env -u PALLAS_AXON_POOL_IPS PYTHONPATH=/root/repo:/root/repo/tools \
        python tools/refemu/run_parity.py --mode imu --duration 60

For each mode it runs: the repo's sequential and deferred pipelines, the
emulator in pure reference semantics, and the emulator with all deviation
toggles flipped to the TPU-side semantics ("tpu-all") — reporting ATE vs
ground truth, pairwise trajectory RMSE, and the per-deviation ablation.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _ate(times, poss, gt_times, gt_pos):
    gtm = {round(t, 6): i for i, t in enumerate(gt_times)}
    sel = [i for i, t in enumerate(times) if round(t, 6) in gtm]
    idx = [gtm[round(times[i], 6)] for i in sel]
    return float(np.sqrt(np.mean(np.sum((poss[sel] - gt_pos[idx]) ** 2, axis=1))))


def _pairwise(t1, p1, t2, p2):
    m2 = {round(t, 6): i for i, t in enumerate(t2)}
    pairs = [(i, m2[round(t, 6)]) for i, t in enumerate(t1) if round(t, 6) in m2]
    d = np.array([np.linalg.norm(p1[i] - p2[j]) for i, j in pairs])
    return float(np.sqrt((d ** 2).mean())), float(d.max())


TRAJS = {
    # The round-3 committed scenario: gentle gait + stop-and-go.
    "rich": dict(
        speed=0.8, roll_amp=0.05, pitch_amp=0.03, bob=0.03,
        speed_segments=[(10.0, 1.3), (20.0, 0.0), (25.0, 0.9)],
    ),
    # Real quadruped trot: +-0.2 rad attitude at 3 Hz, 1.7 rad/s yaw,
    # 2 m/s sprint with a hard stop-and-go (VERDICT round-3 weak #1).
    "aggressive": dict(
        speed=2.0, radius=1.2, roll_amp=0.20, pitch_amp=0.12,
        gait_freq=3.0, bob=0.04, bob_freq=3.0,
        speed_segments=[(6.0, 0.0), (8.5, 2.0)], ramp=0.6,
    ),
    # Bound/pronk envelope edge: +-0.3 rad at 4 Hz, 2 rad/s yaw.
    "extreme": dict(
        speed=2.0, radius=1.0, roll_amp=0.30, pitch_amp=0.20,
        gait_freq=4.0, bob=0.05, bob_freq=4.0, ramp=0.6,
    ),
    # Long straight-ish excursion for the corridor world: a very
    # large-radius arc stays within |y| < 1 m of the corridor axis.
    "corridor": dict(
        speed=1.2, radius=5000.0, roll_amp=0.05, pitch_amp=0.03, bob=0.03,
    ),
}

WORLDS = {"box": "box_world", "corridor": "corridor_world",
          "floor": "floor_world"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["imu", "kin"], default="imu")
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--scan_points", type=int, default=2000)
    ap.add_argument("--traj", choices=sorted(TRAJS), default="rich")
    ap.add_argument("--world", choices=sorted(WORLDS), default="box")
    ap.add_argument("--ablate", action="store_true",
                    help="also run the one-toggle-at-a-time ablation")
    ap.add_argument("--no_emu", action="store_true",
                    help="repo pipelines only (dynamics-envelope mode)")
    ap.add_argument("--json_out", default="")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import logging

    logging.disable(logging.WARNING)

    from legkilo_tpu.config import Config
    from legkilo_tpu.models import sim
    from legkilo_tpu.runner import run_offline
    from refemu.emulator import EmuParams, run_emulator

    traj = sim.Trajectory(**TRAJS[args.traj])
    world = getattr(sim, WORLDS[args.world])()
    data = sim.simulate(
        sim.SimConfig(duration=args.duration, scan_points=args.scan_points,
                      seed=5),
        world=world,
        traj=traj,
    )
    gt_rot, gt_pos = data.gt_in_filter_frame()
    events = data.imu if args.mode == "imu" else data.kin

    def make_cfg(pipeline, match_pose="imu", match_iters=1):
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
        cfg.tpu.pipeline = pipeline
        cfg.tpu.match_pose = match_pose
        cfg.tpu.match_iters = match_iters
        return cfg

    out = {"mode": args.mode, "duration": args.duration,
           "traj": args.traj, "world": args.world, "runs": {}}

    def record(name, times, poss, wall):
        ate = _ate(times, poss, data.gt_times, gt_pos)
        out["runs"][name] = {"ate_gt": ate, "wall_s": round(wall, 1),
                             "times": np.asarray(times), "poss": np.asarray(poss)}
        print(f"{args.mode} {name:22s} ATE_gt={ate:.4f} m  wall={wall:.0f}s",
              flush=True)

    repo_arms = [
        ("repo[sequential]", make_cfg("sequential")),
        ("repo[deferred]", make_cfg("deferred", "imu")),
        ("repo[deferred/cv]", make_cfg("deferred", "const_vel")),
        ("repo[deferred/it2]", make_cfg("deferred", "imu", match_iters=2)),
    ]
    if args.traj == "extreme":
        # The envelope edge needs 3 matching passes (see
        # tests/test_dynamics_envelope.py).
        repo_arms.append(
            ("repo[deferred/it3]", make_cfg("deferred", "imu", match_iters=3))
        )
    for name, cfg in repo_arms:
        t0 = time.time()
        res = run_offline(cfg, data.scans, events)
        record(name,
               np.array([r.time for r in res]),
               np.stack([r.pos for r in res]), time.time() - t0)

    if not args.no_emu:
        base_cfg = make_cfg("sequential")
        variants = {"emu[reference]": {}}
        tpu_all = dict(point_update="information", neighbor_retry="fixed",
                       insert_timing="scan_end",
                       requantize_after_downsample=True,
                       init_imu_a_from_grav=True)
        if args.ablate:
            for k, v in tpu_all.items():
                variants[f"emu[+{k}]"] = {k: v}
        variants["emu[tpu-all]"] = tpu_all
        for name, kw in variants.items():
            p = EmuParams.from_config(base_cfg)
            for k, v in kw.items():
                setattr(p, k, v)
            t0 = time.time()
            times, rots, poss, matched = run_emulator(data.scans, events, p)
            record(name, times, poss, time.time() - t0)

    # Pairwise table
    print("\npairwise trajectory RMSE (m):")
    names = list(out["runs"])
    anchor = "emu[reference]" if not args.no_emu else "repo[sequential]"
    ref = out["runs"][anchor]
    for n in names:
        if n == anchor:
            continue
        r = out["runs"][n]
        rmse, mx = _pairwise(r["times"], r["poss"], ref["times"], ref["poss"])
        print(f"  {n:22s} vs {anchor}: rmse={rmse:.4f} max={mx:.4f}")
        out["runs"][n]["vs_reference_rmse"] = rmse
        out["runs"][n]["vs_reference_max"] = mx
    if "emu[tpu-all]" in out["runs"]:
        ta = out["runs"]["emu[tpu-all]"]
        for rn in ("repo[sequential]", "repo[deferred]", "repo[deferred/cv]"):
            r = out["runs"][rn]
            rmse, mx = _pairwise(r["times"], r["poss"], ta["times"], ta["poss"])
            print(f"  {rn:22s} vs emu[tpu-all]:   rmse={rmse:.4f} max={mx:.4f}")
            out["runs"][rn]["vs_tpu_all_rmse"] = rmse
            out["runs"][rn]["vs_tpu_all_max"] = mx

    # Path length for the relative-ATE framing (BASELINE.md 2% target).
    seg = np.linalg.norm(np.diff(gt_pos, axis=0), axis=1).sum()
    out["path_length_m"] = float(seg)
    print(f"\npath length: {seg:.1f} m")
    if args.json_out:
        def clean(o):
            return {
                k: (v.tolist() if isinstance(v, np.ndarray) else
                    clean(v) if isinstance(v, dict) else v)
                for k, v in o.items()
            }
        with open(args.json_out, "w") as f:
            json.dump(clean(out), f)


if __name__ == "__main__":
    sys.exit(main())
