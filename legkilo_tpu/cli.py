"""Command-line interface: `python -m legkilo_tpu run|sweep|sim|bench`.

Replaces the reference's ROS node + launch files (src/apps/leg_kilo_node.cc,
legkilo/launch/*.launch):

  run    — replay a .bag (or .npz scan dump) through the filter, writing a
           TUM trajectory and optional PCD map export.
  sim    — run the synthetic world end-to-end and report ATE vs ground truth.
  sweep  — Monte-Carlo fleet replay of the simulator across all local
           devices (noise-parameter perturbations per replica).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

from . import config as config_mod
from .utils.timing import Timer
from .utils.timing import sync as _sync

log = logging.getLogger("legkilo_tpu")


def _load_config(path: str | None) -> config_mod.Config:
    return config_mod.load(path) if path else config_mod.Config()


def cmd_run(args: argparse.Namespace) -> int:
    from .io import rosbag as bag_mod
    from .io.dataset import ImuEvent
    from .io.tum import TrajectoryWriter
    from .models import lidar as lidar_mod
    from .models.unitree import HighState, Kinematics
    from .runner import OdometryRunner

    cfg = _load_config(args.config_file)
    runner = OdometryRunner(cfg, return_cloud=bool(args.save_pcd))
    if args.resume:
        step = runner.load_checkpoint(args.resume)
        log.info("Resumed from %s at step %d", args.resume, step)
    kin = Kinematics(cfg.kinematics)
    writer = TrajectoryWriter(args.traj_out) if args.traj_out else None
    pcd = None
    if args.save_pcd:
        from .io.pcd import PcdSaver

        pcd = PcdSaver(
            directory=args.save_pcd,
            frames_per_file=cfg.pcd_frames_per_file,
            leaf_size=cfg.pcd_voxel_leaf_size,
        )

    def handle(r):
        if r.n_points:
            log.info(
                "scan t=%.3f pos=(%.3f %.3f %.3f) matched %d/%d (%.0f%%)",
                r.time, *r.pos, r.n_matched, r.n_points,
                100.0 * r.n_matched / max(r.n_points, 1),
            )
        if writer:
            writer.write(r.time, r.rot, r.pos)
        if pcd is not None and r.cloud_world is not None:
            pcd.save(r.cloud_world, intensity=r.intensity)

    n_msgs = 0
    last_acc_z = last_gyr_z = None  # redundancy rejection state
    t0 = time.perf_counter()
    with bag_mod.BagReader(args.bag) as reader:
        topics = [cfg.lidar_topic, cfg.imu_topic, cfg.kinematic_topic]
        for msg in reader.messages(topics):
            n_msgs += 1
            if msg.topic == cfg.lidar_topic:
                with Timer.measure("Lidar Processing"):
                    scan = lidar_mod.decode(bag_mod.parse_pointcloud2(msg.raw), cfg.lidar)
                results = runner.add_scan(scan)
            elif msg.topic == cfg.imu_topic and cfg.only_imu_use:
                imu = bag_mod.parse_imu(msg.raw)
                # 500 Hz publish / 50 Hz effective: drop exact-duplicate
                # samples (redundancy, ros_interface.cc:198-204).
                if cfg.redundancy and (
                    imu.linear_acceleration[2] == last_acc_z
                    and imu.angular_velocity[2] == last_gyr_z
                ):
                    continue
                last_acc_z = imu.linear_acceleration[2]
                last_gyr_z = imu.angular_velocity[2]
                results = runner.add_imu(
                    ImuEvent(time=imu.stamp, acc=imu.linear_acceleration,
                             gyr=imu.angular_velocity)
                )
            elif msg.topic == cfg.kinematic_topic and not cfg.only_imu_use:
                hs = bag_mod.parse_high_state(msg.raw)
                if cfg.redundancy and (
                    hs.accelerometer[2] == last_acc_z
                    and hs.gyroscope[2] == last_gyr_z
                ):
                    continue
                last_acc_z = hs.accelerometer[2]
                last_gyr_z = hs.gyroscope[2]
                results = runner.add_kin_imu(
                    kin.processing(HighState(
                        stamp=hs.stamp, accelerometer=hs.accelerometer,
                        gyroscope=hs.gyroscope, motor_q=hs.motor_q,
                        motor_dq=hs.motor_dq, foot_force=hs.foot_force,
                    ))
                )
            else:
                continue
            for r in results:
                handle(r)
    for r in runner.flush():
        handle(r)
    if writer:
        writer.close()
    if pcd is not None:
        pcd.close()
    if args.save_ckpt:
        path = runner.save_checkpoint(args.save_ckpt)
        log.info("Saved checkpoint to %s", path)
    if args.export_planes:
        from .io.plane_export import export_plane_map

        n_planes = export_plane_map(
            runner.carry.vm, runner.scfg.map_cfg, args.export_planes
        )
        log.info("Exported %d planes to %s", n_planes, args.export_planes)
    wall = time.perf_counter() - t0
    log.info("Replayed %d messages, %d scans in %.1fs", n_msgs, len(runner.results), wall)
    Timer.log_all_average_time()
    return 0


def cmd_sim(args: argparse.Namespace) -> int:
    from .io.tum import TrajectoryWriter, ate_rmse
    from .models import sim as sim_mod
    from .runner import run_offline

    cfg = _load_config(args.config_file)
    cfg.lidar.filter_num = 1
    cfg.lidar.blind = 0.3
    if args.pipeline:
        cfg.tpu.pipeline = args.pipeline
    if args.pallas:
        cfg.tpu.use_pallas = True
        cfg.tpu.use_pallas_match = True
        cfg.tpu.use_pallas_insert = True
        cfg.tpu.use_pallas_pose = True
        cfg.tpu.use_pallas_refit = True
    data = sim_mod.simulate(
        sim_mod.SimConfig(duration=args.duration, scan_points=args.scan_points)
    )
    events = data.imu if cfg.only_imu_use else data.kin
    scans = data.scans
    if args.resume and args.skip_scans:
        # Continue a checkpointed run: drop already-processed scans and the
        # events the checkpoint consumed (buffered in-between events are
        # restored from the checkpoint itself; feeding earlier ones would
        # trip the packetizer's time-regression cache clear).
        scans = scans[args.skip_scans:]
        with np.load(args.resume) as d:
            let = float(d["x_last_event_time"])
        events = [e for e in events if e.time > let]
    t0 = time.perf_counter()
    results = run_offline(
        cfg, scans, events,
        resume=args.resume, save_ckpt=args.save_ckpt,
        chunk=args.chunk,
    )
    wall = time.perf_counter() - t0

    est_t = np.array([r.time for r in results])
    est_p = np.stack([r.pos for r in results])
    _, gt_pos_f = data.gt_in_filter_frame()
    gtm = {round(t, 6): i for i, t in enumerate(data.gt_times)}
    sel = [i for i, t in enumerate(est_t) if round(t, 6) in gtm]
    idx = [gtm[round(est_t[i], 6)] for i in sel]
    err = ate_rmse(est_p[sel], gt_pos_f[idx], align=False)
    if args.traj_out:
        with TrajectoryWriter(args.traj_out) as w:
            for r in results:
                w.write(r.time, r.rot, r.pos)
    per_scan_ms = wall / max(len(results), 1) * 1e3
    print(json.dumps({
        "scans": len(results), "ate_rmse_m": round(err, 4),
        "wall_s": round(wall, 2), "ms_per_scan": round(per_scan_ms, 2),
    }))
    Timer.log_all_average_time()
    return 0


def _maybe_multihost(args) -> bool:
    """Bring up jax.distributed from CLI flags (must run before any other
    jax call touches the backend).  Returns True in a multi-process run."""
    from .parallel import multihost

    if args.coordinator or args.num_processes:
        import jax

        try:
            # CPU cross-process collectives need gloo; a no-op for TPU runs
            # (the option only configures the CPU backend).
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
        multihost.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    import jax

    return jax.process_count() > 1


def _add_multihost_args(p) -> None:
    p.add_argument("--coordinator", default=None,
                   help="jax.distributed coordinator address host:port")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)


def _packets_from_streams(cfg, scans, events, use_kin: bool):
    """scans + events -> ordered HostPackets (the run_offline feed loop).

    NOTE: the fleet sweep consumes these packets through a batched step with
    no per-replica host intervention, so the streaming path's
    tpu_gap_reset_s soft reset cannot be applied there — fleet replay is
    gap-UNSAFE (a >gap sensor hole is mean-propagated).  We surface any
    such gap loudly here instead of silently diverging."""
    from .io.dataset import PacketBuilder

    builder = PacketBuilder(cfg)
    ev_iter = iter(sorted(events, key=lambda e: e.time))
    pending = next(ev_iter, None)
    packets = []
    for scan in scans:
        while pending is not None and pending.time <= scan.end_time + 0.5:
            if use_kin:
                builder.add_kin_imu(pending)
            else:
                builder.add_imu(pending)
            pending = next(ev_iter, None)
        builder.add_scan(scan)
        while builder.ready():
            packets.append(builder.pop())
    gap = float(cfg.tpu.gap_reset_s)
    if gap > 0.0:
        for p in packets:
            if p.rebase > gap:
                log.warning(
                    "staged packet has a %.1f s sensor gap (> tpu_gap_reset_s"
                    "=%.1f); fleet replay cannot soft-reset per replica — "
                    "this stream's trajectory will differ from streaming "
                    "replay (use `run` for gap recovery)", p.rebase, gap,
                )
    return packets


def _load_bag_streams(cfg, path: str):
    """One .bag -> (scans, imu_events) with redundancy rejection
    (ros_interface.cc:198-204)."""
    from .io import rosbag as bag_mod
    from .io.dataset import ImuEvent
    from .models import lidar as lidar_mod

    scans, events = [], []
    last_acc_z = last_gyr_z = None
    with bag_mod.BagReader(path) as reader:
        for msg in reader.messages([cfg.lidar_topic, cfg.imu_topic]):
            if msg.topic == cfg.lidar_topic:
                scans.append(
                    lidar_mod.decode(bag_mod.parse_pointcloud2(msg.raw), cfg.lidar)
                )
            elif msg.topic == cfg.imu_topic:
                imu = bag_mod.parse_imu(msg.raw)
                if cfg.redundancy and (
                    imu.linear_acceleration[2] == last_acc_z
                    and imu.angular_velocity[2] == last_gyr_z
                ):
                    continue
                last_acc_z = imu.linear_acceleration[2]
                last_gyr_z = imu.angular_velocity[2]
                events.append(ImuEvent(
                    time=imu.stamp, acc=imu.linear_acceleration,
                    gyr=imu.angular_velocity,
                ))
    return scans, events


def _save_fleet_ckpt(path, carry, bparams, n_done: int) -> str:
    """Fleet checkpoint: the batched carry (every replica's full filter:
    state, covariance, clocks, voxel map) + the per-replica FilterParams +
    the fleet step cursor.  Same .npz container as the single-filter
    checkpoint (io/checkpoint.py) — the fleet carry is the identical
    pytree with a leading replica axis."""
    import jax

    from .io import checkpoint as ckpt

    leaves, _ = jax.tree.flatten(bparams)
    extras = {f"bp_{i:03d}": np.asarray(l) for i, l in enumerate(leaves)}
    return ckpt.save(path, carry, step=int(n_done), extras=extras)


def _load_fleet_ckpt(path, carry_like, bparams_like):
    """Restore (carry, bparams, n_done) saved by _save_fleet_ckpt; shapes
    are validated against the freshly-built templates (config/replica-count
    mismatches fail loudly)."""
    import jax
    import jax.numpy as jnp

    from .io import checkpoint as ckpt

    carry, step, extras = ckpt.load(path, carry_like)
    leaves, treedef = jax.tree.flatten(bparams_like)
    new = []
    for i, leaf in enumerate(leaves):
        arr = extras[f"bp_{i:03d}"]
        if arr.shape != jnp.shape(leaf):
            raise ValueError(
                f"fleet checkpoint param {i} shape {arr.shape} != "
                f"{jnp.shape(leaf)} (replica count / config mismatch?)"
            )
        new.append(jnp.asarray(arr, dtype=leaf.dtype))
    return carry, jax.tree.unflatten(treedef, new), int(step or 0)


def _sweep_distinct(args, cfg, multihost_run: bool) -> int:
    """Distinct-replay fleet sweep: every replica advances through its OWN
    bag each step (the in_axes=0 path; BASELINE.json's batched-bag-replay
    north star).  --distinct N generates N different synthetic worlds
    (varied trajectory + noise seed); --bags replays real .bag files."""
    import glob

    import jax

    from .core import eskf as eskf_mod
    from .core.filter import FilterParams
    from .io.dataset import decimate_blind, to_device_packet
    from .io.tum import TrajectoryWriter, ate_rmse
    from .models import sim as sim_mod
    from .parallel.mesh import shard_batch
    from .parallel.sweep import (
        fleet_init, make_fleet_chunk_step, make_fleet_step,
        stack_fleet_chunks, stack_packets,
    )
    from .runner import make_static_config

    import jax.numpy as jnp

    datas = None
    if args.bags:
        paths = sorted(glob.glob(os.path.join(args.bags, "*.bag")))
        if not paths:
            print(json.dumps({"error": f"no .bag files in {args.bags}"}))
            return 1
        streams = [_load_bag_streams(cfg, p) for p in paths]
        names = [os.path.basename(p) for p in paths]
    else:
        n = args.distinct
        datas = []
        for r in range(n):
            traj = sim_mod.Trajectory(
                speed=0.6 + 0.12 * (r % 4),
                radius=2.0 + 0.4 * (r % 3),
                bob_freq=1.5 + 0.25 * (r % 4),
            )
            datas.append(sim_mod.simulate(
                sim_mod.SimConfig(duration=args.duration, seed=100 + r),
                traj=traj,
            ))
        streams = [(d.scans, d.imu) for d in datas]
        names = [f"sim{r}" for r in range(len(datas))]

    scfg = make_static_config(cfg, use_kin=False)
    ext_r = np.asarray(cfg.extrinsic_R, dtype=np.float32).reshape(3, 3)
    params = FilterParams(
        noise=eskf_mod.make_noise_params(cfg.eskf),
        ext_r=jnp.asarray(ext_r),
        ext_t=jnp.asarray(cfg.extrinsic_T, dtype=jnp.float32),
        g_over_acc_norm=jnp.asarray(1.0),  # set per replica by fleet_init
    )

    pkt_seqs, first_clouds, mean_accs, mean_gyrs, end_offsets = [], [], [], [], []
    for scans, events in streams:
        pkts = _packets_from_streams(cfg, scans, events, use_kin=False)
        first = pkts[0]
        m = first.imu_mask
        mean_accs.append(first.imu_acc[m].mean(axis=0))
        mean_gyrs.append(first.imu_gyr[m].mean(axis=0))
        end_offsets.append(first.end_offset)
        pts, _, _ = decimate_blind(
            scans[0].points, scans[0].time_offset,
            cfg.lidar.filter_num, cfg.lidar.blind,
        )
        first_clouds.append(pts)
        pkt_seqs.append(pkts)

    # The replica axis must divide the mesh: shard over the largest device
    # subset that divides B (multi-process meshes are fixed-shape and
    # require divisibility outright).
    B = len(pkt_seqs)
    if multihost_run:
        from .parallel.multihost import hierarchical_mesh

        mesh = hierarchical_mesh()
        if B % mesh.devices.size:
            print(json.dumps({
                "error": f"{B} replicas not divisible by "
                         f"{mesh.devices.size} devices"
            }))
            return 1
    else:
        from .parallel.mesh import make_mesh

        nd = len(jax.devices())
        n = next(k for k in range(min(B, nd), 0, -1) if B % k == 0)
        mesh = make_mesh(n)

    carry, bparams = fleet_init(
        scfg, params, first_clouds,
        np.stack(mean_accs), np.stack(mean_gyrs),
        np.asarray(end_offsets), float(cfg.gravity),
    )
    n_done = 0
    if getattr(args, "resume", None):
        carry, bparams, n_done = _load_fleet_ckpt(args.resume, carry, bparams)
        log.info("Resumed fleet from %s at step %d", args.resume, n_done)
    carry = shard_batch(carry, mesh)
    bparams = shard_batch(bparams, mesh)

    steps = stack_packets(
        [[to_device_packet(p) for p in seq[1:]] for seq in pkt_seqs]
    )
    max_steps = max(0, int(getattr(args, "max_steps", 0) or 0))
    hi = min(len(steps), n_done + max_steps) if max_steps else len(steps)
    steps = steps[n_done:hi]
    if not steps:
        print(json.dumps({"error": "no steps left to replay "
                          f"(resumed at {n_done})"}))
        return 1
    chunk = max(1, int(getattr(args, "chunk", 0) or 1))
    chunk = min(chunk, len(steps))

    est, est_rot = [], []   # per step [B, 3], [B, 3, 3]
    stats = None
    if chunk > 1:
        # Offline throughput mode: one dispatch advances the whole fleet
        # by K scans (vmap(process_scan_chunk); bit-identical to per-scan
        # fleet stepping, tests/test_fleet_chunk.py).
        step = make_fleet_chunk_step(scfg, mesh=mesh)
        chunks = stack_fleet_chunks(steps, chunk)
        t0 = time.perf_counter()
        for dev in chunks:
            carry, outs, stats = step(carry, shard_batch(dev, mesh), bparams)
            pos = np.asarray(outs.pos)          # [B, K, 3]
            rot = np.asarray(outs.rot)
            for k in range(pos.shape[1]):
                est.append(pos[:, k])
                est_rot.append(rot[:, k])
        _sync(stats)
        wall = time.perf_counter() - t0
        n_steps = len(chunks) * chunk
    else:
        step = make_fleet_step(scfg, mesh=mesh)
        t0 = time.perf_counter()
        for dev in steps:
            carry, out, stats = step(carry, shard_batch(dev, mesh), bparams)
            est.append(np.asarray(out.pos))
            est_rot.append(np.asarray(out.rot))
        _sync(stats)
        wall = time.perf_counter() - t0
        n_steps = len(steps)
    times = [
        [p.end_time for p in seq[1 + n_done : 1 + n_done + n_steps]]
        for seq in pkt_seqs
    ]
    est = np.stack(est)          # [T, B, 3]
    est_rot = np.stack(est_rot)  # [T, B, 3, 3]
    B = est.shape[1]

    report = {
        "replicas": B, "devices": int(mesh.devices.size), "scans": n_steps,
        "wall_s": round(wall, 2),
        "replica_scans_per_s": round(B * n_steps / max(wall, 1e-9), 1),
        "mean_matched": round(float(stats.mean_matched), 1),
        "chunk": chunk,
    }
    if n_done:
        report["resumed_at"] = n_done
    if getattr(args, "save_ckpt", None) and jax.process_index() == 0:
        path = _save_fleet_ckpt(args.save_ckpt, carry, bparams,
                                n_done + n_steps)
        report["checkpoint"] = path
    if datas is not None:
        ates = []
        for r, d in enumerate(datas):
            _, gt_pos_f = d.gt_in_filter_frame()
            gtm = {round(t, 6): i for i, t in enumerate(d.gt_times)}
            sel = [i for i, t in enumerate(times[r]) if round(t, 6) in gtm]
            idx = [gtm[round(times[r][i], 6)] for i in sel]
            ates.append(round(ate_rmse(est[sel, r], gt_pos_f[idx], align=False), 4))
        report["ate_per_replica_m"] = dict(zip(names, ates))
    if args.traj_out:
        os.makedirs(args.traj_out, exist_ok=True)
        for r, name in enumerate(names):
            with TrajectoryWriter(
                os.path.join(args.traj_out, f"{name}.tum")
            ) as w:
                for t in range(n_steps):
                    w.write(times[r][t], est_rot[t, r], est[t, r])
    if jax.process_index() == 0:
        print(json.dumps(report))
    return 0


def cmd_sweep(args: argparse.Namespace) -> int:
    multihost_run = _maybe_multihost(args)

    import jax
    import jax.numpy as jnp

    from .core import eskf as eskf_mod
    from .core.filter import FilterParams, StaticConfig
    from .core.voxel_map import map_config_from
    from .io.dataset import PacketBuilder, to_device_packet
    from .models import sim as sim_mod
    from .parallel.mesh import make_mesh, shard_batch
    from .parallel.sweep import (
        batched_carry, broadcast_packets, make_fleet_step, perturb_params,
    )

    cfg = _load_config(args.config_file)
    cfg.only_imu_use = True
    cfg.lidar.filter_num = 1
    cfg.lidar.blind = 0.3

    if args.distinct or args.bags:
        if getattr(args, "pipeline", None):
            cfg.tpu.pipeline = args.pipeline
        return _sweep_distinct(args, cfg, multihost_run)

    data = sim_mod.simulate(sim_mod.SimConfig(duration=args.duration))
    builder = PacketBuilder(cfg)
    for ev in data.imu:
        builder.add_imu(ev)
    packets = []
    for scan in data.scans:
        builder.add_scan(scan)
        while builder.ready():
            packets.append(builder.pop())

    if getattr(args, "pipeline", None):
        cfg.tpu.pipeline = args.pipeline
    if getattr(args, "pallas", False):
        cfg.tpu.use_pallas = True
        cfg.tpu.use_pallas_match = True
        cfg.tpu.use_pallas_insert = True
        cfg.tpu.use_pallas_pose = True
        cfg.tpu.use_pallas_refit = True
    from .runner import make_static_config

    scfg = make_static_config(cfg, use_kin=False)
    ext_r = np.asarray(cfg.extrinsic_R, dtype=np.float32).reshape(3, 3)
    params = FilterParams(
        noise=eskf_mod.make_noise_params(cfg.eskf),
        ext_r=jnp.asarray(ext_r),
        ext_t=jnp.asarray(cfg.extrinsic_T, dtype=jnp.float32),
        g_over_acc_norm=jnp.asarray(float(cfg.gravity / np.linalg.norm(data.mean_acc))),
    )
    if multihost_run:
        # (dcn, ici) hierarchical mesh: replicas split across hosts first,
        # local devices second; fleet reductions ride ICI then DCN once.
        from .parallel.multihost import hierarchical_mesh

        mesh = hierarchical_mesh()
    else:
        mesh = make_mesh()
    B = args.replicas or len(jax.devices())
    carry = shard_batch(batched_carry(scfg, B), mesh)
    bparams = shard_batch(perturb_params(params, B, scale=args.noise_scale), mesh)
    step = make_fleet_step(scfg, mesh=mesh)

    # Pre-stage all packets on device: per-step host->device uploads hide
    # the actual step rate (each synchronous transfer costs ~30 ms through
    # a tunneled device).
    devs = [
        shard_batch(broadcast_packets(to_device_packet(p), B), mesh)
        for p in packets
    ]
    # Warm-up on the first packets (includes compile + map bootstrap);
    # throughput is the steady-state rate.
    stats = None
    n_warm = min(3, len(devs) - 1)
    for dev in devs[:n_warm]:
        carry, out, stats = step(carry, dev, bparams)
    _sync(stats)

    t0 = time.perf_counter()
    for dev in devs[n_warm:]:
        carry, out, stats = step(carry, dev, bparams)
    _sync(stats)
    wall = time.perf_counter() - t0
    n_timed = len(packets) - n_warm
    if jax.process_index() == 0:
        print(json.dumps({
            "replicas": B, "devices": len(jax.devices()),
            "processes": jax.process_count(), "scans": n_timed,
            "wall_s": round(wall, 2),
            "replica_scans_per_s": round(B * n_timed / wall, 1),
            "final_spread_m": float(stats.pos_spread),
        }))
    return 0


def cmd_eval(args: argparse.Namespace) -> int:
    """Offline trajectory evaluation (the evo/ATE workflow the reference
    delegates to external tools; SURVEY.md §4.2)."""
    from .io.tum import associate, ate_rmse, read_tum, rpe

    t_est, p_est, q_est = read_tum(args.est)
    t_gt, p_gt, q_gt = read_tum(args.gt)
    ia, ib = associate(t_est, t_gt, max_dt=args.max_dt)
    if len(ia) < 2:
        print(json.dumps({"error": "fewer than 2 associated poses"}))
        return 1
    rpe_t, rpe_r = rpe(
        p_est[ia], p_gt[ib], q_est[ia], q_gt[ib], delta=args.rpe_delta
    )
    out = {
        "pairs": int(len(ia)),
        "ate_rmse_m": round(ate_rmse(p_est[ia], p_gt[ib], align=not args.no_align), 4),
        "ate_rmse_unaligned_m": round(ate_rmse(p_est[ia], p_gt[ib], align=False), 4),
        "rpe_trans_rmse_m": round(rpe_t, 4),
        "rpe_rot_rmse_deg": round(float(np.degrees(rpe_r)), 4),
    }
    print(json.dumps(out))
    return 0


def cmd_scale(args: argparse.Namespace) -> int:
    """Weak-scaling efficiency measurement across local devices (or, with
    --coordinator/--num_processes, across a jax.distributed mesh)."""
    _maybe_multihost(args)

    import jax
    import jax.numpy as jnp

    from .core import eskf as eskf_mod
    from .core.filter import FilterParams, StaticConfig
    from .core.voxel_map import map_config_from
    from .io.dataset import PacketBuilder, to_device_packet
    from .models import sim as sim_mod
    from .parallel.scaling import measure_scaling

    cfg = _load_config(args.config_file)
    cfg.only_imu_use = True
    cfg.lidar.filter_num = 1
    cfg.lidar.blind = 0.3
    cfg.voxel_map.capacity_log2 = min(cfg.voxel_map.capacity_log2, 14)
    data = sim_mod.simulate(sim_mod.SimConfig(duration=args.duration))
    builder = PacketBuilder(cfg)
    for ev in data.imu:
        builder.add_imu(ev)
    packets = []
    for scan in data.scans:
        builder.add_scan(scan)
        while builder.ready():
            packets.append(to_device_packet(builder.pop()))

    scfg = StaticConfig(
        map_cfg=map_config_from(cfg.voxel_map),
        use_kin=False,
        dept_err=cfg.voxel_map.dept_err,
        beam_err=cfg.voxel_map.beam_err,
    )
    params = FilterParams(
        noise=eskf_mod.make_noise_params(cfg.eskf),
        ext_r=jnp.asarray(np.asarray(cfg.extrinsic_R, np.float32).reshape(3, 3)),
        ext_t=jnp.asarray(cfg.extrinsic_T, dtype=jnp.float32),
        g_over_acc_norm=jnp.asarray(
            float(cfg.gravity / np.linalg.norm(data.mean_acc))
        ),
    )
    counts = [int(x) for x in args.devices.split(",")] if args.devices else None
    if counts is None:
        n = len(jax.devices())
        counts = sorted({1, max(n // 2, 1), n})
    res = measure_scaling(
        scfg, params, packets, counts, replicas_per_device=args.replicas_per_device
    )
    print(json.dumps(res))
    return 0


def _setup_compile_cache() -> None:
    """Persist TPU compiles across CLI invocations.

    Full scan-program compiles take minutes through the tunneled rig
    (docs/PERF_NOTES.md); without a persistent cache every `legkilo_tpu
    sim|run` pays that cost again.  Set unconditionally and WITHOUT
    touching a backend: probing jax.default_backend() here would
    initialize all backends before the multihost path runs
    (jax.distributed.initialize raises after backends exist) and force a
    connection to the serialized tunneled TPU on every invocation,
    including --help.  The 1 s min-compile-time gate keeps CPU cache
    bloat negligible.  Override the location with LEGKILO_CACHE_DIR;
    disable with LEGKILO_CACHE_DIR=''."""
    cache = os.environ.get(
        "LEGKILO_CACHE_DIR",
        os.path.join(
            os.path.expanduser("~"), ".cache", "legkilo_tpu", "jax"
        ),
    )
    if not cache:
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def main(argv=None) -> int:
    from .utils.logging import setup as setup_logging

    setup_logging(log_dir="logs")
    _setup_compile_cache()
    ap = argparse.ArgumentParser(prog="legkilo_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="replay a rosbag")
    p_run.add_argument("--config_file", required=True)
    p_run.add_argument("--bag", required=True)
    p_run.add_argument("--traj_out", default=None)
    p_run.add_argument("--save_pcd", default=None, help="PCD output directory")
    p_run.add_argument(
        "--export_planes", default=None,
        help="write the voxel plane map as a colored PLY mesh",
    )
    p_run.add_argument("--save_ckpt", default=None,
                       help="write a filter checkpoint (.npz) at stream end")
    p_run.add_argument("--resume", default=None,
                       help="restore a checkpoint before replay")
    p_run.set_defaults(fn=cmd_run)

    p_sim = sub.add_parser("sim", help="synthetic end-to-end replay")
    p_sim.add_argument("--config_file", default=None)
    p_sim.add_argument("--duration", type=float, default=5.0)
    p_sim.add_argument("--scan_points", type=int, default=4000)
    p_sim.add_argument("--traj_out", default=None)
    p_sim.add_argument("--pipeline", default=None,
                       choices=["sequential", "deferred"])
    p_sim.add_argument("--pallas", action="store_true",
                       help="deferred mode: use the fused Pallas ESKF chain")
    p_sim.add_argument("--save_ckpt", default=None,
                       help="write a filter checkpoint (.npz) at stream end")
    p_sim.add_argument("--resume", default=None,
                       help="restore a checkpoint before replay")
    p_sim.add_argument("--chunk", type=int, default=0,
                       help="replay N scans per device dispatch (offline "
                            "throughput mode; 0 = per-scan streaming)")
    p_sim.add_argument("--skip_scans", type=int, default=0,
                       help="with --resume: skip the first N (already "
                            "processed) scans and their events")
    p_sim.set_defaults(fn=cmd_sim)

    p_sw = sub.add_parser("sweep", help="Monte-Carlo fleet replay")
    p_sw.add_argument("--config_file", default=None)
    p_sw.add_argument("--duration", type=float, default=3.0)
    p_sw.add_argument("--replicas", type=int, default=None)
    p_sw.add_argument("--noise_scale", type=float, default=0.1)
    p_sw.add_argument("--pipeline", default=None,
                      choices=["sequential", "deferred"])
    p_sw.add_argument("--pallas", action="store_true",
                      help="deferred mode: fused Pallas kernels")
    p_sw.add_argument("--distinct", type=int, default=0,
                      help="fleet over N DISTINCT synthetic bags (varied "
                           "trajectories); reports per-replica ATE")
    p_sw.add_argument("--bags", default=None,
                      help="directory of .bag files: one replica per bag "
                           "(batched distinct-bag replay)")
    p_sw.add_argument("--traj_out", default=None,
                      help="with --distinct/--bags: directory for "
                           "per-replica TUM trajectories")
    p_sw.add_argument("--chunk", type=int, default=0,
                      help="with --distinct/--bags: advance the fleet N "
                           "scans per dispatch (vmap(process_scan_chunk); "
                           "offline throughput mode)")
    p_sw.add_argument("--save_ckpt", default=None,
                      help="with --distinct/--bags: write a FLEET checkpoint "
                           "(.npz: batched carry + per-replica params) at "
                           "sweep end")
    p_sw.add_argument("--resume", default=None,
                      help="with --distinct/--bags: restore a fleet "
                           "checkpoint and continue from the saved scan")
    p_sw.add_argument("--max_steps", type=int, default=0,
                      help="with --distinct/--bags: stop after N fleet steps "
                           "(use with --save_ckpt to split long sweeps)")
    _add_multihost_args(p_sw)
    p_sw.set_defaults(fn=cmd_sweep)

    p_ev = sub.add_parser("eval", help="ATE between two TUM trajectories")
    p_ev.add_argument("--est", required=True)
    p_ev.add_argument("--gt", required=True)
    p_ev.add_argument("--max_dt", type=float, default=0.02)
    p_ev.add_argument("--no_align", action="store_true")
    p_ev.add_argument("--rpe_delta", type=int, default=1,
                      help="frame delta for the relative pose error")
    p_ev.set_defaults(fn=cmd_eval)

    p_sc = sub.add_parser("scale", help="weak-scaling efficiency sweep")
    p_sc.add_argument("--config_file", default=None)
    p_sc.add_argument("--duration", type=float, default=2.0)
    p_sc.add_argument("--devices", default=None, help="comma list, e.g. 1,4,8")
    p_sc.add_argument("--replicas_per_device", type=int, default=1)
    _add_multihost_args(p_sc)
    p_sc.set_defaults(fn=cmd_scale)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
