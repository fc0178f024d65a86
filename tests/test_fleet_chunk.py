"""Chunked fleet stepping == per-scan fleet stepping (round-3 weak #4).

The fleet step is host/dispatch-bound (~flat step time in B,
docs/PERF_NOTES.md fleet table), so ``vmap(process_scan_chunk)`` should
multiply offline sweep throughput by ~K.  These tests prove the chunked
path is equivalent: same carries, same per-scan outputs, distinct
per-replica streams, and through the CLI.
"""

import json

import jax
import numpy as np

from legkilo_tpu import cli
from legkilo_tpu.config import Config
from legkilo_tpu.core.filter import FilterParams
from legkilo_tpu.core import eskf as eskf_mod
from legkilo_tpu.io.dataset import decimate_blind, to_device_packet
from legkilo_tpu.models import sim
from legkilo_tpu.parallel.sweep import (
    fleet_init,
    make_fleet_chunk_step,
    make_fleet_step,
    stack_fleet_chunks,
    stack_packets,
)
from legkilo_tpu.runner import make_static_config


def _packets(cfg, data):
    from legkilo_tpu.io.dataset import PacketBuilder

    b = PacketBuilder(cfg)
    ev = iter(sorted(data.imu, key=lambda e: e.time))
    pending = next(ev, None)
    pkts = []
    for scan in data.scans:
        while pending is not None and pending.time <= scan.end_time + 0.5:
            b.add_imu(pending)
            pending = next(ev, None)
        b.add_scan(scan)
        while b.ready():
            pkts.append(b.pop())
    return pkts


def test_fleet_chunk_equals_per_scan_stepping():
    B, K = 3, 4
    cfg = Config()
    cfg.only_imu_use = True
    cfg.lidar.filter_num = 1
    cfg.lidar.blind = 0.3
    cfg.lidar.voxel_grid_resolution = 0.5
    cfg.voxel_map.capacity_log2 = 12
    cfg.voxel_map.max_layer = 1
    cfg.tpu.max_buckets = 56
    cfg.tpu.max_points_per_bucket = 64
    cfg.tpu.max_imu_per_bucket = 3
    cfg.tpu.pipeline = "deferred"

    seqs, clouds, accs, gyrs, offs = [], [], [], [], []
    for r in range(B):
        traj = sim.Trajectory(speed=0.5 + 0.2 * r, radius=2.0 + 0.3 * r)
        data = sim.simulate(
            sim.SimConfig(duration=1.6, scan_points=1500, seed=40 + r),
            traj=traj,
        )
        pkts = _packets(cfg, data)
        first = pkts[0]
        m = first.imu_mask
        accs.append(first.imu_acc[m].mean(axis=0))
        gyrs.append(first.imu_gyr[m].mean(axis=0))
        offs.append(first.end_offset)
        pts, _, _ = decimate_blind(
            data.scans[0].points, data.scans[0].time_offset,
            cfg.lidar.filter_num, cfg.lidar.blind,
        )
        clouds.append(pts)
        seqs.append([to_device_packet(p) for p in pkts[1:]])

    scfg = make_static_config(cfg, use_kin=False)
    params = FilterParams(
        noise=eskf_mod.make_noise_params(cfg.eskf),
        ext_r=jax.numpy.eye(3),
        ext_t=jax.numpy.asarray([0.0, 0.0, 0.2]),
        g_over_acc_norm=jax.numpy.asarray(1.0),
    )
    carry0, bparams = fleet_init(
        scfg, params, clouds, np.stack(accs), np.stack(gyrs),
        np.asarray(offs), 9.81,
    )

    steps = stack_packets(seqs)[: 2 * K]
    assert len(steps) == 2 * K, f"need {2*K} steps, have {len(steps)}"

    # Per-scan reference run.
    step1 = make_fleet_step(scfg)
    c_ref = carry0
    ref_pos, ref_nm = [], []
    for dev in steps:
        c_ref, out, _ = step1(c_ref, dev, bparams)
        ref_pos.append(np.asarray(out.pos))
        ref_nm.append(np.asarray(out.n_matched))

    # Chunked run.
    stepK = make_fleet_chunk_step(scfg)
    c_chk = carry0
    chk_pos, chk_nm = [], []
    for dev in stack_fleet_chunks(steps, K):
        c_chk, outs, stats = stepK(c_chk, dev, bparams)
        pos = np.asarray(outs.pos)              # [B, K, 3]
        nm = np.asarray(outs.n_matched)
        for k in range(K):
            chk_pos.append(pos[:, k])
            chk_nm.append(nm[:, k])
        assert np.isfinite(float(stats.pos_spread))

    assert len(chk_pos) == len(ref_pos)
    for t in range(len(ref_pos)):
        np.testing.assert_array_equal(ref_nm[t], chk_nm[t])
        np.testing.assert_allclose(ref_pos[t], chk_pos[t], atol=1e-6)
    # Carries identical too (map included).
    for a, b in zip(jax.tree.leaves(c_ref), jax.tree.leaves(c_chk)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        )


def test_cli_sweep_distinct_chunked(tmp_path, capsys):
    rc = cli.main([
        "sweep", "--distinct", "2", "--duration", "1.6", "--chunk", "4",
        "--traj_out", str(tmp_path),
    ])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    report = json.loads(lines[-1])
    assert report["chunk"] == 4
    assert report["replicas"] == 2
    assert report["scans"] % 4 == 0
    for name, ate in report["ate_per_replica_m"].items():
        assert ate < 0.08, f"{name}: ATE {ate} m"
