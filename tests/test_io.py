"""TUM writer/ATE, PCD roundtrip, checkpoint/resume."""

import numpy as np

from legkilo_tpu.io import tum
from legkilo_tpu.io.pcd import PcdSaver, read_pcd, write_pcd


def test_tum_write_read_roundtrip(tmp_path, rng):
    path = str(tmp_path / "traj.txt")
    rots, poss, times = [], [], []
    with tum.TrajectoryWriter(path) as w:
        for i in range(10):
            import oracle

            R = oracle.exp_so3(rng.normal(size=3))
            p = rng.normal(size=3)
            w.write(i * 0.1, R, p)
            rots.append(R)
            poss.append(p)
            times.append(i * 0.1)
    t, p, q = tum.read_tum(path)
    np.testing.assert_allclose(t, times, atol=1e-9)
    np.testing.assert_allclose(p, np.stack(poss), atol=1e-5)
    # Quaternions renormalized & consistent with rotations.
    for i in range(10):
        x, y, z, w_ = q[i]
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w_ * z), 2 * (x * z + w_ * y)],
            [2 * (x * y + w_ * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w_ * x)],
            [2 * (x * z - w_ * y), 2 * (y * z + w_ * x), 1 - 2 * (x * x + y * y)],
        ])
        np.testing.assert_allclose(R, rots[i], atol=1e-4)


def test_ate_alignment_invariance(rng):
    import oracle

    gt = rng.normal(size=(50, 3))
    R = oracle.exp_so3(rng.normal(size=3))
    t = rng.normal(size=3)
    est = gt @ R.T + t  # rigidly transformed copy
    assert tum.ate_rmse(est, gt, align=True) < 1e-6
    assert tum.ate_rmse(est, gt, align=False) > 0.1


def test_associate():
    ta = np.array([0.0, 0.1, 0.2, 0.9])
    tb = np.array([0.001, 0.101, 0.198, 0.5])
    ia, ib = tum.associate(ta, tb, max_dt=0.02)
    np.testing.assert_array_equal(ia, [0, 1, 2])
    np.testing.assert_array_equal(ib, [0, 1, 2])


def test_pcd_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    path = str(tmp_path / "cloud.pcd")
    write_pcd(path, pts)
    back = read_pcd(path)
    np.testing.assert_allclose(back, pts, atol=1e-7)


def test_pcd_saver_batches(tmp_path, rng):
    saver = PcdSaver(directory=str(tmp_path), frames_per_file=3, leaf_size=0.05)
    for _ in range(7):
        saver.save(rng.normal(size=(50, 3)).astype(np.float32))
    saver.close()
    import glob
    import os

    files = sorted(glob.glob(os.path.join(saver.directory, "*.pcd")))
    assert len(files) == 3  # 3 + 3 + 1 (flush on close)
    pts = read_pcd(files[0])
    assert 1 <= len(pts) <= 150


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from legkilo_tpu.core.filter import StaticConfig, init_carry
    from legkilo_tpu.core.voxel_map import MapConfig
    from legkilo_tpu.io import checkpoint

    scfg = StaticConfig(
        map_cfg=MapConfig(
            levels=2, capacity=256, probe=4, voxel_size=0.5,
            planer_threshold=0.01, sigma_num=3.0, max_points_num=50,
            init_num=(5, 5),
        ),
        use_kin=False, dept_err=0.04, beam_err=0.2,
    )
    carry = init_carry(scfg)
    carry = carry._replace(
        cov=carry.cov + 0.123,
        vm=carry.vm._replace(meta=carry.vm.meta.at[3, 0].set(7.0)),
    )
    path = checkpoint.save(
        str(tmp_path / "ckpt"), carry, step=42,
        extras={"g_over_acc_norm": np.asarray(1.25)},
    )
    restored, step, extras = checkpoint.load(path, init_carry(scfg))
    assert step == 42
    assert float(extras["g_over_acc_norm"]) == 1.25
    np.testing.assert_allclose(np.asarray(restored.cov), np.asarray(carry.cov))
    assert float(restored.vm.meta[3, 0]) == 7.0

    # Shape mismatch (different config) must be rejected.
    scfg_other = scfg._replace(map_cfg=scfg.map_cfg._replace(capacity=128))
    try:
        checkpoint.load(path, init_carry(scfg_other))
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_resume_equivalence(tmp_path):
    """Run N scans == run k scans, checkpoint, resume, run N-k: the resumed
    trajectory tail must match the uninterrupted run (VERDICT item 7)."""
    from legkilo_tpu.config import Config
    from legkilo_tpu.models import sim
    from legkilo_tpu.runner import run_offline

    cfg = Config()
    cfg.only_imu_use = True
    cfg.lidar.filter_num = 1
    cfg.lidar.blind = 0.3
    cfg.voxel_map.capacity_log2 = 12
    cfg.tpu.max_buckets = 32
    cfg.tpu.max_points_per_bucket = 64
    cfg.tpu.max_imu_per_bucket = 3
    cfg.tpu.pipeline = "deferred"

    data = sim.simulate(sim.SimConfig(duration=3.0, scan_points=1500, seed=11))
    full = run_offline(cfg, data.scans, data.imu)

    k = 12
    path = str(tmp_path / "resume_ckpt")
    head = run_offline(cfg, data.scans[:k], data.imu, save_ckpt=path)
    assert len(head) == k

    with np.load(path + ".npz") as d:
        last_event_time = float(d["x_last_event_time"])
    tail_events = [e for e in data.imu if e.time > last_event_time]
    tail = run_offline(cfg, data.scans[k:], tail_events, resume=path + ".npz")

    assert len(head) + len(tail) == len(full)
    for r_full, r_res in zip(full[k:], tail):
        assert r_full.time == r_res.time
        np.testing.assert_allclose(r_full.pos, r_res.pos, atol=1e-6)
        np.testing.assert_allclose(r_full.rot, r_res.rot, atol=1e-6)
        assert r_full.n_matched == r_res.n_matched


def test_pcd_intensity_roundtrip(tmp_path, rng):
    """Intensity is carried end-to-end into PCD files (PointXYZINormal /
    pcd_saver.hpp parity — VERDICT missing #2)."""
    pts = rng.uniform(-2, 2, size=(40, 3)).astype(np.float32)
    inten = rng.uniform(0, 255, 40).astype(np.float32)
    path = str(tmp_path / "i.pcd")
    write_pcd(path, pts, inten)
    back = read_pcd(path)
    assert back.shape == (40, 4)
    np.testing.assert_allclose(back[:, 0:3], pts, atol=1e-7)
    np.testing.assert_allclose(back[:, 3], inten, atol=1e-7)

    # Saver path: buffered frames with intensity downsample into xyzi files.
    saver = PcdSaver(directory=str(tmp_path), frames_per_file=2, leaf_size=0.01)
    saver.save(pts, intensity=inten)
    saver.save(pts + 5.0, intensity=inten)
    saver.close()
    import glob
    import os
    files = sorted(glob.glob(os.path.join(saver.directory, "*.pcd")))
    assert files
    out = read_pcd(files[0])
    assert out.shape[1] == 4 and len(out) > 0


def test_rpe_alignment_free_and_scaled(rng):
    """RPE (the evo metric the reference's workflow reports alongside ATE)
    must be invariant to a global SE(3) offset and scale with local error."""
    from legkilo_tpu.io.tum import quat_xyzw_from_rot, rot_from_quat_xyzw, rpe

    n = 50
    pos = np.cumsum(rng.normal(size=(n, 3)) * 0.1, axis=0)
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    ang = rng.uniform(0, 0.5, size=n)
    q = np.concatenate(
        [axes * np.sin(ang / 2)[:, None], np.cos(ang / 2)[:, None]], axis=1
    )
    t, r = rpe(pos, pos, q, q)
    assert t < 1e-12 and r < 1e-6

    # Global SE(3) offset cancels in relative motions.
    R_off = rot_from_quat_xyzw(np.array([0.3, -0.1, 0.2, 0.95]))
    R_off /= 1.0  # (normalized inside)
    R_all = rot_from_quat_xyzw(q)
    pos2 = pos @ R_off.T + np.array([5.0, -3.0, 1.0])
    q2 = np.stack([quat_xyzw_from_rot(R_off @ R_all[i]) for i in range(n)])
    t, r = rpe(pos2, pos, q2, q)
    assert t < 1e-9 and r < 1e-6

    # Local noise produces error of the right order.
    pos3 = pos + rng.normal(scale=0.01, size=pos.shape)
    t, r = rpe(pos3, pos, q, q)
    assert 0.005 < t < 0.05
