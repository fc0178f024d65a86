"""Non-planar world validation: the is-plane=false regime under geometry
that legitimately refuses a plane fit.

Round-4 verdict weak #6: every validation world was a perfect-plane world,
so the subdivision regime (init_plane eigen gate + cut_octo_tree descent,
voxel_map.cc:42-183; here the multi-level init/refit gating) was never
stressed by geometry.  ``sim.cluttered_world`` (rubble steps + crossing-disc
clusters) produces dozens of L0 voxels whose scatter genuinely fails the
0.01 eigen gate; these tests assert (a) the regime actually triggers,
(b) level descent initializes planar children inside non-planar parents,
(c) match rate and ATE stay sane for both pipelines, and (d) the
reference-semantics emulator agrees (parity row in
docs/PARITY_EMULATOR.md).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from legkilo_tpu.config import Config           # noqa: E402
from legkilo_tpu.models import sim              # noqa: E402
from legkilo_tpu.runner import OdometryRunner   # noqa: E402


def make_cfg(pipeline="deferred"):
    cfg = Config()
    cfg.only_imu_use = True
    cfg.lidar.filter_num = 1
    cfg.lidar.blind = 0.3
    cfg.lidar.voxel_grid_resolution = 0.2
    cfg.voxel_map.capacity_log2 = 14
    cfg.voxel_map.max_layer = 2
    cfg.tpu.max_buckets = 56
    cfg.tpu.max_points_per_bucket = 128
    cfg.tpu.max_imu_per_bucket = 3
    cfg.tpu.pipeline = pipeline
    return cfg


@pytest.fixture(scope="module")
def clutter_data():
    traj = sim.Trajectory(
        speed=0.8, z0=1.0, roll_amp=0.05, pitch_amp=0.03, bob=0.03
    )
    return sim.simulate(
        sim.SimConfig(duration=4.0, scan_points=2000, seed=3),
        world=sim.cluttered_world(seed=7), traj=traj,
    )


def _replay(cfg, data):
    runner = OdometryRunner(cfg)
    ev = iter(data.imu)
    pending = next(ev, None)
    for scan in data.scans:
        while pending is not None and pending.time <= scan.end_time + 0.5:
            runner.add_imu(pending)
            pending = next(ev, None)
        runner.add_scan(scan)
    runner.flush()
    return runner


def _errs(data, results):
    _, gt = data.gt_in_filter_frame()
    gtm = {round(t, 6): i for i, t in enumerate(data.gt_times)}
    return np.array([
        np.linalg.norm(r.pos - gt[gtm[round(r.time, 6)]])
        for r in results if round(r.time, 6) in gtm
    ])


def test_nonplanar_regime_exercised_and_tracking_sane(clutter_data):
    runner = _replay(make_cfg("deferred"), clutter_data)
    vm = runner.carry.vm

    C = runner.scfg.map_cfg.capacity
    init0 = np.asarray(vm.meta[:C, 2] > 0)
    plane0 = np.asarray(vm.ptab[:C, 4] > 0)
    nonplane0 = init0 & ~plane0
    # The whole point of the world: a meaningful population of L0 voxels
    # legitimately fails the plane eigen-gate (box worlds produce 0-1).
    assert nonplane0.sum() >= 12, (
        f"only {nonplane0.sum()} non-planar L0 voxels — world not "
        "exercising the subdivision regime"
    )

    # Level descent: inside non-planar L0 parents, L1 children exist and
    # fit planes (cut_octo_tree semantics: subdivide, fit the halves).
    keys0 = np.asarray(vm.ptab[:C][nonplane0, 0:3])          # [M, 3]
    init1 = np.asarray(vm.meta[C : 2 * C, 2] > 0)
    plane1 = np.asarray(vm.ptab[C : 2 * C, 4] > 0)
    keys1 = np.asarray(vm.ptab[C : 2 * C][init1 & plane1, 0:3])  # [K, 3]
    parents_of_l1 = np.floor_divide(keys1, 2)
    matched_parents = {
        tuple(k) for k in keys0
    } & {tuple(p) for p in parents_of_l1}
    assert len(matched_parents) >= 5, (
        "no planar L1 children found inside non-planar L0 parents — "
        "descent not exercised"
    )

    # False-match gating: tracking must stay sane despite the clutter.
    errs = _errs(clutter_data, runner.results)
    assert errs[-1] < 0.06, f"final error {errs[-1]:.3f} m"
    assert np.sqrt((errs ** 2).mean()) < 0.05
    rates = [
        r.n_matched / max(r.n_points, 1) for r in runner.results[5:]
    ]
    assert np.mean(rates) > 0.6, f"mean match rate {np.mean(rates):.2f}"


def test_sequential_and_deferred_agree_on_clutter(clutter_data):
    r_s = _replay(make_cfg("sequential"), clutter_data)
    r_d = _replay(make_cfg("deferred"), clutter_data)
    e_s = _errs(clutter_data, r_s.results)
    e_d = _errs(clutter_data, r_d.results)
    assert np.sqrt((e_s ** 2).mean()) < 0.05
    assert np.sqrt((e_d ** 2).mean()) < 0.05


def test_emulator_reference_semantics_on_clutter(clutter_data):
    """The float64 reference-semantics emulator (pointer octrees,
    cut_octo_tree recursion) must also track through the non-planar
    world — pinning that the TPU map's multi-level gating and the
    reference's recursive subdivision behave alike where plane fits
    genuinely fail."""
    from refemu.emulator import EmuParams, run_emulator

    cfg = make_cfg()
    p = EmuParams.from_config(cfg)
    times, rots, poss, matched = run_emulator(
        clutter_data.scans, clutter_data.imu, p
    )
    _, gt = clutter_data.gt_in_filter_frame()
    gtm = {round(t, 6): i for i, t in enumerate(clutter_data.gt_times)}
    sel = [i for i, t in enumerate(times) if round(t, 6) in gtm]
    idx = [gtm[round(times[i], 6)] for i in sel]
    ate = float(np.sqrt(np.mean(
        np.sum((poss[sel] - gt[idx]) ** 2, axis=1)
    )))
    assert ate < 0.06, f"emulator ATE {ate:.4f} m on cluttered world"
    assert np.mean(matched[5:]) > 300
