"""Odometry runner: host orchestration of the jitted per-scan filter.

The reference's L3/L4 (RosInterface + node main loop,
/root/reference/legkilo/src/interface/ros1/, src/apps/leg_kilo_node.cc)
replaced by a replay engine: sensor streams -> PacketBuilder -> jitted
``process_scan`` -> trajectory/cloud outputs.  No ROS; datasets come from
converted bags (io/rosbag.py) or the simulator (models/sim.py).
"""

from __future__ import annotations

import collections
import dataclasses
import logging
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .core import eskf as eskf_mod
from .core.filter import (
    FilterCarry,
    FilterParams,
    StaticConfig,
    first_frame_map,
    init_carry,
    init_state_from_imu,
    process_scan,
    soft_reset_carry,
)
from .core.voxel_map import map_config_from
from .io.dataset import (
    HostPacket,
    PacketBuilder,
    RawScan,
    decimate_blind,
    to_device_packet,
)
from .utils.timing import Timer

log = logging.getLogger(__name__)

_FIRST_FRAME_PAD = 8192  # static shape for the (once-only) first-frame map build


@dataclasses.dataclass
class ScanResult:
    time: float
    rot: np.ndarray
    pos: np.ndarray
    n_matched: int
    n_points: int
    n_raw: int
    cloud_world: Optional[np.ndarray] = None  # [M, 3] valid points only
    intensity: Optional[np.ndarray] = None    # [M] aligned with cloud_world


def make_static_config(
    cfg: Config, use_kin=None, return_cloud: bool = False
) -> StaticConfig:
    """StaticConfig from a full Config (single construction point shared by
    the runner, the fleet sweep, and tools)."""
    return StaticConfig(
        map_cfg=map_config_from(
            cfg.voxel_map, use_pallas_refit=bool(cfg.tpu.use_pallas_refit)
        ),
        use_kin=(not cfg.only_imu_use) if use_kin is None else bool(use_kin),
        dept_err=float(cfg.voxel_map.dept_err),
        beam_err=float(cfg.voxel_map.beam_err),
        map_sliding_en=bool(cfg.voxel_map.map_sliding_en),
        sliding_thresh=float(cfg.voxel_map.sliding_thresh),
        half_map_size=int(cfg.voxel_map.half_map_size),
        return_cloud=return_cloud,
        pipeline=cfg.tpu.pipeline,
        use_pallas=bool(cfg.tpu.use_pallas),
        use_pallas_match=bool(cfg.tpu.use_pallas_match),
        use_pallas_insert=bool(cfg.tpu.use_pallas_insert),
        use_pallas_pose=bool(cfg.tpu.use_pallas_pose),
        insert_cap=max(0, int(cfg.tpu.insert_cap)),
        match_cap=max(0, int(cfg.tpu.match_cap)),
        chain_impl=cfg.tpu.chain_impl,
        chain_unroll=max(1, int(cfg.tpu.chain_unroll)),
        insert_reuse_probe=bool(cfg.tpu.insert_reuse_probe),
        match_pose=cfg.tpu.match_pose,
        match_iters=max(1, int(cfg.tpu.match_iters)),
        symmetrize_cov=bool(cfg.tpu.symmetrize_cov),
    )


class OdometryRunner:
    """Stateful replay engine around the pure jitted filter functions."""

    def __init__(self, cfg: Config, return_cloud: bool = False, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self.scfg = make_static_config(cfg, return_cloud=return_cloud)
        ext_r = np.asarray(cfg.extrinsic_R, dtype=np.float64).reshape(3, 3)
        ext_t = np.asarray(cfg.extrinsic_T, dtype=np.float64)
        self.params = FilterParams(
            noise=eskf_mod.make_noise_params(cfg.eskf, dtype=dtype),
            ext_r=jnp.asarray(ext_r, dtype=dtype),
            ext_t=jnp.asarray(ext_t, dtype=dtype),
            g_over_acc_norm=jnp.asarray(1.0, dtype=dtype),  # set at init
        )
        self.builder = PacketBuilder(cfg)
        self.carry: FilterCarry = init_carry(self.scfg, dtype=dtype)
        self.initialized = False
        # NOTE: donation of the carry (to update the ~100 MB map in place) is
        # deferred to the perf pass — host-constructed carries can alias
        # leaves, which XLA rejects when donated.
        if self.scfg.pipeline == "deferred":
            from .core.filter_deferred import process_scan_deferred

            self._step = jax.jit(process_scan_deferred, static_argnums=3)
        else:
            self._step = jax.jit(process_scan, static_argnums=3)
        self._first_map = jax.jit(first_frame_map, static_argnums=1)
        self.results: List[ScanResult] = []
        # Host-feed pipelining (the PP analog of the reference's 3 producer
        # threads + consumer main loop, ros_interface.cc:125-172, 380-404):
        # JAX dispatch is async, so the only per-scan host sync is the
        # np.asarray materialization of the outputs.  Keeping a bounded
        # window of dispatched scans in flight lets packet build + upload of
        # scan k+1 overlap device compute of scan k; results still come back
        # strictly in scan order, just up to ``pipeline_depth`` scans late.
        self.pipeline_depth = max(0, int(cfg.tpu.pipeline_depth))
        self._inflight: collections.deque = collections.deque()
        # Divergence observability: consecutive scans with a collapsed
        # match rate (the failure signature of every diverged run —
        # tests/test_robustness.py, dynamics-envelope study).
        self._n_done = 0
        self._low_match_streak = 0
        # Auto-escalating iterated matching (deferred pipeline): on
        # sustained match collapse, switch the step onto a higher
        # match_iters StaticConfig (a second pre-declared executable —
        # static_argnums recompiles on first use, cached after) and fall
        # back once the rate recovers.  This replaces the reference's
        # per-bucket in-scan feedback (KILO.cc:108-233), which
        # self-corrects association within a scan and needs no operator.
        esc_iters = max(0, int(cfg.tpu.match_iters_escalated))
        self._esc_ratio = float(cfg.tpu.escalate_ratio)
        self._esc_after = max(0, int(cfg.tpu.escalate_after))
        # 0 = sticky escalation (never release) — the production default;
        # see TpuConfig for the measured rationale.
        self._deesc_after = max(0, int(cfg.tpu.deescalate_after))
        self._esc_streak = 0
        self._esc_enabled = (
            self.scfg.pipeline == "deferred"
            and self._esc_after > 0
            and esc_iters > self.scfg.match_iters
        )
        self._scfg_esc = self.scfg._replace(match_iters=esc_iters)
        self._scfg_active = self.scfg
        self._esc_active = False
        self._healthy_streak = 0
        # Latch: a re-escalation shortly after de-escalating means the
        # regime (not a transient) needs iterated matching — stop
        # oscillating and stay escalated.
        self._esc_latched = False
        self._last_deesc = -(10 ** 9)

    # -- streaming input ---------------------------------------------------
    def add_scan(self, scan: RawScan) -> List[ScanResult]:
        self.builder.add_scan(scan)
        return self._drain()

    def add_imu(self, ev) -> List[ScanResult]:
        self.builder.add_imu(ev)
        return self._drain()

    def add_kin_imu(self, ev) -> List[ScanResult]:
        self.builder.add_kin_imu(ev)
        return self._drain()

    def _drain(self) -> List[ScanResult]:
        out = []
        while True:
            if not self.builder.ready():
                break
            scan = self.builder._scans[0]
            pkt = self.builder.pop()
            if pkt is None:
                break
            if not self.initialized:
                self._initialize(scan, pkt)
                out.append(
                    ScanResult(
                        time=pkt.end_time,
                        rot=np.asarray(self.carry.state.rot),
                        pos=np.asarray(self.carry.state.pos),
                        n_matched=0,
                        n_points=0,
                        n_raw=pkt.n_raw,
                    )
                )
                continue
            self._dispatch(pkt)
            while len(self._inflight) > self.pipeline_depth:
                out.append(self._materialize(*self._inflight.popleft()))
        self.results.extend(out)
        return out

    def flush(self) -> List[ScanResult]:
        """Materialize every in-flight scan (call at stream end)."""
        out = []
        while self._inflight:
            out.append(self._materialize(*self._inflight.popleft()))
        self.results.extend(out)
        return out

    # -- internals ---------------------------------------------------------
    def _initialize(self, scan: RawScan, pkt: HostPacket) -> None:
        """First-frame path (KILO.cc:332-353)."""
        events = self._events_from_packet(pkt)
        if not events:
            log.warning("First packet has no IMU events; skipping init")
            return
        mean_acc, mean_gyr = events
        carry, acc_norm = init_state_from_imu(
            self.carry,
            jnp.asarray(mean_acc, dtype=self.dtype),
            jnp.asarray(mean_gyr, dtype=self.dtype),
            float(self.cfg.gravity),
            jnp.asarray(pkt.end_offset, dtype=self.dtype),
        )
        self.params = self.params._replace(
            g_over_acc_norm=(self.cfg.gravity / acc_norm).astype(self.dtype)
        )
        # Map from the decimated+blind-filtered raw cloud (KILO.cc:336-339
        # builds from cloud_raw, i.e. LidarProcessing output, undownsampled).
        pts, _, _ = decimate_blind(
            scan.points, scan.time_offset,
            self.cfg.lidar.filter_num, self.cfg.lidar.blind,
        )
        n = min(len(pts), _FIRST_FRAME_PAD)
        buf = np.zeros((_FIRST_FRAME_PAD, 3), dtype=np.float32)
        buf[:n] = pts[:n]
        mask = np.zeros(_FIRST_FRAME_PAD, dtype=bool)
        mask[:n] = True
        self.carry = self._first_map(
            carry, self.scfg, self.params, jnp.asarray(buf), jnp.asarray(mask)
        )
        self.initialized = True
        g = np.asarray(self.carry.state.grav)
        log.info(
            "Initialization finished: gravity=(%.3f %.3f %.3f) |acc|=%.3f",
            g[0], g[1], g[2], float(acc_norm),
        )

    # -- checkpoint / resume -------------------------------------------------
    def save_checkpoint(self, path: str) -> str:
        """Snapshot the complete resumable state at a scan boundary: the
        device carry (state, covariance, clocks, voxel map) plus the
        host-side pieces — init-derived gravity scale, packetizer clocks,
        and any sensor events buffered past the last emitted scan.

        The reference cannot checkpoint (pointer octrees; SURVEY.md §5);
        this is an intentional capability extension."""
        from .io import checkpoint as ckpt

        self.flush()  # step count (len(results)) must include in-flight scans

        b = self.builder
        extras = {
            "g_over_acc_norm": np.asarray(self.params.g_over_acc_norm),
            "initialized": np.asarray(int(self.initialized)),
            "use_kin": np.asarray(int(b.use_kin)),
            "last_begin": np.asarray(
                np.nan if b._last_begin is None else b._last_begin
            ),
            "last_event_time": np.asarray(b._last_event_time),
            "last_scan_time": np.asarray(b._last_scan_time),
            # Auto-escalation state: escalation is STICKY by design (see
            # TpuConfig — releasing it lets drift re-accrue on a corrupted
            # map), so a resumed run must come back escalated, with its
            # warm-up and streak counters intact.
            "esc_active": np.asarray(int(self._esc_active)),
            "esc_latched": np.asarray(int(self._esc_latched)),
            "esc_streak": np.asarray(int(self._esc_streak)),
            "n_done": np.asarray(int(self._n_done)),
        }
        if b._events:
            evs = b._events
            extras["ev_time"] = np.asarray([e.time for e in evs])
            extras["ev_acc"] = np.stack([np.asarray(e.acc) for e in evs])
            extras["ev_gyr"] = np.stack([np.asarray(e.gyr) for e in evs])
            if b.use_kin:
                extras["ev_foot_pos"] = np.stack([e.foot_pos for e in evs])
                extras["ev_foot_vel"] = np.stack([e.foot_vel for e in evs])
                extras["ev_contact"] = np.stack([e.contact for e in evs])
        if b._scans:
            log.warning(
                "checkpoint taken with %d pending (incomplete) scans; "
                "they are not saved — re-feed them after resume",
                len(b._scans),
            )
        return ckpt.save(path, self.carry, step=len(self.results), extras=extras)

    def load_checkpoint(self, path: str) -> int:
        """Restore a save_checkpoint snapshot; returns the step count at
        save time.  Feed the sensor stream from the next scan onward."""
        from .io import checkpoint as ckpt
        from .io.dataset import ImuEvent, KinImuEvent

        carry, step, extras = ckpt.load(path, self.carry)
        self.carry = carry
        self.params = self.params._replace(
            g_over_acc_norm=jnp.asarray(
                float(extras["g_over_acc_norm"]), dtype=self.dtype
            )
        )
        self.initialized = bool(int(extras["initialized"]))
        b = self.builder
        if bool(int(extras["use_kin"])) != b.use_kin:
            raise ValueError("checkpoint kinematic mode != config mode")
        lb = float(extras["last_begin"])
        b._last_begin = None if np.isnan(lb) else lb
        b._last_scan_time = float(extras["last_scan_time"])
        events = []
        if "ev_time" in extras:
            for i, t in enumerate(extras["ev_time"]):
                if b.use_kin:
                    events.append(KinImuEvent(
                        time=float(t), acc=extras["ev_acc"][i],
                        gyr=extras["ev_gyr"][i],
                        foot_pos=extras["ev_foot_pos"][i],
                        foot_vel=extras["ev_foot_vel"][i],
                        contact=extras["ev_contact"][i],
                    ))
                else:
                    events.append(ImuEvent(
                        time=float(t), acc=extras["ev_acc"][i],
                        gyr=extras["ev_gyr"][i],
                    ))
        b._events = events
        b._last_event_time = float(extras["last_event_time"])
        if "esc_active" in extras:
            self._esc_active = bool(int(extras["esc_active"]))
            self._esc_latched = bool(int(extras["esc_latched"]))
            self._esc_streak = int(extras["esc_streak"])
            self._n_done = int(extras["n_done"])
            if self._esc_active and self._esc_enabled:
                self._scfg_active = self._scfg_esc
        return step or 0

    def _events_from_packet(self, pkt: HostPacket):
        m = pkt.imu_mask
        if not m.any():
            return None
        return pkt.imu_acc[m].mean(axis=0), pkt.imu_gyr[m].mean(axis=0)

    def _dispatch(self, pkt: HostPacket) -> None:
        """Upload + enqueue one scan step (async; does not sync on results).

        The Timer label matches the reference's (KILO.cc:367) but measures
        dispatch, not device time — with pipelining the device sync lands in
        the _materialize of a scan up to pipeline_depth steps later."""
        gap = float(self.cfg.tpu.gap_reset_s)
        if gap > 0.0 and pkt.rebase > gap:
            log.warning(
                "sensor-time gap %.1f s >= tpu_gap_reset_s=%.1f: soft reset "
                "(pose kept, velocity zeroed, clocks realigned, covariance "
                "inflated)", pkt.rebase, gap,
            )
            self.carry = soft_reset_carry(self.carry, pkt.rebase)
        dev = to_device_packet(pkt)
        with Timer.measure("State predict/update & Map update"):
            self.carry, out = self._step(
                self.carry, dev, self.params, self._scfg_active
            )
        self._inflight.append((pkt, out))

    def _materialize(self, pkt: HostPacket, out) -> ScanResult:
        out = jax.tree.map(np.asarray, out)
        if pkt.dropped_points or pkt.dropped_events:
            log.warning(
                "packet overflow: dropped %d points, %d events",
                pkt.dropped_points, pkt.dropped_events,
            )
        n_capped = int(out.n_cap_dropped) if out.n_cap_dropped is not None else 0
        if n_capped:
            log.warning(
                "cap overflow: %d valid points beyond match/insert cap "
                "(raise tpu_match_cap/tpu_insert_cap)", n_capped,
            )
        mo = out.map_overflow
        if mo is not None and (int(mo[0]) or int(mo[2])):
            log.warning(
                "map overflow: %d insert rows beyond insert_row_cap, "
                "%d slot claims failed (raise tpu_map_insert_row_cap / "
                "tpu_map_capacity_log2)", int(mo[0]), int(mo[2]),
            )
        # Sustained match-rate collapse = the divergence signature (state
        # too far from the map for the 3-sigma gate).  The reference logs
        # its per-scan "useful pcl percent" (ros_interface.cc:391-394)
        # but never alarms on it.
        self._n_done += 1
        if int(out.n_points) > 100:
            ratio = int(out.n_matched) / int(out.n_points)
            # Hard-collapse operator alarm (20%): the signature of a fully
            # diverged run.  Warm-up excluded (map still bootstrapping).
            if self._n_done > 10 and ratio < 0.2:
                self._low_match_streak += 1
                if self._low_match_streak == 5:
                    log.warning(
                        "match rate below 20%% for 5 consecutive scans — "
                        "the estimate may have diverged.  Check sensor "
                        "timing; under aggressive dynamics consider "
                        "tpu_pipeline: sequential or tpu_match_iters >= 2."
                    )
            elif self._n_done > 10:
                self._low_match_streak = 0
            # Auto-escalation (soft degradation, see TpuConfig): a rate
            # below escalate_ratio sustained escalate_after scans trips the
            # iterated-matching variant; a rate above ratio+0.1 sustained
            # deescalate_after scans releases it.  The warm-up here is
            # deliberately SHORT (3 scans): envelope-edge drift accrues from
            # the first scans and cannot be undone later — an early false
            # positive merely costs latency until de-escalation.
            if self._esc_enabled and self._n_done > 3:
                if not self._esc_active and ratio < self._esc_ratio:
                    self._esc_streak += 1
                    self._healthy_streak = 0
                    if self._esc_streak >= self._esc_after:
                        self._esc_active = True
                        self._scfg_active = self._scfg_esc
                        self._esc_streak = 0
                        if self._n_done - self._last_deesc <= 3 * self._deesc_after:
                            self._esc_latched = True
                        log.warning(
                            "match rate below %.0f%% for %d consecutive "
                            "scans: auto-escalating to tpu_match_iters=%d "
                            "(iterated matching)%s",
                            100 * self._esc_ratio, self._esc_after,
                            self._scfg_esc.match_iters,
                            " [latched: regime needs it]" if self._esc_latched
                            else " until the rate recovers",
                        )
                elif self._esc_active and ratio >= self._esc_ratio + 0.1:
                    self._healthy_streak += 1
                    if (
                        self._deesc_after > 0
                        and self._healthy_streak >= self._deesc_after
                        and not self._esc_latched
                    ):
                        self._esc_active = False
                        self._scfg_active = self.scfg
                        self._healthy_streak = 0
                        self._last_deesc = self._n_done
                        log.info(
                            "match rate recovered: de-escalating to "
                            "tpu_match_iters=%d", self.scfg.match_iters,
                        )
                else:
                    self._esc_streak = 0
                    self._healthy_streak = 0
        cloud = intensity = None
        if out.cloud_world is not None:
            # Compact to valid rows; intensity rides along in the same order
            # (the reference's registered world cloud is PointXYZINormal,
            # pcd_saver.hpp / lidar_processing.cc:46).
            m = (pkt.point_mask & pkt.bucket_mask[:, None]).reshape(-1)
            cloud = np.asarray(out.cloud_world).reshape(-1, 3)[m]
            if pkt.intensity is not None:
                intensity = pkt.intensity.reshape(-1)[m]
        return ScanResult(
            time=pkt.end_time,
            rot=out.rot,
            pos=out.pos,
            n_matched=int(out.n_matched),
            n_points=int(out.n_points),
            n_raw=pkt.n_raw,
            cloud_world=cloud,
            intensity=intensity,
        )


def run_offline(
    cfg: Config,
    scans: Sequence[RawScan],
    events: Sequence,
    return_cloud: bool = False,
    resume: Optional[str] = None,
    save_ckpt: Optional[str] = None,
    chunk: int = 0,
) -> List[ScanResult]:
    """Replay pre-loaded streams through the filter (dataset/sim replay).

    ``resume`` restores a checkpoint before replay (feed only scans/events
    after the checkpointed scan; buffered in-between events are restored
    from the checkpoint itself); ``save_ckpt`` snapshots at stream end.

    ``chunk`` > 1 replays in offline-throughput mode: all packets are
    staged first, then rolled ``chunk`` scans per dispatch through
    ``process_scan_chunk`` (bit-identical to per-scan stepping; amortizes
    the host dispatch floor — docs/PERF_NOTES.md "Round-2 rig").  World
    clouds are not returned in chunked mode (``return_cloud`` must be
    False: a chunk would hold K full clouds on device)."""
    if chunk > 1:
        if return_cloud:
            raise ValueError("chunked replay does not support return_cloud")
        return _run_offline_chunked(cfg, scans, events, chunk, resume, save_ckpt)
    runner = OdometryRunner(cfg, return_cloud=return_cloud)
    if resume:
        step = runner.load_checkpoint(resume)
        log.info("Resumed from %s at step %d", resume, step)
    use_kin = not cfg.only_imu_use
    ev_iter = iter(sorted(events, key=lambda e: e.time))
    pending = next(ev_iter, None)
    for scan in scans:
        # Feed events up to (and past) the scan end, then the scan — the
        # packetizer enforces the lock-step sync itself.
        while pending is not None and pending.time <= scan.end_time + 0.5:
            if use_kin:
                runner.add_kin_imu(pending)
            else:
                runner.add_imu(pending)
            pending = next(ev_iter, None)
        runner.add_scan(scan)
        runner._drain()
    runner.flush()
    if save_ckpt:
        path = runner.save_checkpoint(save_ckpt)
        log.info("Saved checkpoint to %s", path)
    return runner.results


def _run_offline_chunked(
    cfg: Config,
    scans: Sequence[RawScan],
    events: Sequence,
    chunk: int,
    resume: Optional[str],
    save_ckpt: Optional[str],
) -> List[ScanResult]:
    """Stage every packet, then replay ``chunk`` scans per device dispatch."""
    from .core.filter import process_scan_chunk, stack_scan_packets

    runner = OdometryRunner(cfg)
    if resume:
        step0 = runner.load_checkpoint(resume)
        log.info("Resumed from %s at step %d", resume, step0)
    use_kin = not cfg.only_imu_use
    b = runner.builder
    ev_iter = iter(sorted(events, key=lambda e: e.time))
    pending = next(ev_iter, None)
    staged = []  # (first RawScan of packet, HostPacket)
    for scan in scans:
        while pending is not None and pending.time <= scan.end_time + 0.5:
            if use_kin:
                b.add_kin_imu(pending)
            else:
                b.add_imu(pending)
            pending = next(ev_iter, None)
        b.add_scan(scan)
        while b.ready():
            raw = b._scans[0]
            pkt = b.pop()
            if pkt is not None:
                staged.append((raw, pkt))
    results: List[ScanResult] = []
    i0 = 0
    # Mirror _drain's retry: an event-less first packet leaves the runner
    # uninitialized, so keep trying subsequent packets until init succeeds
    # (otherwise every scan would filter against an uninitialized carry).
    while not runner.initialized and i0 < len(staged):
        raw0, pkt0 = staged[i0]
        runner._initialize(raw0, pkt0)
        results.append(
            ScanResult(
                time=pkt0.end_time,
                rot=np.asarray(runner.carry.state.rot),
                pos=np.asarray(runner.carry.state.pos),
                n_matched=0,
                n_points=0,
                n_raw=pkt0.n_raw,
            )
        )
        i0 += 1
    step_chunk = jax.jit(process_scan_chunk, static_argnums=3)
    gap = float(cfg.tpu.gap_reset_s)

    def _is_gap(pkt: HostPacket) -> bool:
        return gap > 0.0 and pkt.rebase > gap

    idx = i0
    while idx < len(staged):
        # Same soft-reset policy as the streaming path (_dispatch): a
        # sensor-time gap above tpu_gap_reset_s must not be mean-propagated.
        # Chunks are split at gap packets so the reset lands between
        # dispatches, preserving trajectory equivalence with streaming replay.
        if _is_gap(staged[idx][1]):
            log.warning(
                "sensor-time gap %.1f s >= tpu_gap_reset_s=%.1f: soft reset "
                "(chunked replay)", staged[idx][1].rebase, gap,
            )
            runner.carry = soft_reset_carry(runner.carry, staged[idx][1].rebase)
        end = idx + 1
        while end < min(idx + chunk, len(staged)) and not _is_gap(staged[end][1]):
            end += 1
        grp = staged[idx:end]
        idx += len(grp)
        devs = [to_device_packet(p) for _, p in grp]
        if len(devs) == chunk:
            runner.carry, outs = step_chunk(
                runner.carry, stack_scan_packets(devs),
                runner.params, runner.scfg,
            )
            outs = jax.tree.map(np.asarray, outs)
            per_scan = [jax.tree.map(lambda a, j=j: a[j], outs)
                        for j in range(chunk)]
        else:  # ragged tail: per-scan steps (same semantics)
            per_scan = []
            for dv in devs:
                runner.carry, out = runner._step(
                    runner.carry, dv, runner.params, runner.scfg
                )
                per_scan.append(jax.tree.map(np.asarray, out))
        for (_, hp), out in zip(grp, per_scan):
            results.append(
                ScanResult(
                    time=hp.end_time,
                    rot=out.rot,
                    pos=out.pos,
                    n_matched=int(out.n_matched),
                    n_points=int(out.n_points),
                    n_raw=hp.n_raw,
                )
            )
            if hp.dropped_points or hp.dropped_events:
                log.warning(
                    "packet overflow: dropped %d points, %d events",
                    hp.dropped_points, hp.dropped_events,
                )
            if out.n_cap_dropped is not None and int(out.n_cap_dropped):
                log.warning(
                    "cap overflow: %d valid points beyond match/insert cap",
                    int(out.n_cap_dropped),
                )
            mo = out.map_overflow
            if mo is not None and (int(mo[0]) or int(mo[2])):
                log.warning(
                    "map overflow: %d insert rows beyond insert_row_cap, "
                    "%d slot claims failed", int(mo[0]), int(mo[2]),
                )
    runner.results = results
    if save_ckpt:
        path = runner.save_checkpoint(save_ckpt)
        log.info("Saved checkpoint to %s", path)
    return results
