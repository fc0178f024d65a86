"""Per-scan filter rollout: the KILO orchestrator as a single jitted scan.

Capability parity with /root/reference/legkilo/src/core/slam/KILO.cc
re-designed for XLA's compilation model:

* The reference walks variable-length 2 ms time-buckets with interleaved
  IMU/kinematic events in host C++ (KILO.cc:373-395).  Here a scan is
  preprocessed host-side (io/dataset.py) into a fixed-shape ``ScanPacket``
  — [n_buckets, pts_per_bucket] padded points plus up to ``kmax`` masked
  IMU/kin event slots per bucket — and the whole predict/update/map-update
  chain runs as one ``jax.lax.scan`` over buckets inside jit.  Masked slots
  are exact no-ops (dt = 0 propagation, zero-gain updates), so the rollout
  is fully regular and vmap-able over Monte-Carlo replicas.
* Dual-clock bookkeeping matches KILO.cc:110-115: the covariance propagates
  from the last *update* time while the mean propagates from the last
  *predict* time; both are carried as device scalars relative to the scan
  begin and rebased between scans.
* Per-bucket LiDAR update follows predictUpdatePoint (KILO.cc:108-233):
  body->imu->world transform, sensor-noise + state covariance propagation
  per point, voxel plane match, information-form batched ESKF update, world
  recompute with the updated state, then map insertion.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import eskf
from .eskf import NoiseParams
from .plane_fit import calc_body_cov
from .so3 import skew
from .state import DIM_STATE, State, make_state
from .voxel_map import MapConfig, VoxelMap, insert_points, make_map, match_points, slide_map


class ScanPacket(NamedTuple):
    """One preprocessed LiDAR scan + interleaved IMU/kin events.

    All times are seconds relative to the scan begin time.  ``rebase`` is
    (this scan's begin - previous scan's begin), used to rebase the carried
    clocks.  Shapes: NB = buckets, P = points/bucket, K = events/bucket.
    """

    rebase: jnp.ndarray        # [] f32
    end_offset: jnp.ndarray    # [] f32 (lidar_end_time - begin)
    bucket_time: jnp.ndarray   # [NB] f32
    bucket_mask: jnp.ndarray   # [NB] bool
    points: jnp.ndarray        # [NB, P, 3] body-frame points
    point_mask: jnp.ndarray    # [NB, P] bool
    imu_time: jnp.ndarray      # [NB, K] f32
    imu_mask: jnp.ndarray      # [NB, K] bool
    imu_acc: jnp.ndarray       # [NB, K, 3]
    imu_gyr: jnp.ndarray       # [NB, K, 3]
    foot_pos: jnp.ndarray      # [NB, K, 4, 3] (zeros in IMU-only mode)
    foot_vel: jnp.ndarray      # [NB, K, 4, 3]
    contact: jnp.ndarray       # [NB, K, 4] bool


class FilterParams(NamedTuple):
    """Device-side runtime parameters."""

    noise: NoiseParams
    ext_r: jnp.ndarray         # [3, 3] IMU <- LiDAR rotation
    ext_t: jnp.ndarray         # [3]
    g_over_acc_norm: jnp.ndarray  # [] gravity / |mean_acc|


class StaticConfig(NamedTuple):
    """Trace-time configuration (hashable)."""

    map_cfg: MapConfig
    use_kin: bool
    dept_err: float
    beam_err: float
    map_sliding_en: bool = False
    sliding_thresh: float = 8.0
    half_map_size: int = 100
    return_cloud: bool = False
    # "sequential": reference-faithful per-bucket rollout (lax.scan).
    # "deferred": batched match / deferred insert pipeline built for
    #             high-kernel-overhead targets (see filter_deferred.py).
    pipeline: str = "sequential"
    use_pallas: bool = False  # deferred mode: fuse the ESKF chain in Pallas
    # Deferred mode: compact valid points to this many rows before the map
    # insert (0 = no compaction).  Bucket padding is typically ~50% of
    # NB x P; inserting a mask-compacted subset is order-free and exact as
    # long as the cap covers every valid point (overflow points are dropped
    # from the map for that scan only).
    insert_cap: int = 0
    # Deferred mode: same compaction for the match phase — the variance
    # einsums and the voxel-map probe run on match_cap rows instead of the
    # full NB x P padding, and the per-row results are scattered back to
    # bucket layout for the chain (0 = no compaction).
    match_cap: int = 0
    # Deferred mode chain implementation:
    #   "jax":   direct lax.scan over eskf.py ops (dot kernels per bucket).
    #   "fused": all-elementwise chain (eskf_fused.py) — per-bucket point
    #            reductions hoisted into one batched sufficient-statistics
    #            matmul, every small product unrolled so XLA fuses the
    #            bucket step into a handful of kernels.
    chain_impl: str = "fused"
    # lax.scan unroll factor for the chain (1 = no unrolling).  With the
    # fused chain the body is elementwise, so unrolling lets XLA fuse
    # across buckets too.
    chain_unroll: int = 1
    # Fused pipeline: reuse the match phase's hash-table probe for map
    # insertion (voxel assignment at predicted-pose keys — see
    # voxel_map.insert_points_hinted and docs/PARITY.md deviations).
    insert_reuse_probe: bool = True
    # Fused pipeline: run the match phase's per-point math in two Pallas
    # kernels (ops/pallas/match_geom.py); requires match_cap % 128 == 0.
    use_pallas_match: bool = False
    # Fused pipeline: fold the insert phase's per-row pose recompute,
    # covariance propagation, and packed-moment construction into one
    # Pallas launch (ops/pallas/insert_rows.py).  Requires
    # insert_reuse_probe and map_cfg.insert_row_cap % 128 == 0.
    use_pallas_insert: bool = False
    # Deferred mode: run the IMU match-pose propagation in one Pallas
    # launch (ops/pallas/pose_prop.py) instead of XLA associative scans.
    use_pallas_pose: bool = False
    # Re-symmetrize the covariance once per scan: the ~50 Joseph-free
    # downdates per scan (eskf.cc:91-145) accumulate f32 asymmetry over
    # long runs (tools/longrun_stability.py measurements in PERF_NOTES).
    symmetrize_cov: bool = True
    # Deferred mode: per-bucket match-pose prediction.
    #   "imu":       propagate the scan's own IMU events from the
    #                scan-start state (batched associative_scan — tracks
    #                aggressive gait attitude; the default).
    #   "const_vel": constant-velocity/constant-rate extrapolation (the
    #                round-1..3 behavior; degrades under >0.1 rad gait
    #                oscillation, tests/test_dynamics_envelope.py).
    match_pose: str = "imu"
    # Deferred mode: matching passes per scan.  1 = match once at the
    # predicted poses (fastest).  2 = re-match at the first chain pass's
    # post-update per-bucket poses and re-run the chain from the scan-
    # start state (an iterated-EKF outer loop, still fully batched) —
    # recovers the sequential pipeline's within-scan feedback quality at
    # the dynamics-envelope edge (>=0.3 rad gait at 4 Hz), where one-pass
    # association degrades; see tests/test_dynamics_envelope.py.
    match_iters: int = 1


class FilterCarry(NamedTuple):
    """State carried across scans (and across buckets within a scan)."""

    state: State
    cov: jnp.ndarray           # [30, 30]
    last_predict_t: jnp.ndarray  # [] f32, relative to current scan begin
    last_update_t: jnp.ndarray   # [] f32
    vm: VoxelMap
    last_slide_pos: jnp.ndarray  # [3]


class ScanOutput(NamedTuple):
    rot: jnp.ndarray           # [3, 3] pose at scan end
    pos: jnp.ndarray           # [3]
    n_matched: jnp.ndarray     # [] int32  (success_pts_size analog)
    n_points: jnp.ndarray      # [] int32  (downsampled count)
    cloud_world: Optional[jnp.ndarray]  # [NB, P, 3] or None
    # Overflow visibility (the reference has no fixed caps; ours must not
    # drop silently): valid points beyond the deferred pipeline's
    # match/insert compaction caps this scan, and the per-scan delta of the
    # voxel map's [rowcap, refit-deferred, claim-failed] counters.
    n_cap_dropped: Optional[jnp.ndarray] = None   # [] int32
    map_overflow: Optional[jnp.ndarray] = None    # [3] int32


def init_carry(scfg: StaticConfig, dtype=jnp.float32) -> FilterCarry:
    return FilterCarry(
        state=make_state(dtype=dtype),
        cov=jnp.eye(30, dtype=dtype) * 1e-6,
        last_predict_t=jnp.zeros((), dtype=dtype),
        last_update_t=jnp.zeros((), dtype=dtype),
        vm=make_map(scfg.map_cfg, dtype=dtype),
        last_slide_pos=jnp.zeros((3,), dtype=dtype),
    )


def init_state_from_imu(
    carry: FilterCarry,
    mean_acc: jnp.ndarray,
    mean_gyr: jnp.ndarray,
    gravity: float,
    end_offset: jnp.ndarray,
) -> Tuple[FilterCarry, jnp.ndarray]:
    """First-frame state initialization (StateInitial, state_initial.hpp:30-118).

    grav = -mean_acc/|mean_acc| * g, bw = mean_gyr, rot = I, cov = 1e-6 I.
    Returns the updated carry and acc_norm (callers build g/acc_norm).
    """
    dtype = carry.cov.dtype
    acc_norm = jnp.linalg.norm(mean_acc)
    st = make_state(dtype=dtype)
    lin = st.lin
    grav = -mean_acc / acc_norm * gravity
    lin = lin.at[12:15].set(grav)                             # grav
    lin = lin.at[9:12].set(mean_gyr)                          # bw
    # Latch the rest-consistent specific force so the model does not
    # free-fall while the first IMU updates converge: at rest
    # vel' = R imu_a + grav = 0 requires imu_a = -grav (rot = I).  The
    # reference leaves imu_a at zero and rides out the transient
    # (state_initial.hpp:62-71); initializing consistently removes the
    # early-trajectory dip for both pipelines.
    lin = lin.at[15:18].set(-grav)                            # imu_a
    st = State(rot=st.rot, lin=lin)
    return (
        carry._replace(
            state=st,
            cov=jnp.eye(30, dtype=dtype) * 1e-6,
            last_predict_t=end_offset.astype(dtype),
            last_update_t=end_offset.astype(dtype),
        ),
        acc_norm,
    )


def first_frame_map(
    carry: FilterCarry,
    scfg: StaticConfig,
    params: FilterParams,
    points_body: jnp.ndarray,  # [N, 3] raw (undownsampled) scan
    mask: jnp.ndarray,         # [N]
) -> FilterCarry:
    """Build the initial voxel map from the first raw scan.

    Parity: BuildVoxelMap (voxel_map.cc:287-334) including its variance
    formula: var = (R extR) C (R extR)^T + (-[p_b]x) RotCov (-[p_b]x)^T
    + PosCov (note: crossmat of the *body* point, without R — the reference's
    first-frame path differs from the per-bucket path this way).
    """
    st, cov = carry.state, carry.cov
    p_i = points_body @ params.ext_r.T + params.ext_t
    p_w = p_i @ st.rot.T + st.pos
    body_cov = calc_body_cov(points_body, scfg.dept_err, scfg.beam_err)
    rot_ext = st.rot @ params.ext_r
    crossmat = skew(points_body)
    rot_cov = cov[0:3, 0:3]
    pos_cov = cov[3:6, 3:6]
    var = (
        jnp.einsum("ij,njk,lk->nil", rot_ext, body_cov, rot_ext)
        + jnp.einsum("nij,jk,nlk->nil", -crossmat, rot_cov, -crossmat)
        + pos_cov
    )
    vm = insert_points(carry.vm, scfg.map_cfg, p_w, var, mask)
    return carry._replace(vm=vm)


def _point_vars(st: State, cov, params, scfg, p_b):
    """World positions + propagated per-point covariance (KILO.cc:122-140)."""
    p_i = p_b @ params.ext_r.T + params.ext_t
    p_w = p_i @ st.rot.T + st.pos
    body_cov = calc_body_cov(p_b, scfg.dept_err, scfg.beam_err)
    crossmat = skew(p_i)
    rot_ext = st.rot @ params.ext_r
    rot_cross = jnp.einsum("ij,njk->nik", st.rot, crossmat)
    var = (
        jnp.einsum("ij,njk,lk->nil", rot_ext, body_cov, rot_ext)
        + jnp.einsum("nij,jk,nlk->nil", rot_cross, cov[0:3, 0:3], rot_cross)
        + cov[3:6, 3:6]
    )
    return p_i, p_w, body_cov, crossmat, var


def _imu_kin_event(carry: FilterCarry, params: FilterParams, scfg: StaticConfig,
                   t, gate, acc, gyr, foot_pos, foot_vel, contact):
    """One (possibly masked) IMU or kinematic event
    (predictUpdateImu / predictUpdateKinImu, KILO.cc:235-314)."""
    st, cov = carry.state, carry.cov
    gatef = gate.astype(cov.dtype)
    dt_cov = (t - carry.last_update_t) * gatef
    dt = (t - carry.last_predict_t) * gatef
    st, cov = eskf.predict(st, cov, params.noise.q_diag, dt, dt_cov)

    if scfg.use_kin:
        h, z, r, _ = eskf.build_kin_obs(
            st, acc, gyr, foot_pos, foot_vel, contact, params.noise,
            params.g_over_acc_norm,
        )
        st, cov = eskf.update_by_kin_imu(st, cov, h, z, r, gate=gatef)
    else:
        z6 = eskf.imu_innovation(st, acc, gyr, params.g_over_acc_norm)
        st, cov = eskf.update_by_imu(st, cov, z6, params.noise.imu_meas_r, gate=gatef)

    return carry._replace(
        state=st,
        cov=cov,
        last_predict_t=jnp.where(gate, t, carry.last_predict_t),
        last_update_t=jnp.where(gate, t, carry.last_update_t),
    )


def _point_bucket(carry: FilterCarry, params: FilterParams, scfg: StaticConfig,
                  t, gate, p_b, pmask):
    """One (possibly masked) LiDAR time-bucket (predictUpdatePoint,
    KILO.cc:108-233)."""
    cfg = scfg.map_cfg
    gatef = gate.astype(carry.cov.dtype)
    dt_cov = (t - carry.last_update_t) * gatef
    dt = (t - carry.last_predict_t) * gatef
    st, cov = eskf.predict(carry.state, carry.cov, params.noise.q_diag, dt, dt_cov)
    last_predict_t = jnp.where(gate, t, carry.last_predict_t)

    pmask = pmask & gate
    p_i, p_w, body_cov, crossmat, var = _point_vars(st, cov, params, scfg, p_b)
    m = match_points(carry.vm, cfg, p_w, var, pmask)

    # Observation rows (KILO.cc:190-210).
    rt_n = m.normal @ st.rot                     # R^T n  (row-vector form)
    cr_u = jnp.einsum("nij,nj->ni", crossmat, rt_n)
    h6 = jnp.concatenate([cr_u, m.normal], axis=-1)          # [P, 6]
    z = -m.signed_dist
    j_nq = jnp.concatenate([p_w - m.center, -m.normal], axis=-1)
    # PSD clamp: reduced-precision plane_var storage can yield a slightly
    # negative quadratic form; a negative R row would corrupt the update.
    single_l = jnp.maximum(
        jnp.einsum("ni,nij,nj->n", j_nq, m.plane_var, j_nq), 0.0
    )
    rot_ext = st.rot @ params.ext_r
    var_bw = jnp.einsum("ij,njk,lk->nil", rot_ext, body_cov, rot_ext)
    r = params.noise.lidar_point_meas_ratio * (
        single_l + jnp.einsum("ni,nij,nj->n", m.normal, var_bw, m.normal)
    )

    st2, cov2 = eskf.update_by_points(st, cov, h6, z, r, m.matched)
    did_update = jnp.any(m.matched)
    # (update_by_points is an exact no-op with zero matched rows, but keep the
    # explicit select so last_update_t bookkeeping matches KILO.cc:211-213.)
    st = jax.tree.map(lambda a, b: jnp.where(did_update, a, b), st2, State(st.rot, st.lin))
    cov = jnp.where(did_update, cov2, cov)
    last_update_t = jnp.where(gate & did_update, t, carry.last_update_t)

    # Recompute world coords + vars with the updated state before map insert
    # (KILO.cc:216-231; only when an update happened).
    _, p_w2, _, _, var2 = _point_vars(st, cov, params, scfg, p_b)
    p_w_final = jnp.where(did_update, p_w2, p_w)
    var_final = jnp.where(did_update, var2, var)
    vm = insert_points(carry.vm, cfg, p_w_final, var_final, pmask)

    n_matched = jnp.sum(m.matched.astype(jnp.int32))
    n_processed = jnp.sum(pmask.astype(jnp.int32))
    return (
        carry._replace(
            state=st, cov=cov,
            last_predict_t=last_predict_t, last_update_t=last_update_t,
            vm=vm,
        ),
        n_matched,
        n_processed,
        p_w_final,
    )


def process_scan(
    carry: FilterCarry,
    packet: ScanPacket,
    params: FilterParams,
    scfg: StaticConfig,
) -> Tuple[FilterCarry, ScanOutput]:
    """Run the full predict/update/map-update chain for one scan.

    Pure function of (carry, packet, params); jit with scfg static:

        step = jax.jit(process_scan, static_argnums=3)
    """
    kmax = packet.imu_time.shape[1]
    ocnt0 = carry.vm.ocnt

    # Rebase carried clocks to this scan's begin time.
    carry = carry._replace(
        last_predict_t=carry.last_predict_t - packet.rebase,
        last_update_t=carry.last_update_t - packet.rebase,
    )

    def bucket_step(c: FilterCarry, inp):
        (bt, bmask, pts, pmask, it, imask, acc, gyr, fp, fv, ct) = inp
        for k in range(kmax):
            c = _imu_kin_event(
                c, params, scfg, it[k], imask[k], acc[k], gyr[k],
                fp[k], fv[k], ct[k],
            )
        c, n_matched, n_proc, p_w = _point_bucket(
            c, params, scfg, bt, bmask, pts, pmask
        )
        out = (n_matched, n_proc, p_w) if scfg.return_cloud else (n_matched, n_proc)
        return c, out

    xs = (
        packet.bucket_time, packet.bucket_mask, packet.points, packet.point_mask,
        packet.imu_time, packet.imu_mask, packet.imu_acc, packet.imu_gyr,
        packet.foot_pos, packet.foot_vel, packet.contact,
    )
    carry, outs = jax.lax.scan(bucket_step, carry, xs)
    n_matched = jnp.sum(outs[0])
    n_processed = jnp.sum(outs[1])
    cloud = outs[2] if scfg.return_cloud else None

    # Local-map sliding (mapSliding, voxel_map.cc:552-571).
    if scfg.map_sliding_en:
        moved = jnp.linalg.norm(carry.state.pos - carry.last_slide_pos)
        trigger = moved >= scfg.sliding_thresh
        vm_slid = slide_map(
            carry.vm, scfg.map_cfg, carry.state.pos, scfg.half_map_size
        )
        vm = jax.tree.map(
            lambda a, b: jnp.where(
                trigger.reshape((1,) * a.ndim), a, b
            ), vm_slid, carry.vm,
        )
        carry = carry._replace(
            vm=vm,
            last_slide_pos=jnp.where(trigger, carry.state.pos, carry.last_slide_pos),
        )

    carry = maybe_symmetrize_cov(carry, scfg)
    # Measured, not constructed (round-3 review): valid points minus
    # points the bucket loop actually consumed.  Zero today because the
    # sequential path has no compaction caps; a future cap that trims
    # pmask would surface here instead of hiding.
    n_valid = jnp.sum(
        (packet.point_mask & packet.bucket_mask[:, None]).astype(jnp.int32)
    )
    out = ScanOutput(
        rot=carry.state.rot,
        pos=carry.state.pos,
        n_matched=n_matched,
        n_points=jnp.sum(packet.point_mask.astype(jnp.int32)),
        cloud_world=cloud,
        n_cap_dropped=n_valid - n_processed,
        map_overflow=carry.vm.ocnt - ocnt0,
    )
    return carry, out


def soft_reset_carry(
    carry: FilterCarry, rebase: float, cov_diag: float = 1e-4
) -> FilterCarry:
    """Recover from a large sensor-time gap (elastic-recovery policy the
    reference lacks — it would mean-propagate the whole gap with latched
    imu_a/imu_w and diverge, KILO.cc:110-115 clocks + eskf.cc:64-70).

    Keeps pose, gravity, and biases; zeroes velocity and the latched body
    rates (imu_a to the rest-consistent -R^T grav), realigns the carried
    clocks so the next packet's rebase lands them at its begin time, and
    inflates the covariance so matching re-anchors.  If the gap was a
    pure wall-clock splice (bag concatenation) the pose is still valid
    and the filter recovers immediately; if the robot really moved,
    odometry restarts from the last known pose — the best any system can
    do without a relocalizer."""
    from .state import BV, IMU_A, IMU_W, VEL

    st = carry.state
    dtype = carry.cov.dtype
    lin = st.lin.at[VEL].set(0.0)
    lin = lin.at[IMU_W].set(0.0)
    lin = lin.at[BV].set(0.0)
    rest_a = -jnp.swapaxes(st.rot, -1, -2) @ st.grav
    lin = lin.at[IMU_A].set(rest_a)
    return carry._replace(
        state=State(rot=st.rot, lin=lin),
        cov=jnp.eye(DIM_STATE, dtype=dtype) * cov_diag,
        last_predict_t=jnp.asarray(rebase, dtype=dtype),
        last_update_t=jnp.asarray(rebase, dtype=dtype),
    )


def maybe_symmetrize_cov(carry: FilterCarry, scfg: StaticConfig) -> FilterCarry:
    """Per-scan covariance re-symmetrization (SURVEY.md §7 hard-parts plan).

    The reference runs in float64 where the ~50 Joseph-free downdates per
    scan (eskf.cc:104,112,134,144) stay symmetric to ~1e-12; in f32 the
    asymmetry drifts measurably over minutes (tools/longrun_stability.py).
    P <- (P+P^T)/2 once per scan keeps it bounded at no measurable cost."""
    if not scfg.symmetrize_cov:
        return carry
    cov = carry.cov
    return carry._replace(cov=0.5 * (cov + jnp.swapaxes(cov, -1, -2)))


def process_scan_any(
    carry: FilterCarry,
    packet: ScanPacket,
    params: FilterParams,
    scfg: StaticConfig,
) -> Tuple[FilterCarry, ScanOutput]:
    """Dispatch on ``scfg.pipeline`` — the single entry point callers (and
    the fleet vmap) should use so a config flips between the
    reference-faithful rollout and the deferred fast path."""
    if scfg.pipeline == "deferred":
        from .filter_deferred import process_scan_deferred

        return process_scan_deferred(carry, packet, params, scfg)
    return process_scan(carry, packet, params, scfg)


def stack_scan_packets(packets) -> ScanPacket:
    """Stack per-scan packets into one [K, ...] chunk pytree (all packets
    in a chunk must share the static padded shapes, which PacketBuilder
    guarantees for a fixed config)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *packets)


def process_scan_chunk(
    carry: FilterCarry,
    packets: ScanPacket,  # [K, ...] stacked chunk (stack_scan_packets)
    params: FilterParams,
    scfg: StaticConfig,
) -> Tuple[FilterCarry, ScanOutput]:
    """Offline-replay fast path: roll ``process_scan_any`` over a chunk of
    pre-staged packets inside ONE dispatch (lax.scan over scans).

    Streaming replay pays one host dispatch per scan; once the device
    executes a scan program faster than the host can enqueue it
    (docs/PERF_NOTES.md "Round-2 rig"), replay throughput is dispatch-bound.
    Chunking amortizes that floor across K scans.  Semantics are identical
    to K sequential ``process_scan_any`` calls (the scan carry is the full
    filter carry, map included); outputs come back stacked [K, ...].
    """

    def body(c, pkt):
        return process_scan_any(c, pkt, params, scfg)

    return jax.lax.scan(body, carry, packets)
