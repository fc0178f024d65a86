"""Deferred-pipeline scan processing: batched match, fused chain, late insert.

The reference-faithful rollout (filter.py) interleaves map lookups and map
insertion inside the sequential per-bucket loop, exactly like
KILO.cc:373-395.  On accelerators where every kernel launch in a sequential
loop carries a fixed overhead, that structure is latency-bound: ~100 kernels
x 56 buckets dominates wall clock regardless of FLOPs.

This pipeline restructures the same computation into three phases:

1. **Batched association** (once per scan): per-bucket poses are predicted
   with a constant-velocity/constant-rate model from the scan-start state,
   all NB x P points are transformed, given sensor+state covariances, and
   matched against the voxel map in one vectorized pass.  The only
   deviation from the reference is that plane *selection* and the
   measurement variance use these predicted poses instead of the
   just-updated per-bucket state — a millimetre-level pose difference that
   leaves voxel/plane selection essentially unchanged (validated by the
   golden-sequence ATE tests).
2. **Sequential ESKF chain**: the exact per-bucket predict / IMU / kin /
   point-update recursion of the reference (same dual clocks, same gain
   algebra, h and z re-evaluated from the *current* in-chain state like
   KILO.cc:190-210), over pre-matched planes.  Runs either as a lax.scan
   or (fused pipeline) as ONE Pallas kernel over per-bucket sufficient
   statistics (ops/pallas/chain_stats.py).
3. **Deferred map insertion** (once per scan): world points are recomputed
   with each bucket's post-update pose and inserted in a single batched
   call.  The reference inserts after every bucket; deferring to scan end
   only affects matches of later buckets in the *same* scan against points
   of earlier buckets — relevant only in freshly-explored space.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import eskf
from .filter import (
    FilterCarry,
    FilterParams,
    ScanOutput,
    ScanPacket,
    StaticConfig,
    maybe_symmetrize_cov,
)
from .plane_fit import calc_body_cov
from .so3 import exp_so3, skew
from .voxel_map import (
    compact_order as _compact_order,
    insert_points,
    insert_points_hinted,
    match_points,
    slide_map,
)


def _gather(x, order, fill=0.0):
    return x.at[order].get(mode="fill", fill_value=fill)


def _predicted_bucket_poses_const_vel(carry, packet):
    """Constant-velocity/rate per-bucket pose prediction (matching only)."""
    st0 = carry.state
    dtb = packet.bucket_time                               # [NB]
    rb = st0.rot @ exp_so3(dtb[:, None] * st0.imu_w[None, :])  # [NB,3,3]
    pb = st0.pos[None, :] + dtb[:, None] * st0.vel[None, :]    # [NB,3]
    return rb, pb


def _predicted_bucket_poses_imu(carry, packet, params):
    """IMU-event-propagated per-bucket match poses (matching only).

    Integrates the packet's own IMU stream from the scan-start state
    through the interleaved event/bucket timeline — the same
    zero-order-hold mean propagation the sequential chain performs
    (KILO.cc:373-395, eskf.cc:64-70) with the latched body rates
    replaced by their innovation-free post-update values
    (imu_w -> gyr - bw, imu_a -> (g/|a|) acc - ba) after each event, so
    the poses need no sequential filter feedback.  Every cumulative
    structure is parallel: one associative_scan of 3x3 delta rotations
    plus two cumsums over the ~NBx(K+1) flat timeline.

    Under aggressive gait (attitude oscillation at 2.5-4 Hz, sharp yaw)
    the constant-rate extrapolation above mispredicts late-scan bucket
    attitudes by several degrees, which degrades plane selection; this
    variant tracks the measured rates instead (see
    tests/test_dynamics_envelope.py and docs/PARITY.md).
    """
    st0 = carry.state
    dtype = carry.cov.dtype
    nb, kmax = packet.imu_time.shape

    # Flat timeline per bucket: K event slots then the bucket time — the
    # exact order the sequential chain consumes them.
    t_all = jnp.concatenate(
        [packet.imu_time, packet.bucket_time[:, None]], axis=1
    ).reshape(-1)                                          # [M]
    gate = jnp.concatenate(
        [packet.imu_mask, packet.bucket_mask[:, None]], axis=1
    ).reshape(-1)
    is_ev = jnp.concatenate(
        [packet.imu_mask, jnp.zeros((nb, 1), bool)], axis=1
    ).reshape(-1)
    m = t_all.shape[0]

    zpad = jnp.zeros((nb, 1, 3), dtype)
    w_meas = (
        jnp.concatenate([packet.imu_gyr, zpad], axis=1).reshape(m, 3) - st0.bw
    )
    a_meas = (
        params.g_over_acc_norm
        * jnp.concatenate([packet.imu_acc, zpad], axis=1).reshape(m, 3)
        - st0.ba
    )

    # Segment j (ending at timeline slot j) propagates with the rates held
    # from the last valid EVENT strictly before j; before any event, with
    # the carried latched values (the chain's imu_w/imu_a at scan start).
    idx = jnp.where(is_ev, jnp.arange(m, dtype=jnp.int32), -1)
    last_ev = jax.lax.cummax(idx)
    prev_ev = jnp.concatenate([jnp.full((1,), -1, last_ev.dtype), last_ev[:-1]])
    has = (prev_ev >= 0)[:, None]
    w_seg = jnp.where(has, w_meas.at[prev_ev].get(mode="clip"), st0.imu_w)
    a_seg = jnp.where(has, a_meas.at[prev_ev].get(mode="clip"), st0.imu_a)

    # Per-segment dt replicating the chain's last-predict clock: masked
    # slots contribute dt = 0 (exact no-ops), valid slots measure from the
    # previous valid time (or the carried last_predict_t).
    lp = carry.last_predict_t.astype(dtype)
    tv = jnp.where(gate, t_all, -jnp.inf)
    t_end = jnp.maximum(jax.lax.cummax(tv), lp)
    t_start = jnp.concatenate([lp[None], t_end[:-1]])
    dt = jnp.where(gate, t_all - t_start, 0.0)

    # rot: cumulative product of per-segment delta rotations (masked ->
    # identity); vel/pos: the same first-order recursion as predict_mean
    # (transition_f evaluates at the segment-start state).
    d_r = exp_so3(w_seg * dt[:, None])                     # [M,3,3]
    prefix = jax.lax.associative_scan(jnp.matmul, d_r)
    r_end = jnp.einsum("ij,mjk->mik", st0.rot, prefix)
    r_start = jnp.concatenate([st0.rot[None], r_end[:-1]], axis=0)
    dv = dt[:, None] * (
        jnp.einsum("mij,mj->mi", r_start, a_seg) + st0.grav
    )
    v_end = st0.vel + jnp.cumsum(dv, axis=0)
    v_start = jnp.concatenate([st0.vel[None], v_end[:-1]], axis=0)
    p_end = st0.pos + jnp.cumsum(dt[:, None] * v_start, axis=0)

    sel = (jnp.arange(nb) + 1) * (kmax + 1) - 1            # bucket slots
    return r_end[sel], p_end[sel]


def _predicted_bucket_poses_imu_pallas(carry, packet, params):
    """_predicted_bucket_poses_imu in ONE Pallas launch (~40 tiny XLA
    kernels of log-depth scan steps otherwise; ops/pallas/pose_prop.py).
    Identical timeline semantics; equivalence:
    tests/test_pose_prop_pallas.py."""
    from ..ops.pallas import pose_prop as pp

    st0 = carry.state
    dtype = carry.cov.dtype
    nb, kmax = packet.imu_time.shape
    m = nb * (kmax + 1)
    mp = ((m + 127) // 128) * 128

    zpad1 = jnp.zeros((nb, 1), dtype)
    zpad3 = jnp.zeros((nb, 1, 3), dtype)
    t_all = jnp.concatenate(
        [packet.imu_time, packet.bucket_time[:, None]], axis=1
    ).reshape(1, m)
    gate = jnp.concatenate(
        [packet.imu_mask.astype(dtype), packet.bucket_mask.astype(dtype)[:, None]],
        axis=1,
    ).reshape(1, m)
    is_ev = jnp.concatenate(
        [packet.imu_mask.astype(dtype), zpad1], axis=1
    ).reshape(1, m)
    gyr = jnp.concatenate([packet.imu_gyr, zpad3], axis=1).reshape(m, 3).T
    acc = jnp.concatenate([packet.imu_acc, zpad3], axis=1).reshape(m, 3).T
    rows = jnp.concatenate([t_all, gate, is_ev, gyr, acc], axis=0)  # [9, m]
    rows = jnp.pad(rows, ((0, 0), (0, mp - m)))

    par = jnp.concatenate(
        [
            st0.rot.reshape(9),
            st0.pos, st0.vel, st0.ba, st0.bw, st0.grav, st0.imu_w, st0.imu_a,
            carry.last_predict_t.astype(dtype)[None],
            params.g_over_acc_norm.astype(dtype)[None],
        ]
    )[None, :]

    out = pp.pose_call(par, rows, interpret=jax.default_backend() == "cpu")
    sel = (jnp.arange(nb) + 1) * (kmax + 1) - 1
    rb = jnp.take(out[0:9], sel, axis=1).T.reshape(nb, 3, 3)
    pb = jnp.take(out[9:12], sel, axis=1).T
    return rb, pb


def _predicted_bucket_poses(carry, packet, params=None, scfg=None):
    """Per-bucket match-pose prediction, dispatched on scfg.match_pose."""
    if scfg is not None and scfg.match_pose == "imu":
        if getattr(scfg, "use_pallas_pose", False):
            return _predicted_bucket_poses_imu_pallas(carry, packet, params)
        return _predicted_bucket_poses_imu(carry, packet, params)
    return _predicted_bucket_poses_const_vel(carry, packet)


def _match_compact_stats(carry, packet, params, scfg, cap, poses=None):
    """Phase 1 for the fused chain: compacted match + per-bucket sufficient
    statistics.  Never materializes [NB, P] match outputs — the fused chain
    consumes only s40/nmatch per bucket, and the insert phase reuses the
    compacted rows (same mask).  ``poses`` (rb [NB,3,3], pb [NB,3])
    overrides the predicted match poses — the iterated-matching second
    pass feeds the first chain pass's post-update bucket poses here."""
    from . import eskf_fused as ef

    st0, cov0 = carry.state, carry.cov
    nb, p, _ = packet.points.shape
    if poses is None:
        rb, pb = _predicted_bucket_poses(carry, packet, params, scfg)
    else:
        rb, pb = poses

    mask_f = (packet.point_mask & packet.bucket_mask[:, None]).reshape(-1)
    order = _compact_order(mask_f, cap)
    mask_c = _gather(mask_f, order, fill=False)
    bidx = order // p                                      # [C]; nb when padded

    pts_c = _gather(packet.points.reshape(-1, 3), order)   # [C,3]
    p_i_c = pts_c @ params.ext_r.T + params.ext_t
    cross_c = skew(p_i_c)                                  # [C,3,3]
    body_cov_c = calc_body_cov(pts_c, scfg.dept_err, scfg.beam_err)

    rb_c = rb[jnp.minimum(bidx, nb - 1)]                   # [C,3,3]
    pb_c = pb[jnp.minimum(bidx, nb - 1)]
    p_w_c = jnp.einsum("cij,cj->ci", rb_c, p_i_c) + pb_c
    rot_ext_c = jnp.einsum("cij,jk->cik", rb_c, params.ext_r)
    rot_cross_c = jnp.einsum("cij,cjk->cik", rb_c, cross_c)
    var_c = (
        jnp.einsum("cij,cjk,clk->cil", rot_ext_c, body_cov_c, rot_ext_c)
        + jnp.einsum("cij,jk,clk->cil", rot_cross_c, cov0[0:3, 0:3], rot_cross_c)
        + cov0[3:6, 3:6]
    )
    m = match_points(carry.vm, scfg.map_cfg, p_w_c, var_c, mask_c)

    # Measurement variance (KILO.cc:201-209) at predicted poses.
    j_nq = jnp.concatenate([p_w_c - m.center, -m.normal], axis=-1)
    single_l = jnp.maximum(
        jnp.einsum("ci,cij,cj->c", j_nq, m.plane_var, j_nq), 0.0
    )  # PSD clamp (see filter.py)
    var_bw = jnp.einsum("cij,cjk,clk->cil", rot_ext_c, body_cov_c, rot_ext_c)
    r_c = params.noise.lidar_point_meas_ratio * (
        single_l + jnp.einsum("ci,cij,cj->c", m.normal, var_bw, m.normal)
    )
    matched_c = m.matched & mask_c

    s40 = ef.point_suffstats_compact(
        p_i_c, m.normal, m.center, r_c, matched_c, bidx, nb
    )
    nmatch_b = jnp.zeros((nb,), jnp.int32).at[bidx].add(
        matched_c.astype(jnp.int32), mode="drop"
    )
    aux = (
        order, bidx, pts_c, p_i_c, cross_c, body_cov_c, mask_c,
        m.own_keys, m.own_slot, m.own_found, m.own_plane,
    )
    return s40, nmatch_b, aux


def _pick_block(c: int) -> int:
    for b in (512, 256, 128):
        if c % b == 0:
            return b
    return 0


def insert_phase_pallas(
    vm, mcfg, params, bidx, p_i_c, body_cov_c, mask_c,
    own_keys, own_slot, own_found, own_plane,
    rots, poss, rot_covs, pos_covs,
):
    """The fused pipeline's Pallas insert phase: one launch for the whole
    per-row moment pipeline — post-update pose transform, covariance
    propagation, packed moment rows (ops/pallas/insert_rows.py); only
    gathers/scatters stay in XLA.  Shared by _process_scan_fused and the
    census tooling (tools/hlo_kernels.py) so the censused lowering cannot
    drift from production."""
    from ..ops.pallas import insert_rows as ir
    from .voxel_map import gated_insert_rows, insert_packed_rows_hinted

    nb = rots.shape[0]
    dtype = p_i_c.dtype
    rows = gated_insert_rows(
        mcfg, mask_c, own_keys, own_slot, own_found, own_plane
    )
    bidx_r = jnp.take(jnp.minimum(bidx, nb - 1), rows.pidx)
    sizes = jnp.asarray(
        [mcfg.voxel_size / (2.0 ** l) for l in range(mcfg.levels)], dtype
    )
    par = jnp.concatenate(
        [params.ext_r.reshape(9).astype(dtype),
         jnp.zeros((ir.PAR_W - 9,), dtype)]
    )[None, :]
    # ONE row gather of the packed per-bucket chain outputs (rot, pos,
    # rot_cov, pos_cov — 30 floats) instead of four separate transposed
    # takes; same for the per-point inputs (p_i + body cov) from the
    # match phase.
    bucket_rows = jnp.concatenate(
        [rots.reshape(nb, 9), poss, rot_covs.reshape(nb, 9),
         pos_covs.reshape(nb, 9)],
        axis=1,
    )                                                      # [nb, 30]
    brow_t = jnp.take(bucket_rows, bidx_r, axis=0).T       # [30, R]
    prow_t = jnp.take(
        jnp.concatenate([p_i_c, body_cov_c.reshape(-1, 9)], axis=1),
        rows.pidx, axis=0,
    ).T                                                    # [12, R]
    out69 = ir.moments_call(
        par, prow_t, brow_t,
        rows.keys.T.astype(dtype),
        sizes[rows.lvl][None, :],
        interpret=jax.default_backend() == "cpu",
        block=_pick_block(mcfg.insert_row_cap),
    )
    return insert_packed_rows_hinted(
        vm, mcfg, rows, out69[0:9].T, out69[9:69].T
    )


def _match_compact_stats_pallas(carry, packet, params, scfg, cap, poses=None):
    """_match_compact_stats with the per-point math in two Pallas kernels.

    Identical contract and semantics (equivalence: tests/test_match_geom.py);
    only the hash-table probe and the meta/plane gathers stay in XLA.  Data
    flows in transposed SoA layout ([component, point]) so each in-kernel op
    is a full-lane vector op; see ops/pallas/match_geom.py.
    """
    from . import eskf_fused as ef
    from ..ops.pallas import match_geom as mg

    cov0 = carry.cov
    nb, p, _ = packet.points.shape
    dtype = cov0.dtype
    mcfg = scfg.map_cfg
    L, C = mcfg.levels, mcfg.capacity
    miss = L * C
    block = _pick_block(cap)
    interpret = jax.default_backend() == "cpu"
    if poses is None:
        rb, pb = _predicted_bucket_poses(carry, packet, params, scfg)
    else:
        rb, pb = poses

    mask_f = (packet.point_mask & packet.bucket_mask[:, None]).reshape(-1)
    order = _compact_order(mask_f, cap)
    mask_c = _gather(mask_f, order, fill=False)
    bidx = order // p                                      # nb when padded
    bidx_c = jnp.minimum(bidx, nb - 1)

    pts_c = _gather(packet.points.reshape(-1, 3), order)   # [cap, 3]
    pts_t = pts_c.T                                        # [3, cap]
    rb_t = jnp.take(rb.reshape(nb, 9).T, bidx_c, axis=1)   # [9, cap]
    pb_t = jnp.take(pb.T, bidx_c, axis=1)                  # [3, cap]

    sizes = [
        mcfg.voxel_size / (2.0 ** lvl) for lvl in range(L)
    ] + [0.0] * (4 - L)
    # One concatenate instead of seven .at[].set updates (each set is its
    # own XLA fusion; the par row layout is positional — match_geom._P_*).
    par1 = jnp.concatenate(
        [
            params.ext_r.reshape(9).astype(dtype),
            params.ext_t.astype(dtype),
            jnp.asarray(sizes, dtype),
            cov0[0:3, 0:3].reshape(9),
            cov0[3:6, 3:6].reshape(9),
            jnp.asarray([scfg.dept_err, scfg.beam_err], dtype),
            jnp.zeros((64 - 36,), dtype),
        ]
    )[None, :]

    piw_t, covs_t, keys_t, vc_t, idx0_t = mg.keys_call(
        par1, pts_t, rb_t, pb_t, levels=L, capacity=C,
        interpret=interpret, block=block,
    )

    # ---- probe (XLA: index arithmetic + ONE wide gather) ----
    # Random-row gathers are latency-bound per index on this target
    # (docs/PERF_NOTES.md); the map's persistent ptab rows carry
    # key/occ/is_plane together so ONE gather fetches everything the probe
    # needs — no per-scan probe-table rebuild (the old concat + meta column
    # extract cost ~0.3 ms/scan in layout-conversion copies).
    offs = jnp.arange(mcfg.probe, dtype=jnp.int32)
    h0 = idx0_t & (C - 1)
    base = idx0_t - h0
    idx = base[:, :, None] + ((h0[:, :, None] + offs[None, None, :]) & (C - 1))
    ktab = carry.vm.ptab.reshape(miss, 5)
    k_at = ktab[idx]                                       # [2L, cap, probe, 5]
    keys_cmp = keys_t.reshape(2 * L, 3, cap).transpose(0, 2, 1)
    match = (k_at[..., 3] > 0) & jnp.all(
        k_at[..., 0:3] == keys_cmp[:, :, None, :], axis=-1
    )
    # Min-encoded first-match selection (offset<<1 | is_plane): one reduce
    # recovers the winning offset and its plane flag; the slot is
    # recomputed arithmetically — no argmax + take_along_axis gathers
    # (same trick as voxel_map._probe_find).
    big = 2 * mcfg.probe
    isp_at = (k_at[..., 4] > 0).astype(jnp.int32)
    score = jnp.where(match, 2 * offs[None, None, :] + isp_at, big)
    msel = jnp.min(score, axis=-1)
    found = msel < big                                     # [2L, cap]
    slot = jnp.where(found, base + ((h0 + (msel >> 1)) & (C - 1)), miss)
    isp = ((msel & 1) == 1) & found                        # [2L, cap]

    plane_at = carry.vm.plane.reshape(miss, -1).at[slot].get(
        mode="fill", fill_value=0.0
    ).astype(dtype)             # [2L, cap, 31]; upcast (storage may be f16)
    plane_t = plane_at.transpose(0, 2, 1).reshape(2 * L * 31, cap)
    flags_t = jnp.concatenate(
        [found.astype(dtype), isp.astype(dtype)], axis=0
    )
    mask_t = mask_c.astype(dtype)[None, :]

    par2 = jnp.concatenate(
        [
            jnp.asarray([mcfg.sigma_num, mcfg.radius_k], dtype),
            params.noise.lidar_point_meas_ratio[None].astype(dtype),
            jnp.zeros((5,), dtype),
        ]
    )[None, :]

    out, s40_flat, nm = mg.select_call(
        par2, piw_t, covs_t[0:18], vc_t, plane_t, flags_t, mask_t,
        bidx.astype(dtype)[None, :],
        levels=L, n_buckets=nb, interpret=interpret, block=block,
    )
    s40 = s40_flat.reshape(nb, 40, 40)
    nmatch_b = nm[:, 0].astype(jnp.int32)                  # [nb]

    p_i_c = piw_t[0:3].T                                   # [cap, 3]
    cross_c = skew(p_i_c)
    body_cov_c = covs_t[18:27].T.reshape(cap, 3, 3)
    own_keys = keys_t[0 : 3 * L].reshape(L, 3, cap).transpose(0, 2, 1)
    own_slot = slot[0:L]
    own_found = found[0:L]
    own_plane = isp[0:L]

    aux = (
        order, bidx, pts_c, p_i_c, cross_c, body_cov_c, mask_c,
        own_keys, own_slot, own_found, own_plane,
    )
    return s40, nmatch_b, aux


def _batched_match(carry, packet, params, scfg, poses=None):
    """Phase 1: predicted poses, point transforms/vars, batched match."""
    st0, cov0 = carry.state, carry.cov
    nb, p, _ = packet.points.shape
    dtype = cov0.dtype

    # Match-pose prediction per bucket (const-vel or IMU-propagated), or
    # the previous chain pass's post-update poses (iterated matching).
    if poses is None:
        rb, pb = _predicted_bucket_poses(carry, packet, params, scfg)
    else:
        rb, pb = poses

    pts = packet.points                                    # [NB,P,3] body
    p_i = pts @ params.ext_r.T + params.ext_t              # [NB,P,3]
    crossmat = skew(p_i)                                   # [NB,P,3,3]
    rot_ext = jnp.einsum("bij,jk->bik", rb, params.ext_r)  # [NB,3,3]
    mask = packet.point_mask & packet.bucket_mask[:, None]

    if scfg.match_cap and scfg.match_cap < nb * p:
        # Compact valid rows to the front so the variance einsums and the
        # map probe process match_cap rows instead of the full NB*P
        # padding.  Rows left behind are invalid (mask False), so their
        # match outputs never reach the filter — scatter back zeros.
        mask_f = mask.reshape(-1)
        order = _compact_order(mask_f, scfg.match_cap)      # [C]
        bidx = jnp.minimum(order // p, nb - 1)              # owning bucket
        pts_c = _gather(pts.reshape(-1, 3), order)
        p_i_c = _gather(p_i.reshape(-1, 3), order)
        rb_c = rb[bidx]                                     # [C,3,3]
        p_w_c = jnp.einsum("cij,cj->ci", rb_c, p_i_c) + pb[bidx]
        body_cov_c = calc_body_cov(pts_c, scfg.dept_err, scfg.beam_err)
        cross_c = _gather(crossmat.reshape(-1, 3, 3), order)
        rot_ext_c = rot_ext[bidx]
        rot_cross_c = jnp.einsum("cij,cjk->cik", rb_c, cross_c)
        var_c = (
            jnp.einsum("cij,cjk,clk->cil", rot_ext_c, body_cov_c, rot_ext_c)
            + jnp.einsum(
                "cij,jk,clk->cil", rot_cross_c, cov0[0:3, 0:3], rot_cross_c
            )
            + cov0[3:6, 3:6]
        )                                                   # [C,3,3]
        mask_c = _gather(mask_f, order, fill=False)
        m = match_points(carry.vm, scfg.map_cfg, p_w_c, var_c, mask_c)

        # Measurement variance (KILO.cc:201-209) at predicted poses.
        j_nq = jnp.concatenate([p_w_c - m.center, -m.normal], axis=-1)
        single_l = jnp.maximum(
        jnp.einsum("ci,cij,cj->c", j_nq, m.plane_var, j_nq), 0.0
    )  # PSD clamp (see filter.py)
        var_bw = jnp.einsum(
            "cij,cjk,clk->cil", rot_ext_c, body_cov_c, rot_ext_c
        )
        r_c = params.noise.lidar_point_meas_ratio * (
            single_l + jnp.einsum("ci,cij,cj->c", m.normal, var_bw, m.normal)
        )
        normal = (
            jnp.zeros((nb * p, 3), dtype).at[order].set(m.normal, mode="drop")
        ).reshape(nb, p, 3)
        center = (
            jnp.zeros((nb * p, 3), dtype).at[order].set(m.center, mode="drop")
        ).reshape(nb, p, 3)
        r_meas = (
            jnp.zeros((nb * p,), dtype).at[order].set(r_c, mode="drop")
        ).reshape(nb, p)
        matched = (
            jnp.zeros((nb * p,), bool).at[order].set(m.matched & mask_c, mode="drop")
        ).reshape(nb, p)
        return p_i, normal, center, r_meas, matched, crossmat

    p_w = jnp.einsum("bij,bpj->bpi", rb, p_i) + pb[:, None, :]
    body_cov = calc_body_cov(pts, scfg.dept_err, scfg.beam_err)  # [NB,P,3,3]
    rot_cross = jnp.einsum("bij,bpjk->bpik", rb, crossmat)
    var = (
        jnp.einsum("bij,bpjk,blk->bpil", rot_ext, body_cov, rot_ext)
        + jnp.einsum("bpij,jk,bplk->bpil", rot_cross, cov0[0:3, 0:3], rot_cross)
        + cov0[3:6, 3:6]
    )                                                       # [NB,P,3,3]

    m = match_points(
        carry.vm, scfg.map_cfg,
        p_w.reshape(nb * p, 3), var.reshape(nb * p, 3, 3), mask.reshape(-1),
    )

    # Measurement variance (KILO.cc:201-209), evaluated at predicted poses.
    normal = m.normal.reshape(nb, p, 3)
    center = m.center.reshape(nb, p, 3)
    j_nq = jnp.concatenate([p_w - center, -normal], axis=-1)       # [NB,P,6]
    single_l = jnp.maximum(  # PSD clamp (see filter.py)
        jnp.einsum(
            "bpi,bpij,bpj->bp", j_nq, m.plane_var.reshape(nb, p, 6, 6), j_nq
        ),
        0.0,
    )
    var_bw = jnp.einsum("bij,bpjk,blk->bpil", rot_ext, body_cov, rot_ext)
    r_meas = params.noise.lidar_point_meas_ratio * (
        single_l + jnp.einsum("bpi,bpij,bpj->bp", normal, var_bw, normal)
    )
    matched = m.matched.reshape(nb, p) & mask
    return p_i, normal, center, r_meas, matched, crossmat


def _chain_jax(carry, packet, params, scfg, p_i, normal, center, r_meas, matched):
    """Phase 2 (lax.scan variant): exact reference update recursion over
    pre-matched planes."""
    kmax = packet.imu_time.shape[1]
    dtype = carry.cov.dtype

    def bucket_step(c, inp):
        (bt, bgate, pi_b, n_b, c_b, r_b, m_b,
         it, igate, acc, gyr, fp, fv, ct) = inp
        st, cov = c.state, c.cov
        lp, lu = c.last_predict_t, c.last_update_t

        for k in range(kmax):
            g = igate[k]
            gf = g.astype(dtype)
            st, cov = eskf.predict(
                st, cov, params.noise.q_diag,
                (it[k] - lp) * gf, (it[k] - lu) * gf,
            )
            if scfg.use_kin:
                h, z, r, _ = eskf.build_kin_obs(
                    st, acc[k], gyr[k], fp[k], fv[k], ct[k],
                    params.noise, params.g_over_acc_norm,
                )
                st, cov = eskf.update_by_kin_imu(st, cov, h, z, r, gate=gf)
            else:
                z6 = eskf.imu_innovation(st, acc[k], gyr[k], params.g_over_acc_norm)
                st, cov = eskf.update_by_imu(
                    st, cov, z6, params.noise.imu_meas_r, gate=gf
                )
            lp = jnp.where(g, it[k], lp)
            lu = jnp.where(g, it[k], lu)

        gf = bgate.astype(dtype)
        st, cov = eskf.predict(
            st, cov, params.noise.q_diag, (bt - lp) * gf, (bt - lu) * gf
        )
        lp = jnp.where(bgate, bt, lp)

        # h, z from the current (post-predict) state — KILO.cc:190-210.
        rt_n = n_b @ st.rot                                    # R^T n
        cr_u = jnp.cross(pi_b, rt_n)                           # [p_i]x R^T n
        h6 = jnp.concatenate([cr_u, n_b], axis=-1)             # [P,6]
        p_w = pi_b @ st.rot.T + st.pos
        z = -jnp.sum(n_b * (p_w - c_b), axis=-1)
        m_b = m_b & bgate
        st2, cov2 = eskf.update_by_points(st, cov, h6, z, r_b, m_b)
        did = jnp.any(m_b)
        st = jax.tree.map(lambda a, b: jnp.where(did, a, b), st2, st)
        cov = jnp.where(did, cov2, cov)
        lu = jnp.where(bgate & did, bt, lu)

        out = (st.rot, st.pos, cov[0:3, 0:3], cov[3:6, 3:6],
               jnp.sum(m_b.astype(jnp.int32)))
        return c._replace(state=st, cov=cov, last_predict_t=lp, last_update_t=lu), out

    xs = (
        packet.bucket_time, packet.bucket_mask, p_i, normal, center, r_meas,
        matched, packet.imu_time, packet.imu_mask, packet.imu_acc,
        packet.imu_gyr, packet.foot_pos, packet.foot_vel, packet.contact,
    )
    carry, (rots, poss, rot_covs, pos_covs, nmatch) = jax.lax.scan(
        bucket_step, carry, xs
    )
    return carry, rots, poss, rot_covs, pos_covs, nmatch


def _chain_jax_fused(
    carry, packet, params, scfg, p_i, normal, center, r_meas, matched
):
    """Phase 2 (all-elementwise variant) from full [NB, P] match outputs —
    used when a caller has bucket-layout data (e.g. phase benchmarks); the
    production fused path goes through _match_compact_stats +
    _chain_fused_core instead."""
    from . import eskf_fused as ef

    s40 = ef.point_suffstats(p_i, normal, center, r_meas, matched)  # [NB,40,40]
    nmatch_b = jnp.sum(matched.astype(jnp.int32), axis=-1)          # [NB]
    return _chain_fused_core(carry, packet, params, scfg, s40, nmatch_b)


def _chain_fused_core(carry, packet, params, scfg, s40, nmatch_b):
    """Identical recursion to _chain_jax, built from eskf_fused ops so each
    bucket step emits no dot/reduce/scatter kernels: the per-bucket point
    normal equations come from sufficient statistics (s40) computed once per
    scan, so the sequential chain touches no per-point data.

    All per-bucket inputs are packed into ONE [NB, width] row and all
    per-bucket outputs into ONE [31] vector so each scan iteration does a
    single dynamic-slice and a single dynamic-update-slice instead of ~16 —
    on this target every such op in the sequential loop is a kernel launch.
    """
    from . import eskf_fused as ef

    kmax = packet.imu_time.shape[1]
    dtype = carry.cov.dtype
    nb = packet.bucket_time.shape[0]

    parts = [
        packet.bucket_time[:, None],
        packet.bucket_mask.astype(dtype)[:, None],
        nmatch_b.astype(dtype)[:, None],
        packet.imu_time,                              # [NB,K]
        packet.imu_mask.astype(dtype),                # [NB,K]
        packet.imu_acc.reshape(nb, 3 * kmax),
        packet.imu_gyr.reshape(nb, 3 * kmax),
    ]
    if scfg.use_kin:
        parts += [
            packet.foot_pos.reshape(nb, 12 * kmax),
            packet.foot_vel.reshape(nb, 12 * kmax),
            packet.contact.astype(dtype).reshape(nb, 4 * kmax),
        ]
    parts.append(s40.reshape(nb, ef.N_FEAT * ef.N_FEAT))
    xs = jnp.concatenate(parts, axis=-1)              # [NB, width]

    def bucket_step(c, row):
        bt, bgate_f, nm_f = row[0], row[1], row[2]
        o = 3
        it = row[o : o + kmax]; o += kmax
        igate_f = row[o : o + kmax]; o += kmax
        acc = row[o : o + 3 * kmax].reshape(kmax, 3); o += 3 * kmax
        gyr = row[o : o + 3 * kmax].reshape(kmax, 3); o += 3 * kmax
        if scfg.use_kin:
            fp = row[o : o + 12 * kmax].reshape(kmax, 4, 3); o += 12 * kmax
            fv = row[o : o + 12 * kmax].reshape(kmax, 4, 3); o += 12 * kmax
            ct = row[o : o + 4 * kmax].reshape(kmax, 4); o += 4 * kmax
        s40_b = row[o:].reshape(ef.N_FEAT, ef.N_FEAT)

        st, cov = c.state, c.cov
        lp, lu = c.last_predict_t, c.last_update_t

        for k in range(kmax):
            g = igate_f[k] > 0.5
            gf = igate_f[k]
            st, cov = ef.predict(
                st, cov, params.noise.q_diag,
                (it[k] - lp) * gf, (it[k] - lu) * gf,
            )
            if scfg.use_kin:
                h, z, r, _ = ef.build_kin_obs(
                    st, acc[k], gyr[k], fp[k], fv[k], ct[k],
                    params.noise, params.g_over_acc_norm,
                )
                st, cov = ef.update_by_kin_imu(st, cov, h, z, r, gate=gf)
            else:
                z6 = eskf.imu_innovation(st, acc[k], gyr[k], params.g_over_acc_norm)
                st, cov = ef.update_by_imu(
                    st, cov, z6, params.noise.imu_meas_r, gate=gf
                )
            lp = jnp.where(g, it[k], lp)
            lu = jnp.where(g, it[k], lu)

        bgate = bgate_f > 0.5
        st, cov = ef.predict(
            st, cov, params.noise.q_diag, (bt - lp) * bgate_f, (bt - lu) * bgate_f
        )
        lp = jnp.where(bgate, bt, lp)

        # Empty buckets have S = 0 -> exact no-op (dx = 0, cov unchanged).
        st, cov = ef.point_update_from_stats(st, cov, s40_b)
        lu = jnp.where(bgate & (nm_f > 0.5), bt, lu)

        out = jnp.concatenate(
            [
                st.rot.reshape(9),
                st.pos,
                cov[0:3, 0:3].reshape(9),
                cov[3:6, 3:6].reshape(9),
                nm_f[None],
            ]
        )                                              # [31]
        return c._replace(state=st, cov=cov, last_predict_t=lp, last_update_t=lu), out

    carry, outs = jax.lax.scan(
        bucket_step, carry, xs, unroll=max(1, scfg.chain_unroll)
    )
    rots = outs[:, 0:9].reshape(nb, 3, 3)
    poss = outs[:, 9:12]
    rot_covs = outs[:, 12:21].reshape(nb, 3, 3)
    pos_covs = outs[:, 21:30].reshape(nb, 3, 3)
    nmatch = outs[:, 30].astype(jnp.int32)
    return carry, rots, poss, rot_covs, pos_covs, nmatch


def _process_scan_fused(
    carry: FilterCarry,
    packet: ScanPacket,
    params: FilterParams,
    scfg: StaticConfig,
) -> Tuple[FilterCarry, ScanOutput]:
    """Fused-chain scan step: every per-point phase runs on one shared
    mask-compaction (match, sufficient statistics, insert) and the chain
    consumes only per-bucket statistics.  Semantics identical to the
    bucket-layout path (equivalence covered by tests/test_eskf_fused.py and
    the cross-pipeline ATE tests)."""
    nb, p, _ = packet.points.shape
    ocnt0 = carry.vm.ocnt
    cap = max(scfg.match_cap, scfg.insert_cap) or nb * p
    cap = min(cap, nb * p)
    n_valid = jnp.sum(
        (packet.point_mask & packet.bucket_mask[:, None]).astype(jnp.int32)
    )
    cap_dropped = jnp.maximum(0, n_valid - cap)

    match_fn = (
        _match_compact_stats_pallas
        if scfg.use_pallas_match and _pick_block(cap)
        else _match_compact_stats
    )
    if scfg.use_pallas:
        from ..ops.pallas.chain_stats import run_chain_stats

        def chain_fn(c, s40, nmatch_b):
            return run_chain_stats(
                c, packet, params, s40, nmatch_b, use_kin=scfg.use_kin
            )
    else:
        def chain_fn(c, s40, nmatch_b):
            return _chain_fused_core(c, packet, params, scfg, s40, nmatch_b)

    # Iterated matching (scfg.match_iters): pass 1 matches at predicted
    # poses; each further pass re-matches at the previous chain pass's
    # post-update per-bucket poses and re-runs the chain from the SAME
    # scan-start carry — a batched iterated-EKF outer loop that recovers
    # the sequential pipeline's within-scan feedback quality under
    # aggressive dynamics with zero sequential structure added.
    carry0 = carry
    poses = None
    for _ in range(max(1, scfg.match_iters)):
        s40, nmatch_b, aux = match_fn(carry0, packet, params, scfg, cap,
                                      poses=poses)
        carry, rots, poss, rot_covs, pos_covs, nmatch = chain_fn(
            carry0, s40, nmatch_b
        )
        poses = (rots, poss)
    (order, bidx, pts_c, p_i_c, cross_c, body_cov_c, mask_c,
     own_keys, own_slot, own_found, own_plane) = aux

    # Phase 3 on the same compacted rows: recompute world points with
    # post-update per-bucket poses, then one batched insert
    # (KILO.cc:216-231 recompute + UpdateVoxelMap).
    mcfg = scfg.map_cfg
    use_pallas_insert = (
        scfg.use_pallas_insert
        and scfg.insert_reuse_probe
        and mcfg.insert_row_cap > 0
        and _pick_block(mcfg.insert_row_cap)
    )
    if use_pallas_insert:
        vm = insert_phase_pallas(
            carry.vm, mcfg, params, bidx, p_i_c, body_cov_c, mask_c,
            own_keys, own_slot, own_found, own_plane,
            rots, poss, rot_covs, pos_covs,
        )
    else:
        bidx_c = jnp.minimum(bidx, nb - 1)
        rb2 = rots[bidx_c]
        pb2 = poss[bidx_c]
        p_w_c = jnp.einsum("cij,cj->ci", rb2, p_i_c) + pb2
        rot_ext2 = jnp.einsum("cij,jk->cik", rb2, params.ext_r)
        rot_cross2 = jnp.einsum("cij,cjk->cik", rb2, cross_c)
        var_c = (
            jnp.einsum("cij,cjk,clk->cil", rot_ext2, body_cov_c, rot_ext2)
            + jnp.einsum(
                "cij,cjk,clk->cil", rot_cross2, rot_covs[bidx_c], rot_cross2
            )
            + pos_covs[bidx_c]
        )
        if scfg.insert_reuse_probe:
            vm = insert_points_hinted(
                carry.vm, scfg.map_cfg, p_w_c, var_c, mask_c,
                own_keys, own_slot, own_found, own_plane,
            )
        else:
            vm = insert_points(carry.vm, scfg.map_cfg, p_w_c, var_c, mask_c)
    carry = carry._replace(vm=vm)

    if scfg.map_sliding_en:
        moved = jnp.linalg.norm(carry.state.pos - carry.last_slide_pos)
        trigger = moved >= scfg.sliding_thresh
        vm_slid = slide_map(
            carry.vm, scfg.map_cfg, carry.state.pos, scfg.half_map_size
        )
        vm2 = jax.tree.map(
            lambda a, b: jnp.where(trigger, a, b), vm_slid, carry.vm
        )
        carry = carry._replace(
            vm=vm2,
            last_slide_pos=jnp.where(trigger, carry.state.pos, carry.last_slide_pos),
        )

    cloud = None
    if scfg.return_cloud:
        p_i = packet.points @ params.ext_r.T + params.ext_t
        cloud = jnp.einsum("bij,bpj->bpi", rots, p_i) + poss[:, None, :]

    out = ScanOutput(
        rot=carry.state.rot,
        pos=carry.state.pos,
        n_matched=jnp.sum(nmatch),
        n_points=n_valid,
        cloud_world=cloud,
        n_cap_dropped=cap_dropped,
        map_overflow=carry.vm.ocnt - ocnt0,
    )
    return carry, out


def process_scan_deferred(
    carry: FilterCarry,
    packet: ScanPacket,
    params: FilterParams,
    scfg: StaticConfig,
) -> Tuple[FilterCarry, ScanOutput]:
    """Deferred-pipeline equivalent of filter.process_scan."""
    nb, p, _ = packet.points.shape

    carry = carry._replace(
        last_predict_t=carry.last_predict_t - packet.rebase,
        last_update_t=carry.last_update_t - packet.rebase,
    )

    if scfg.chain_impl == "fused":
        # Handles both the all-elementwise lax.scan chain and (use_pallas)
        # the single fused Pallas kernel over the same sufficient statistics.
        carry, out = _process_scan_fused(carry, packet, params, scfg)
        return maybe_symmetrize_cov(carry, scfg), out

    ocnt0 = carry.vm.ocnt

    # chain_impl="jax" always runs the lax.scan chain; the Pallas fast path
    # lives on the fused pipeline only (chain_stats.py).  The superseded
    # per-point chain kernel is archived at tools/experiments/
    # eskf_chain_pallas.py (see docs/PERF_NOTES.md "Mosaic findings").
    # Iterated matching mirrors _process_scan_fused: re-match at the
    # previous pass's post-update bucket poses, re-run from carry0.
    carry0 = carry
    poses = None
    for _ in range(max(1, scfg.match_iters)):
        p_i, normal, center, r_meas, matched, crossmat = _batched_match(
            carry0, packet, params, scfg, poses=poses
        )
        carry, rots, poss, rot_covs, pos_covs, nmatch = _chain_jax(
            carry0, packet, params, scfg, p_i, normal, center, r_meas, matched
        )
        poses = (rots, poss)

    # Phase 3: recompute world points with post-update per-bucket poses and
    # insert everything at once (KILO.cc:216-231 recompute + UpdateVoxelMap).
    p_w = jnp.einsum("bij,bpj->bpi", rots, p_i) + poss[:, None, :]
    body_cov = calc_body_cov(packet.points, scfg.dept_err, scfg.beam_err)
    rot_ext = jnp.einsum("bij,jk->bik", rots, params.ext_r)
    rot_cross = jnp.einsum("bij,bpjk->bpik", rots, crossmat)
    var = (
        jnp.einsum("bij,bpjk,blk->bpil", rot_ext, body_cov, rot_ext)
        + jnp.einsum("bpij,bjk,bplk->bpil", rot_cross, rot_covs, rot_cross)
        + pos_covs[:, None]
    )
    mask = packet.point_mask & packet.bucket_mask[:, None]
    p_w_f = p_w.reshape(nb * p, 3)
    var_f = var.reshape(nb * p, 3, 3)
    mask_f = mask.reshape(-1)
    if scfg.insert_cap and scfg.insert_cap < nb * p:
        # Compact valid points to the front so the map insert processes
        # ~half the rows; insertion order is irrelevant to the map
        # semantics.
        order = _compact_order(mask_f, scfg.insert_cap)
        p_w_f = _gather(p_w_f, order)
        var_f = _gather(var_f, order)
        mask_f = _gather(mask_f, order, fill=False)
    vm = insert_points(carry.vm, scfg.map_cfg, p_w_f, var_f, mask_f)
    carry = carry._replace(vm=vm)

    if scfg.map_sliding_en:
        moved = jnp.linalg.norm(carry.state.pos - carry.last_slide_pos)
        trigger = moved >= scfg.sliding_thresh
        vm_slid = slide_map(
            carry.vm, scfg.map_cfg, carry.state.pos, scfg.half_map_size
        )
        vm2 = jax.tree.map(
            lambda a, b: jnp.where(trigger, a, b), vm_slid, carry.vm
        )
        carry = carry._replace(
            vm=vm2,
            last_slide_pos=jnp.where(trigger, carry.state.pos, carry.last_slide_pos),
        )

    carry = maybe_symmetrize_cov(carry, scfg)
    n_valid = jnp.sum(mask.astype(jnp.int32))
    caps = [c for c in (scfg.match_cap, scfg.insert_cap) if c and c < nb * p]
    cap_dropped = (
        jnp.maximum(0, n_valid - min(caps)) if caps
        else jnp.zeros((), jnp.int32)
    )
    out = ScanOutput(
        rot=carry.state.rot,
        pos=carry.state.pos,
        n_matched=jnp.sum(nmatch),
        n_points=n_valid,
        cloud_world=p_w if scfg.return_cloud else None,
        n_cap_dropped=cap_dropped,
        map_overflow=carry.vm.ocnt - ocnt0,
    )
    return carry, out
