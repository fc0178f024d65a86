"""Device-resident multi-resolution voxel plane map (TPU-native).

Capability parity with the reference's spatial hash of probabilistic plane
octrees (/root/reference/legkilo/src/core/slam/voxel_map.{h,cc}, itself
adapted from FAST-LIVO2), re-designed for XLA:

* The ``std::unordered_map<Vector3i, VoxelOctoTree*>`` of pointer octrees
  becomes **one open-addressing hash table per resolution level** (level l
  voxel size = voxel_size / 2^l, l = 0..max_layer), all fixed-capacity device
  arrays.  Parent/child navigation is integer key arithmetic (child key =
  2*parent + offset), no pointers.
* Each slot stores the moment sufficient statistics of plane_fit.py instead
  of a point list; refits are closed-form and batched.
* Points insert at every level simultaneously (default), or — with
  ``insert_row_cap`` — only while every ancestor voxel exists and is not a
  plane, which is the reference's own UpdateOctoTree descent (it stops at
  the first plane node, voxel_map.cc:185-241).  The reference pushes stored
  points down into children when a voxel "cuts" (cut_octo_tree,
  voxel_map.cc:139-183); simultaneous insertion gives each child the same
  point history without replay, while the gated mode trades replay-free
  history below planar parents for ~levels-times fewer scatter rows.
  Matching honors the octree search order either way: a child's plane is
  only eligible when every ancestor voxel exists and is not itself a plane
  (build_single_residual, voxel_map.cc:363-427).
* The reference's neighbor-voxel retry (KILO.cc:156-178) compares
  ``p/voxel_size`` against a center in meters — a unit mixup that makes the
  "neighbor" always the +1/+1/+1 (or -1) diagonal.  We implement the intended
  semantics: step to the adjacent voxel along each axis where the point lies
  in the outer quarter of its voxel, at every level.
* Batched parallel insertion uses scatter-claim rounds: each new key claims
  the first empty probe slot, losers re-probe.  Padded points carry an
  out-of-range slot index and are dropped by XLA scatter ``mode="drop"``.
* Per-slot state is packed into four dense row blocks so every hot
  operation is a handful of wide gathers/scatters instead of one per field:

      ptab  [L, C, 5]    int32: key(3), occupied, is_plane — everything the
                         hash probe needs in ONE gathered row (is_plane is
                         mirrored from meta so the match phase never touches
                         the float tables; a per-scan rebuild of this row
                         block cost ~0.3 ms/scan in column-extract copies)
      meta  [L, C, 4]    n, new_n, initialized, is_plane (frozen is derived:
                         n >= max_points_num — storing it cost a second
                         whole-batch scatter per insert just to mirror a
                         monotone function of n)
      mom   [L, C, 69]   m1(3) m2(6) s0(6) s1(18) s2(36), symmetry-packed
                         (m2/s0 symmetric, s1 symmetric in its V indices,
                         s2 in both index pairs — half the table bytes)
      plane [L, C, 31]   center_rel(3) normal(3) evals(3) radius(1)
                         plane_var(21, symmetric 6x6 upper triangle)

All state lives in a single ``VoxelMap`` NamedTuple of arrays -> trivially
vmap-able (per-replica maps), donate-able, and orbax-checkpointable (the
reference's pointer octrees cannot be snapshotted at all; see SURVEY.md §5).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import numpy as np
import jax.numpy as jnp

from .plane_fit import PlaneMoments, fit_planes, point_moments

# numpy (not jnp) scalars: a module-level jnp constant would initialize
# the XLA backend at import time, which breaks jax.distributed.initialize
# (it must run before any backend init — see tests/multihost_worker.py).
_HASH_P1 = np.uint32(73856093)
_HASH_P2 = np.uint32(471943)
_HASH_P3 = np.uint32(83492791)

# meta row layout (frozen is derived: n >= max_points_num)
_M_N, _M_NEW, _M_INIT, _M_PLANE = 0, 1, 2, 3
META_DIM = 4
MOM_DIM = 69   # total symmetry-packed width; see _pack_moments
MOM12_DIM = 9  # m1(3) + m2(6): geometry moments, compute-dtype table
MOMS_DIM = 60  # s0(6) + s1(18) + s2(36): uncertainty stats, storage dtype
PLANE_DIM = 31  # plane_var symmetric 6x6 packed to 21
# ptab row layout: key x/y/z, occupied flag, is_plane flag (all int32)
_T_OCC, _T_PLANE = 3, 4
PTAB_DIM = 5


class MapConfig(NamedTuple):
    """Static (trace-time) map configuration."""

    levels: int              # max_layer + 1
    capacity: int            # slots per level (power of two)
    probe: int               # linear probe length
    voxel_size: float        # root voxel edge (m)
    planer_threshold: float  # min eigenvalue threshold ("min_eigen_value")
    sigma_num: float         # Mahalanobis gate multiplier
    max_points_num: int      # freeze threshold
    init_num: Tuple[int, ...]  # per-level init thresholds (layer_init_num)
    update_size_threshold: int = 5
    insert_rounds: int = 6   # claim rounds; k same-hash keys need k rounds
    radius_k: float = 3.0    # range gate multiplier (voxel_map.cc:369)
    refit_budget: int = 2048  # max plane refits per insert call (per level)
    insert_new_cap: int = 512  # compacted claim-path width (hinted insert)
    insert_row_cap: int = 0  # >0: ancestor-gated row compaction (hinted insert)
    use_pallas_refit: bool = False  # one-launch refit kernel (plane_fit_rows)
    # Storage dtype for the mom/plane tables ("f32" | "f16" | "bf16").
    # Moments are voxel-center-relative (|p~| <= half a voxel diagonal, n
    # <= max_points_num), so f16's 11-bit mantissa keeps the accumulated
    # sums mm-accurate while halving the two big tables' HBM bytes — the
    # replicas-per-chip limiter for fleet replay.  Refit/match math always
    # upcasts to the compute dtype; only the resting tables are narrow.
    storage_dtype: str = "f32"


def map_config_from(cfg, use_pallas_refit: bool = False) -> MapConfig:
    """Build a MapConfig from config.VoxelMapConfig."""
    levels = cfg.max_layer + 1
    return MapConfig(
        levels=levels,
        capacity=1 << cfg.capacity_log2,
        probe=cfg.probe_length,
        voxel_size=float(cfg.voxel_size),
        planer_threshold=float(cfg.min_eigen_value),
        sigma_num=float(cfg.sigma_num),
        max_points_num=int(cfg.max_points_num),
        init_num=tuple(int(x) for x in cfg.layer_init_num[:levels]),
        insert_rounds=int(getattr(cfg, "insert_rounds", 6)),
        insert_new_cap=int(getattr(cfg, "insert_new_cap", 512)),
        insert_row_cap=int(getattr(cfg, "insert_row_cap", 0)),
        refit_budget=int(getattr(cfg, "refit_budget", 2048)),
        use_pallas_refit=bool(use_pallas_refit),
        storage_dtype=str(getattr(cfg, "storage_dtype", "f32")),
    )


class VoxelMap(NamedTuple):
    """All map state, FLAT [levels * capacity, ...] device arrays (global
    slot index = level * capacity + local slot).

    The tables were [L, C, W] through round 4; every hot-path access
    reshaped them to [L*C, W], and XLA's level-minor layout choice for
    the 3-D parameters turned each of those reshapes into per-level
    async slice+concat copies (~34 slice-start pairs in the compiled
    step — round-5 census).  Storing flat removes the reshapes and the
    copies; the level structure is pure index arithmetic.

    ``mom`` holds the geometry moments m1/m2 (always compute dtype: the
    plane fit subtracts m2/n - c c^T, a cancellation that reduced
    precision cannot survive); ``moms`` holds the uncertainty statistics
    S0/S1/S2 and may be stored narrow (MapConfig.storage_dtype) — they
    only feed plane_var, where percent-level error is benign."""

    ptab: jnp.ndarray   # [L*C, PTAB_DIM] int32 probe rows (key, occ, is_plane)
    meta: jnp.ndarray   # [L*C, META_DIM]
    mom: jnp.ndarray    # [L*C, MOM12_DIM] m1(3) m2(6), compute dtype
    moms: jnp.ndarray   # [L*C, MOMS_DIM] s0(6) s1(18) s2(36), storage dtype
    plane: jnp.ndarray  # [L*C, PLANE_DIM] storage dtype
    # [3] int32 cumulative overflow counters — indexed by OCNT_ROWCAP
    # (insert rows dropped by insert_row_cap), OCNT_REFIT (refits deferred
    # past refit_budget; these retry on a later scan — deferral, not loss),
    # OCNT_CLAIM (valid rows whose slot claim failed: probe chain / table
    # capacity exhausted).  Silent-cap visibility: the reference has no
    # caps (unbounded std::unordered_map), so any nonzero counter marks a
    # TPU-build capacity knob that needs raising for the workload.
    ocnt: jnp.ndarray

    # Unpacked views (read-only convenience for tests/tools).
    @property
    def key(self):
        return self.ptab[..., 0:3]

    @property
    def occ(self):
        return self.ptab[..., _T_OCC] > 0
    def n(self):
        return self.meta[..., _M_N]

    def new_n(self):
        return self.meta[..., _M_NEW]

    def frozen(self, max_points_num: float):
        """Derived freeze flag (update_enable_, voxel_map.cc:199-204)."""
        return self.meta[..., _M_N] >= float(max_points_num)

    def initialized(self):
        return self.meta[..., _M_INIT] > 0.5

    def is_plane(self):
        return self.meta[..., _M_PLANE] > 0.5

    def center_rel(self):
        return self.plane[..., 0:3]

    def normal(self):
        return self.plane[..., 3:6]

    def evals(self):
        return self.plane[..., 6:9]

    def radius(self):
        return self.plane[..., 9]

    def plane_var(self):
        return _expand_pv(self.plane[..., 10:31])


class MatchResult(NamedTuple):
    """Per-point plane match (PointToPlane analog, voxel_map.h:80-94).

    ``own_*`` expose the own-voxel-chain probe internals (keys, global flat
    slot, hit flag per level) so a deferred-insert phase can reuse this
    probe instead of re-probing the same table (insert_points_hinted)."""

    matched: jnp.ndarray     # [N] bool
    normal: jnp.ndarray      # [N, 3]
    center: jnp.ndarray      # [N, 3] plane center in world
    plane_var: jnp.ndarray   # [N, 6, 6]
    signed_dist: jnp.ndarray  # [N] n . (p - center)
    own_keys: jnp.ndarray    # [L, N, 3] own-chain voxel keys
    own_slot: jnp.ndarray    # [L, N] global flat slot (levels*capacity = miss)
    own_found: jnp.ndarray   # [L, N] bool
    own_plane: jnp.ndarray   # [L, N] bool (slot holds a fitted plane)


# Symmetry packing for the moment rows: m2, s0 are symmetric 3x3 (6 unique),
# s1[b,c,a] is symmetric in (b,c) (18 unique), s2[b,c,d,a] is symmetric in
# (b,c) AND in (d,a) (36 unique) — all because V_i and p p^T are symmetric.
# Storing only unique entries halves the mom table (129 -> 69 floats/slot),
# its scatter-add bytes, and any layout-conversion copies.
_SYM6 = (0, 1, 2, 4, 5, 8)           # upper triangle of a row-major 3x3
_FULL9 = (0, 1, 2, 1, 3, 4, 2, 4, 5)  # sym6 index for each of the 9 entries
# row offsets within a packed row
_O_M1, _O_M2, _O_S0, _O_S1, _O_S2 = 0, 3, 9, 15, 33
# 6x6 symmetric packing for plane_var (upper triangle, row-major)
_SYM21_PAIRS = tuple((i, j) for i in range(6) for j in range(i, 6))
_TRIU36 = tuple(i * 6 + j for (i, j) in _SYM21_PAIRS)
_FULL36 = tuple(
    _SYM21_PAIRS.index((min(i, j), max(i, j)))
    for i in range(6) for j in range(6)
)


def _expand_pv(rows21):
    """[..., 21] packed plane_var -> [..., 6, 6]."""
    return rows21[..., list(_FULL36)].reshape(rows21.shape[:-1] + (6, 6))


def _pack_moments(m: PlaneMoments) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """PlaneMoments (without n) -> ([..., MOM12_DIM], [..., MOMS_DIM])
    symmetry-packed rows (geometry m1/m2; uncertainty s0/s1/s2)."""
    lead = m.m1.shape[:-1]
    sym6 = list(_SYM6)
    m2 = m.m2.reshape(lead + (9,))[..., sym6]
    s0 = m.s0.reshape(lead + (9,))[..., sym6]
    s1 = m.s1.reshape(lead + (9, 3))[..., sym6, :].reshape(lead + (18,))
    s2 = m.s2.reshape(lead + (9, 9))[..., sym6, :][..., :, sym6].reshape(
        lead + (36,)
    )
    return (
        jnp.concatenate([m.m1.reshape(lead + (3,)), m2], axis=-1),
        jnp.concatenate([s0, s1, s2], axis=-1),
    )


def _unpack_moments(
    rows12: jnp.ndarray, rows_s: jnp.ndarray, n: jnp.ndarray
) -> PlaneMoments:
    lead = rows12.shape[:-1]
    full9 = list(_FULL9)
    m2 = rows12[..., 3:9][..., full9].reshape(lead + (3, 3))
    s0 = rows_s[..., 0:6][..., full9].reshape(lead + (3, 3))
    s1 = (
        rows_s[..., 6:24]
        .reshape(lead + (6, 3))[..., full9, :]
        .reshape(lead + (3, 3, 3))
    )
    s2 = (
        rows_s[..., 24:60]
        .reshape(lead + (6, 6))[..., full9, :][..., :, full9]
        .reshape(lead + (3, 3, 3, 3))
    )
    return PlaneMoments(n=n, m1=rows12[..., 0:3], m2=m2, s0=s0, s1=s1, s2=s2)


OCNT_ROWCAP, OCNT_REFIT, OCNT_CLAIM = 0, 1, 2


def _ocnt_inc(rowcap=0, refit=0, claim=0) -> jnp.ndarray:
    parts = [rowcap, refit, claim]
    return jnp.stack([jnp.asarray(p, jnp.int32) for p in parts])


def storage_dtype_of(cfg: MapConfig, compute_dtype=jnp.float32):
    """Resolved table dtype: reduced storage applies only to f32 compute
    (f64 runs are precision yardsticks and keep f64 tables)."""
    if compute_dtype != jnp.float32:
        return compute_dtype
    return {
        "f32": jnp.float32, "f16": jnp.float16, "bf16": jnp.bfloat16,
    }[cfg.storage_dtype]


def make_map(cfg: MapConfig, dtype=jnp.float32) -> VoxelMap:
    lc = cfg.levels * cfg.capacity
    sd = storage_dtype_of(cfg, dtype)
    return VoxelMap(
        ptab=jnp.zeros((lc, PTAB_DIM), dtype=jnp.int32),
        meta=jnp.zeros((lc, META_DIM), dtype=dtype),
        mom=jnp.zeros((lc, MOM12_DIM), dtype=dtype),
        moms=jnp.zeros((lc, MOMS_DIM), dtype=sd),
        plane=jnp.zeros((lc, PLANE_DIM), dtype=sd),
        ocnt=jnp.zeros((3,), dtype=jnp.int32),
    )


def level_size(cfg: MapConfig, level: int) -> float:
    return cfg.voxel_size / (2.0 ** level)


def voxel_key(p_w: jnp.ndarray, size: float) -> jnp.ndarray:
    """Integer voxel coords: floor(p / size) (voxelKeyFloor,
    eigen_types.hpp:89-95)."""
    return jnp.floor(p_w / size).astype(jnp.int32)


def _hash(keys: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Spatial hash (eigen_types.hpp:74-82) reduced mod a power of two."""
    k = keys.astype(jnp.uint32)
    h = (k[..., 0] * _HASH_P1) ^ (k[..., 1] * _HASH_P2) ^ (k[..., 2] * _HASH_P3)
    return (h & jnp.uint32(capacity - 1)).astype(jnp.int32)


def _claim_rows(keys: jnp.ndarray) -> jnp.ndarray:
    """[M, PTAB_DIM] rows a new key writes when claiming an empty slot:
    key, occupied=1, is_plane=0."""
    m = keys.shape[0]
    return jnp.concatenate(
        [
            keys,
            jnp.ones((m, 1), dtype=jnp.int32),
            jnp.zeros((m, 1), dtype=jnp.int32),
        ],
        axis=-1,
    )


def _probe_find(
    ptab: jnp.ndarray,      # [C, PTAB_DIM] int32
    keys: jnp.ndarray,      # [N, 3]
    cfg: MapConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Vectorized linear-probe lookup: ONE wide row gather over all probe
    offsets (key/occ/is_plane ride in the same row).  Returns
    (slot, found, empty_slot, has_empty, is_plane); missing entries are
    ``capacity`` (out of range -> scatter-dropped / gather-filled)."""
    C = cfg.capacity
    h0 = _hash(keys, C)
    offs = jnp.arange(cfg.probe, dtype=jnp.int32)
    idx = (h0[:, None] + offs[None, :]) & (C - 1)      # [N, probe]
    rows = ptab[idx]                                    # [N, probe, PTAB_DIM]
    occ_at = rows[..., _T_OCC] > 0
    match = occ_at & jnp.all(rows[..., 0:3] == keys[:, None, :], axis=-1)
    # First match via a min-encoded score (offset<<1 | is_plane) instead
    # of argmax + two take_along_axis gathers: one reduce recovers the
    # winning offset AND its plane flag, and the slot is recomputed from
    # the offset arithmetically.  Probed keys are unique within a chain,
    # so the lowest-offset match is THE match.
    big = 2 * cfg.probe
    isp_at = (rows[..., _T_PLANE] > 0).astype(jnp.int32)
    score = jnp.where(match, 2 * offs[None, :] + isp_at, big)
    m = jnp.min(score, axis=-1)
    found = m < big
    slot = jnp.where(found, (h0 + (m >> 1)) & (C - 1), C)
    isp = ((m & 1) == 1) & found
    is_empty = ~occ_at
    escore = jnp.where(is_empty, offs[None, :], cfg.probe)
    em = jnp.min(escore, axis=-1)
    has_empty = em < cfg.probe
    empty = jnp.where(has_empty, (h0 + em) & (C - 1), C)
    return slot, found, empty, has_empty, isp


def _probe_find_flat(
    ptab_flat: jnp.ndarray,  # [L*C, PTAB_DIM] int32
    keys: jnp.ndarray,       # [M, 3]
    lvl: jnp.ndarray,        # [M] level index per key
    cfg: MapConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Probe all levels' subtables in one flattened row-gather series.

    Global slot index = level * capacity + local slot; misses return
    ``levels * capacity`` (one past the flattened table, for drop/fill)."""
    C = cfg.capacity
    miss = cfg.levels * C
    base = lvl * C
    h0 = _hash(keys, C)
    offs = jnp.arange(cfg.probe, dtype=jnp.int32)
    idx = base[:, None] + ((h0[:, None] + offs[None, :]) & (C - 1))  # [M, probe]
    rows = ptab_flat[idx]                               # [M, probe, PTAB_DIM]
    occ_at = rows[..., _T_OCC] > 0
    match = occ_at & jnp.all(rows[..., 0:3] == keys[:, None, :], axis=-1)
    # Min-encoded first-match selection (see _probe_find).
    big = 2 * cfg.probe
    isp_at = (rows[..., _T_PLANE] > 0).astype(jnp.int32)
    score = jnp.where(match, 2 * offs[None, :] + isp_at, big)
    m = jnp.min(score, axis=-1)
    found = m < big
    slot = jnp.where(found, base + ((h0 + (m >> 1)) & (C - 1)), miss)
    isp = ((m & 1) == 1) & found
    is_empty = ~occ_at
    escore = jnp.where(is_empty, offs[None, :], cfg.probe)
    em = jnp.min(escore, axis=-1)
    has_empty = em < cfg.probe
    empty = jnp.where(has_empty, base + ((h0 + em) & (C - 1)), miss)
    return slot, found, empty, has_empty, isp


def _find_or_insert_flat(
    ptab_flat: jnp.ndarray,
    keys: jnp.ndarray,
    lvl: jnp.ndarray,
    active: jnp.ndarray,
    cfg: MapConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flattened-table version of _find_or_insert (same claim-round logic)."""
    miss = cfg.levels * cfg.capacity
    slot = jnp.full((keys.shape[0],), miss, dtype=jnp.int32)
    resolved = jnp.zeros((keys.shape[0],), dtype=bool)
    claim = _claim_rows(keys)
    for _ in range(cfg.insert_rounds):
        s, found, empty, has_empty, _ = _probe_find_flat(ptab_flat, keys, lvl, cfg)
        newly = active & ~resolved & found
        slot = jnp.where(newly, s, slot)
        resolved = resolved | newly
        want = active & ~resolved & has_empty
        claim_idx = jnp.where(want, empty, miss)
        ptab_flat = ptab_flat.at[claim_idx].set(claim, mode="drop")
    s, found, _, _, _ = _probe_find_flat(ptab_flat, keys, lvl, cfg)
    newly = active & ~resolved & found
    slot = jnp.where(newly, s, slot)
    resolved = resolved | newly
    return ptab_flat, slot, resolved & active


def _find_or_insert(
    ptab: jnp.ndarray,
    keys: jnp.ndarray,
    active: jnp.ndarray,
    cfg: MapConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Find each key's slot, claiming empty slots for new keys.

    Scatter-claim rounds: every unresolved active key writes its probe row
    (key, occ=1, is_plane=0) into its first empty probe slot; a re-probe then
    confirms which writer won.  Losers retry (the slot is now occupied so
    probing walks past it).  Unresolved keys after ``insert_rounds`` are
    dropped (resolved=False) — the bounded analog of the reference's
    unbounded heap growth.

    Returns (ptab, slot, resolved).
    """
    C = cfg.capacity
    slot = jnp.full((keys.shape[0],), C, dtype=jnp.int32)
    resolved = jnp.zeros((keys.shape[0],), dtype=bool)
    claim = _claim_rows(keys)
    for _ in range(cfg.insert_rounds):
        s, found, empty, has_empty, _ = _probe_find(ptab, keys, cfg)
        newly = active & ~resolved & found
        slot = jnp.where(newly, s, slot)
        resolved = resolved | newly
        # Claim empties for still-unresolved keys.
        want = active & ~resolved & has_empty
        claim_idx = jnp.where(want, empty, C)
        ptab = ptab.at[claim_idx].set(claim, mode="drop")
    # Final probe after the last claim round.
    s, found, _, _, _ = _probe_find(ptab, keys, cfg)
    newly = active & ~resolved & found
    slot = jnp.where(newly, s, slot)
    resolved = resolved | newly
    return ptab, slot, resolved & active


def compact_order(mask_f: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Stable mask compaction: order[i] = source row of the i-th valid row,
    or N (out of range) for unfilled slots.  One cumsum + one scatter."""
    n = mask_f.shape[0]
    pos = jnp.cumsum(mask_f.astype(jnp.int32)) - 1
    tgt = jnp.where(mask_f & (pos < cap), pos, cap)
    return jnp.full((cap,), n, dtype=jnp.int32).at[tgt].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )


def insert_points(
    vm: VoxelMap,
    cfg: MapConfig,
    p_w: jnp.ndarray,   # [N, 3] world points
    var: jnp.ndarray,   # [N, 3, 3] world-frame point covariance
    mask: jnp.ndarray,  # [N] validity
) -> VoxelMap:
    """Insert a batch of points into all levels and refit touched planes.

    Semantics parity with UpdateVoxelMap + UpdateOctoTree + init_octo_tree
    (voxel_map.cc:119-241, 336-361): accumulate, first-fit once a voxel holds
    more than layer_init_num points, refit every update_size_threshold new
    points, freeze (stop updating) at max_points_num points.  Also the
    BuildVoxelMap first-frame path (voxel_map.cc:287-334) — same operation
    with the full first scan.

    All levels are processed in ONE flattened batch (global slot index =
    level * capacity + local slot): a single probe/claim series, a single
    moment scatter, and a single budgeted refit instead of per-level ops —
    the per-level python loop tripled the kernel count for no benefit.
    """
    L, C, N = cfg.levels, cfg.capacity, p_w.shape[0]
    miss = L * C

    keys_l = [voxel_key(p_w, level_size(cfg, lvl)) for lvl in range(cfg.levels)]
    keys = jnp.concatenate(keys_l, axis=0)                # [L*N, 3]
    lvl_ids = jnp.repeat(jnp.arange(L, dtype=jnp.int32), N)
    mask_f = jnp.tile(mask, L)

    ptab_flat = vm.ptab
    ptab_flat, slot, ok = _find_or_insert_flat(
        ptab_flat, keys, lvl_ids, mask_f, cfg
    )
    return _insert_finish(
        vm, cfg, ptab_flat,
        jnp.tile(p_w, (L, 1)), jnp.tile(var, (L, 1, 1)),
        keys, lvl_ids, slot, ok,
        ocnt_inc=_ocnt_inc(claim=jnp.sum((mask_f & ~ok).astype(jnp.int32))),
    )


class GatedRows(NamedTuple):
    """Ancestor-gated, compacted (point, level) insert rows.

    Produced by gated_insert_rows from the match phase's own-chain probe;
    consumed by resolve_insert_rows (slot claim) and _insert_finish.
    ``order`` indexes the flattened [L*N] (level-major) candidate layout;
    padded rows carry order == L*N, mask False."""

    order: jnp.ndarray   # [R] source row in the [L*N] layout (L*N = padded)
    pidx: jnp.ndarray    # [R] owning point index (clamped for padding)
    keys: jnp.ndarray    # [R, 3] voxel keys
    lvl: jnp.ndarray     # [R] level ids
    mask: jnp.ndarray    # [R] row validity
    found: jnp.ndarray   # [R] match-probe hit (slot already known)
    slot0: jnp.ndarray   # [R] global flat slot for found rows (miss else)
    need: jnp.ndarray    # [R] valid rows that need a claim (new voxels)
    n_gated: jnp.ndarray  # [] int32: gate survivors before compaction


def gated_insert_rows(
    cfg: MapConfig,
    mask: jnp.ndarray,       # [N]
    own_keys: jnp.ndarray,   # [L, N, 3]
    own_slot: jnp.ndarray,   # [L, N]
    own_found: jnp.ndarray,  # [L, N]
    own_plane: jnp.ndarray,  # [L, N]
) -> GatedRows:
    """Ancestor gate + row compaction (the reference's UpdateOctoTree
    descent stopping at the first plane node, voxel_map.cc:185-241);
    see insert_points_hinted for the full semantics discussion."""
    L, N = own_found.shape
    miss = L * cfg.capacity
    mask_f = jnp.tile(mask, L)
    found_f = own_found.reshape(L * N) & mask_f

    elig = jnp.ones((N,), dtype=bool)
    gates = []
    for lvl in range(L):
        gates.append(elig)
        elig = elig & own_found[lvl] & ~own_plane[lvl]
    gate_f = jnp.concatenate(gates) & mask_f                # [L*N]
    R = cfg.insert_row_cap
    order = compact_order(gate_f, R)                        # [R]
    pidx = jnp.minimum(order % N, N - 1)                    # point per row
    # One packed [L*N, 7] row gather instead of five scalar-column gathers
    # (each gather is its own kernel on launch-taxed targets): key(3),
    # lvl, gate, found, slot.  Fill rows read 0 -> gate/found False, and
    # slot0 resolves to miss below regardless of the slot column.
    cols = jnp.concatenate(
        [
            own_keys.reshape(L * N, 3),
            jnp.repeat(jnp.arange(L, dtype=jnp.int32), N)[:, None],
            gate_f.astype(jnp.int32)[:, None],
            found_f.astype(jnp.int32)[:, None],
            own_slot.reshape(L * N, 1),
        ],
        axis=1,
    )
    rows7 = cols.at[order].get(mode="fill", fill_value=0)   # [R, 7]
    keys_r = rows7[:, 0:3]
    lvl_r = rows7[:, 3]
    mask_r = rows7[:, 4] > 0
    found_r = rows7[:, 5] > 0
    slot0 = jnp.where(found_r & mask_r, rows7[:, 6], miss)
    need = mask_r & ~found_r
    return GatedRows(
        order=order, pidx=pidx, keys=keys_r, lvl=lvl_r, mask=mask_r,
        found=found_r, slot0=slot0, need=need,
        n_gated=jnp.sum(gate_f.astype(jnp.int32)),
    )


def resolve_insert_rows(
    ptab_flat: jnp.ndarray, cfg: MapConfig, rows: GatedRows
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Slot resolution for gated rows: probe-hit rows keep their match-phase
    slot; new keys claim via the compacted fast path (insert_new_cap rows)
    with a full-width fallback under lax.cond.  Returns (ptab, slot, ok)."""
    miss = cfg.levels * cfg.capacity
    cap = cfg.insert_new_cap

    def fast(pt):
        o2 = compact_order(rows.need, cap)
        packed = jnp.concatenate(
            [
                rows.keys,
                rows.lvl[:, None],
                rows.need.astype(jnp.int32)[:, None],
            ],
            axis=1,
        ).at[o2].get(mode="fill", fill_value=0)             # [cap, 5]
        pt, slot_c, ok_c = _find_or_insert_flat(
            pt, packed[:, 0:3], packed[:, 3], packed[:, 4] > 0, cfg
        )
        slot = rows.slot0.at[o2].set(jnp.where(ok_c, slot_c, miss), mode="drop")
        return pt, slot, slot < miss

    def slow(pt):
        pt, slot_c, ok_c = _find_or_insert_flat(
            pt, rows.keys, rows.lvl, rows.need, cfg
        )
        slot = jnp.where(ok_c, slot_c, rows.slot0)
        return pt, slot, slot < miss

    n_new = jnp.sum(rows.need.astype(jnp.int32))
    return jax.lax.cond(n_new <= cap, fast, slow, ptab_flat)


def insert_packed_rows_hinted(
    vm: VoxelMap,
    cfg: MapConfig,
    rows: GatedRows,
    mom_rows: jnp.ndarray,   # [R, MOM12_DIM] precomputed packed m1/m2
    moms_rows: jnp.ndarray,  # [R, MOMS_DIM] precomputed packed s0/s1/s2
) -> VoxelMap:
    """insert_points_hinted's gated path with the per-row moment math
    precomputed (one Pallas launch, ops/pallas/insert_rows.py) instead of
    rebuilt from (p_w, var) in XLA.  Identical semantics; equivalence:
    tests/test_insert_rows_pallas.py."""
    ptab_flat, slot, ok = resolve_insert_rows(vm.ptab, cfg, rows)
    return _insert_finish(
        vm, cfg, ptab_flat, None, None, rows.keys, rows.lvl, slot, ok,
        ocnt_inc=_ocnt_inc(
            rowcap=jnp.maximum(0, rows.n_gated - cfg.insert_row_cap),
            claim=jnp.sum((rows.mask & ~ok).astype(jnp.int32)),
        ),
        packed_rows=(mom_rows, moms_rows),
    )


def insert_points_hinted(
    vm: VoxelMap,
    cfg: MapConfig,
    p_w: jnp.ndarray,      # [N, 3] world points (post-update poses)
    var: jnp.ndarray,      # [N, 3, 3]
    mask: jnp.ndarray,     # [N]
    own_keys: jnp.ndarray,   # [L, N, 3] keys probed by the match phase
    own_slot: jnp.ndarray,   # [L, N] global flat slots from the match probe
    own_found: jnp.ndarray,  # [L, N]
    own_plane: jnp.ndarray = None,  # [L, N] is_plane from the match probe
) -> VoxelMap:
    """insert_points reusing the match phase's probe of the same table.

    The deferred pipeline probes each point's own-voxel chain during the
    match phase and the table is not mutated until insertion, so those
    (slot, found, is_plane) results are still valid — re-probing all L*N
    keys is the single most expensive part of insertion and is skipped
    entirely here.  Only keys the match probe missed (new voxels) enter a
    claim path, which is compacted to ``cfg.insert_new_cap`` rows when the
    new-key count fits (the steady-state case) and falls back to the full
    claim series under ``lax.cond`` otherwise (map bootstrap / new-area
    bursts).

    With ``cfg.insert_row_cap > 0`` (and ``own_plane`` given), child-level
    rows are **ancestor-gated**: a point inserts at level l only while every
    ancestor voxel exists and is not itself a plane — the reference's
    UpdateOctoTree recursion stops at the first plane node exactly like
    this (voxel_map.cc:185-241), whereas ungated simultaneous insertion
    (module docstring deviation 3) pays ~L times the scatter rows to keep
    child statistics that matching can never reach while the parent stays
    planar.  Surviving rows are compacted to insert_row_cap (level-0 rows
    compact first, so under overflow only child rows drop; they refit on a
    later scan).  Scatter cost on this target scales with row count, so in
    planar steady state this cuts the insert phase's scatter rows ~3x.

    Deviation (documented in docs/PARITY.md): voxel assignment uses the
    match phase's keys, i.e. world points at the *predicted* per-bucket
    poses rather than post-update poses — the same mm-level approximation
    the deferred match already makes; only boundary-straddling points can
    land one voxel over, and moments stay consistent with the chosen
    voxel's center.
    """
    L, C, N = cfg.levels, cfg.capacity, p_w.shape[0]
    miss = L * C
    cap = cfg.insert_new_cap
    ptab_flat = vm.ptab

    if cfg.insert_row_cap and own_plane is not None:
        rows = gated_insert_rows(
            cfg, mask, own_keys, own_slot, own_found, own_plane
        )
        ptab_flat, slot, ok = resolve_insert_rows(ptab_flat, cfg, rows)
        p_w_r = p_w[rows.pidx]
        var_r = var[rows.pidx]
        return _insert_finish(
            vm, cfg, ptab_flat, p_w_r, var_r, rows.keys, rows.lvl, slot, ok,
            ocnt_inc=_ocnt_inc(
                rowcap=jnp.maximum(0, rows.n_gated - cfg.insert_row_cap),
                claim=jnp.sum((rows.mask & ~ok).astype(jnp.int32)),
            ),
        )

    keys = own_keys.reshape(L * N, 3)
    lvl_ids = jnp.repeat(jnp.arange(L, dtype=jnp.int32), N)
    mask_f = jnp.tile(mask, L)
    found_f = own_found.reshape(L * N) & mask_f
    slot0 = jnp.where(found_f, own_slot.reshape(L * N), miss)
    need = mask_f & ~found_f
    n_new = jnp.sum(need.astype(jnp.int32))

    def fast(pt):
        order = compact_order(need, cap)                   # [cap]
        k_c = keys.at[order].get(mode="fill", fill_value=0)
        lvl_c = lvl_ids.at[order].get(mode="fill", fill_value=0)
        act_c = need.at[order].get(mode="fill", fill_value=False)
        pt, slot_c, ok_c = _find_or_insert_flat(pt, k_c, lvl_c, act_c, cfg)
        slot = slot0.at[order].set(
            jnp.where(ok_c, slot_c, miss), mode="drop"
        )
        return pt, slot, slot < miss

    def slow(pt):
        return _find_or_insert_flat(pt, keys, lvl_ids, mask_f, cfg)

    ptab_flat, slot, ok = jax.lax.cond(n_new <= cap, fast, slow, ptab_flat)
    return _insert_finish(
        vm, cfg, ptab_flat,
        jnp.tile(p_w, (L, 1)), jnp.tile(var, (L, 1, 1)),
        keys, lvl_ids, slot, ok,
        ocnt_inc=_ocnt_inc(claim=jnp.sum((mask_f & ~ok).astype(jnp.int32))),
    )


def _insert_finish(
    vm: VoxelMap,
    cfg: MapConfig,
    ptab_flat: jnp.ndarray,
    p_w_rows: jnp.ndarray,  # [R, 3] world point per insert row
    var_rows: jnp.ndarray,  # [R, 3, 3] world-frame covariance per insert row
    keys: jnp.ndarray,     # [R, 3] voxel keys (defines centers for moments)
    lvl_ids: jnp.ndarray,  # [R]
    slot: jnp.ndarray,     # [R] resolved global slots (miss = dropped)
    ok: jnp.ndarray,       # [R]
    ocnt_inc: jnp.ndarray = None,  # [3] int32 caller-side overflow counts
    packed_rows: Tuple[jnp.ndarray, jnp.ndarray] = None,
) -> VoxelMap:
    """Moment accumulation, threshold logic, and budgeted refit —
    everything in insert_points after slot resolution.  Rows are
    (point, level) pairs; callers may pre-compact them (insert_row_cap).
    With ``packed_rows`` = (mom_rows [R, MOM12_DIM], moms_rows
    [R, MOMS_DIM]) the per-row moment math is skipped (precomputed by the
    Pallas insert kernel) and p_w_rows/var_rows may be None.

    Compute runs in the meta/compute dtype; the mom/plane tables may be
    narrower (MapConfig.storage_dtype) — accumulation happens at storage
    precision, refit math upcasts."""
    dtype = vm.meta.dtype
    L, C = cfg.levels, cfg.capacity
    R = keys.shape[0]
    miss = L * C

    meta_flat = vm.meta
    mom_flat = vm.mom
    moms_flat = vm.moms
    plane_flat = vm.plane
    # Contribution gating: frozen slots (n >= max_points_num) stop
    # accumulating (update_enable_, voxel_map.cc:199-204).
    meta_at = meta_flat.at[slot].get(mode="fill", fill_value=0.0)
    contrib = ok & (meta_at[:, _M_N] < float(cfg.max_points_num))
    tgt = jnp.where(contrib, slot, miss)

    if packed_rows is not None:
        mom_rows, moms_rows = packed_rows
    else:
        sizes = jnp.asarray(
            [level_size(cfg, l) for l in range(cfg.levels)], dtype=dtype
        )[lvl_ids]
        vc = (keys.astype(dtype) + 0.5) * sizes[:, None]   # [R, 3]
        p_rel = p_w_rows - vc
        mom_rows, moms_rows = _pack_moments(point_moments(p_rel, var_rows))

    counts = jnp.zeros((R, META_DIM), dtype=dtype)
    counts = counts.at[:, _M_N].set(1.0).at[:, _M_NEW].set(1.0)
    meta_flat = meta_flat.at[tgt].add(counts, mode="drop")
    mom_flat = mom_flat.at[tgt].add(mom_rows, mode="drop")
    moms_flat = moms_flat.at[tgt].add(
        moms_rows.astype(moms_flat.dtype), mode="drop"
    )

    # Identify slots whose thresholds were crossed.
    meta_t = meta_flat.at[tgt].get(mode="fill", fill_value=0.0)
    n_t = meta_t[:, _M_N]
    init_t = meta_t[:, _M_INIT] > 0.5
    init_thresh = jnp.asarray(cfg.init_num, dtype=dtype)[lvl_ids]
    refit = (
        contrib
        & (n_t > init_thresh)
        & (~init_t | (meta_t[:, _M_NEW] > float(cfg.update_size_threshold)))
    )

    # No freeze writeback needed: the flag is derived from n (above), so the
    # reference's per-insert update_enable_ store (voxel_map.cc:199-203) has
    # no stored analog here.

    # Compact refit candidates to <= refit_budget unique slots: one sort to
    # group duplicates, then a short prefix-sum + scatter to pack the unique
    # slot ids to the front.  (Variants measured on-target: two sorts
    # 10.5 ms insert phase, refit-all-without-dedup 12.6 ms, per-table-slot
    # flag + 196k cumsum 11.4 ms; this form keeps the single cheap sort —
    # docs/PERF_NOTES.md.)  Slots beyond the budget keep accumulating new_n
    # and refit on a later call — graceful degradation, no loss.
    cand = jnp.where(refit, tgt, miss)
    srt = jnp.sort(cand)
    first = jnp.concatenate([jnp.ones((1,), dtype=bool), srt[1:] != srt[:-1]])
    first = first & (srt < miss)
    pos = jnp.cumsum(first.astype(jnp.int32)) - 1
    pos_t = jnp.where(first & (pos < cfg.refit_budget), pos, cfg.refit_budget)
    fs = jnp.full((cfg.refit_budget,), miss, dtype=jnp.int32).at[pos_t].set(
        srt, mode="drop"
    )

    meta_r = meta_flat.at[fs].get(mode="fill", fill_value=0.0)
    mom_r = jnp.concatenate(
        [
            mom_flat.at[fs].get(mode="fill", fill_value=0.0),
            moms_flat.at[fs].get(mode="fill", fill_value=0.0).astype(dtype),
        ],
        axis=-1,
    )
    if cfg.use_pallas_refit and cfg.refit_budget % 128 == 0:
        # One-launch fit kernel over transposed rows — folds the ~380 XLA
        # entry instructions of fit_planes into a single dispatch
        # (docs/PERF_NOTES.md; equivalence: tests/test_plane_fit_pallas.py).
        from ..ops.pallas.plane_fit_rows import fit_rows_call

        par = jnp.zeros((1, 8), dtype=dtype).at[0, 0].set(cfg.planer_threshold)
        out = fit_rows_call(
            par, mom_r.T, meta_r.T,
            interpret=jax.default_backend() == "cpu",
        )
        plane_rows = out[0:PLANE_DIM].T
        meta_fit = out[PLANE_DIM : PLANE_DIM + META_DIM].T
    else:
        n_r = jnp.maximum(meta_r[:, _M_N], 1.0)
        fit = fit_planes(
            _unpack_moments(mom_r[:, :MOM12_DIM], mom_r[:, MOM12_DIM:], n_r),
            cfg.planer_threshold,
        )
        plane_rows = jnp.concatenate(
            [
                fit.center_rel,
                fit.normal,
                fit.evals,
                fit.radius[:, None],
                fit.plane_var.reshape(-1, 36)[:, list(_TRIU36)],
            ],
            axis=-1,
        )
        meta_fit = jnp.stack(
            [
                meta_r[:, _M_N],
                jnp.zeros_like(meta_r[:, _M_N]),      # new_n reset
                jnp.ones_like(meta_r[:, _M_N]),       # initialized
                fit.is_plane.astype(dtype),
            ],
            axis=-1,
        )
    if plane_flat.dtype != plane_rows.dtype:
        # Degenerate scatters (lam_min ~= lam_mid) make plane_var entries
        # ~1/(n*eps)^2 — finite in f32, but inf after an f16 downcast, and
        # one inf row poisons every later sigma_l it touches.  Saturating
        # at the storage dtype's max keeps the semantics ("uncertainty so
        # large the 3-sigma gate never passes") without the poison.
        fmax = float(jnp.finfo(plane_flat.dtype).max)
        plane_rows = jnp.clip(plane_rows, -fmax, fmax)
    plane_flat = plane_flat.at[fs].set(
        plane_rows.astype(plane_flat.dtype), mode="drop"
    )
    meta_flat = meta_flat.at[fs].set(meta_fit, mode="drop")
    # Mirror is_plane into the probe rows (match-phase source of truth).
    ptab_flat = ptab_flat.at[fs, _T_PLANE].set(
        (meta_fit[:, _M_PLANE] > 0.5).astype(jnp.int32), mode="drop"
    )

    n_refit_unique = jnp.sum(first.astype(jnp.int32))
    inc = _ocnt_inc(
        refit=jnp.maximum(0, n_refit_unique - cfg.refit_budget)
    )
    if ocnt_inc is not None:
        inc = inc + ocnt_inc
    return vm._replace(
        ptab=ptab_flat,
        meta=meta_flat,
        mom=mom_flat,
        moms=moms_flat,
        plane=plane_flat,
        ocnt=vm.ocnt + inc,
    )


def match_points(
    vm: VoxelMap,
    cfg: MapConfig,
    p_w: jnp.ndarray,   # [N, 3]
    var: jnp.ndarray,   # [N, 3, 3]
    mask: jnp.ndarray,  # [N]
) -> MatchResult:
    """Point-to-plane association for a batch of world points.

    Own-voxel chain first; points that fail fall back to the adjacent-voxel
    chain (the intended semantics of the neighbor retry at KILO.cc:156-178,
    with the unit mixup fixed — see module docstring).

    All 2 x levels candidates are probed/gathered/gated in ONE flattened
    batch; only the tiny chain-eligibility/selection logic runs per level.
    """
    dtype = vm.meta.dtype
    L, C, N = cfg.levels, cfg.capacity, p_w.shape[0]
    miss = L * C

    keys_all, lvl_all = [], []
    for chain in range(2):
        for lvl in range(cfg.levels):
            size = level_size(cfg, lvl)
            keys = voxel_key(p_w, size)
            if chain == 1:
                vc = (keys.astype(dtype) + 0.5) * size
                rel = p_w - vc
                quarter = size / 4.0
                off = (rel > quarter).astype(jnp.int32) - (
                    rel < -quarter
                ).astype(jnp.int32)
                keys = keys + off
            keys_all.append(keys)
            lvl_all.append(jnp.full((N,), lvl, dtype=jnp.int32))
    keys_f = jnp.concatenate(keys_all, axis=0)           # [2L*N, 3]
    lvl_f = jnp.concatenate(lvl_all, axis=0)

    slot, found, _, _, is_plane = _probe_find_flat(vm.ptab, keys_f, lvl_f, cfg)

    plane_at = vm.plane.at[slot].get(
        mode="fill", fill_value=0.0
    ).astype(dtype)

    sizes = jnp.asarray(
        [level_size(cfg, l) for l in range(cfg.levels)], dtype=dtype
    )[lvl_f]
    vc_f = (keys_f.astype(dtype) + 0.5) * sizes[:, None]
    center = vc_f + plane_at[:, 0:3]
    normal = plane_at[:, 3:6]
    radius = plane_at[:, 9]
    plane_var = _expand_pv(plane_at[:, 10:31])

    p_rep = jnp.tile(p_w, (2 * L, 1))
    var_rep = jnp.tile(var, (2 * L, 1, 1))
    rel = p_rep - center
    signed_dist = jnp.sum(normal * rel, axis=-1)
    dist = jnp.abs(signed_dist)
    d2c = jnp.sum(rel * rel, axis=-1)
    range_dis2 = jnp.maximum(d2c - dist * dist, 0.0)
    gate_range = range_dis2 <= (cfg.radius_k * radius) ** 2

    # sigma_l = J_nq plane_var J_nq^T + n^T var n  (voxel_map.cc:383-386).
    # The plane_var quadratic form is PSD in exact arithmetic; clamp at 0 so
    # reduced-precision storage error cannot make sigma_l negative (a
    # negative sigma_l gates the plane unmatchable forever).
    j_nq = jnp.concatenate([rel, -normal], axis=-1)
    sigma_l = jnp.maximum(
        jnp.einsum("...i,...ij,...j->...", j_nq, plane_var, j_nq), 0.0
    )
    sigma_l = sigma_l + jnp.einsum("...i,...ij,...j->...", normal, var_rep, normal)
    sigma_l = jnp.maximum(sigma_l, 1e-12)
    gate_sigma = dist < cfg.sigma_num * jnp.sqrt(sigma_l)
    prob = jax.lax.rsqrt(sigma_l) * jnp.exp(-0.5 * dist * dist / sigma_l)
    ok = found & is_plane & gate_range & gate_sigma

    # Per-chain selection: level l is reachable only while every ancestor
    # exists and is not itself a plane (build_single_residual recursion,
    # voxel_map.cc:371-427); best plane by probability.
    def r2(x, c, l):
        return x[(c * L + l) * N : (c * L + l + 1) * N]

    results = []
    for chain in range(2):
        best_prob = jnp.full((N,), -jnp.inf, dtype=dtype)
        b_matched = jnp.zeros((N,), dtype=bool)
        b_idx = jnp.zeros((N,), dtype=jnp.int32)  # flat candidate row index
        reachable = jnp.ones((N,), dtype=bool)
        rows0 = jnp.arange(N, dtype=jnp.int32)
        for lvl in range(cfg.levels):
            okl = r2(ok, chain, lvl) & reachable
            probl = r2(prob, chain, lvl)
            better = okl & (probl > best_prob)
            best_prob = jnp.where(better, probl, best_prob)
            b_matched = b_matched | okl
            b_idx = jnp.where(better, (chain * L + lvl) * N + rows0, b_idx)
            reachable = reachable & r2(found, chain, lvl) & ~r2(is_plane, chain, lvl)
        results.append((b_matched, b_idx))

    (m_own, i_own), (m_nbr, i_nbr) = results
    use_nbr = ~m_own & m_nbr
    matched = (m_own | m_nbr) & mask
    idx = jnp.where(use_nbr, i_nbr, i_own)
    return MatchResult(
        matched=matched,
        normal=normal[idx],
        center=center[idx],
        plane_var=plane_var[idx],
        signed_dist=signed_dist[idx],
        own_keys=keys_f[: L * N].reshape(L, N, 3),
        own_slot=slot[: L * N].reshape(L, N),
        own_found=found[: L * N].reshape(L, N),
        own_plane=is_plane[: L * N].reshape(L, N),
    )


def slide_map(vm: VoxelMap, cfg: MapConfig, position: jnp.ndarray, half_map_size: int) -> VoxelMap:
    """Drop voxels outside a box around the current position.

    Parity: mapSliding/clearMemOutOfMap (voxel_map.cc:552-594).  With a
    fixed-capacity table "delete" is just clearing occupancy + stats; slots
    are reused by later inserts.  The distance-threshold trigger lives with
    the caller (filter.py), matching the reference's position_last_ logic.
    """
    C = cfg.capacity
    center = jnp.stack(
        [
            jnp.floor(position / level_size(cfg, lvl)).astype(jnp.int32)
            for lvl in range(cfg.levels)
        ]
    )                                                       # [L, 3]
    halves = jnp.asarray(
        [int(half_map_size * (2 ** lvl)) for lvl in range(cfg.levels)],
        jnp.int32,
    )
    center_f = jnp.repeat(center, C, axis=0)                # [L*C, 3]
    half_f = jnp.repeat(halves, C)                          # [L*C]
    delta = vm.key - center_f
    inside = jnp.all(jnp.abs(delta) <= half_f[:, None], axis=-1)
    keep = vm.occ & inside
    kf = keep.astype(vm.meta.dtype)[..., None]
    ks = keep.astype(vm.moms.dtype)[..., None]
    return vm._replace(
        ptab=vm.ptab * keep.astype(jnp.int32)[..., None],
        meta=vm.meta * kf,
        mom=vm.mom * kf,
        moms=vm.moms * ks,
        plane=vm.plane * ks.astype(vm.plane.dtype),
    )
