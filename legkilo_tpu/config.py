"""Flat-key YAML configuration, schema-compatible with the reference.

The reference reads ~45 flat YAML keys through YamlHelper
(/root/reference/legkilo/src/common/yaml_helper.hpp) from configs like
legkilo/config/leg_fusion.yaml.  We keep the exact key names so reference
config files load unchanged, and validate them into typed dataclasses.

TPU-specific keys (all optional, prefixed ``tpu_``) control static shapes of
the compiled rollout: bucket/point padding, hash-table capacities, dtype.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

try:
    import yaml  # type: ignore

    _HAVE_YAML = True
except Exception:  # pragma: no cover - pyyaml is available in this image
    _HAVE_YAML = False


@dataclasses.dataclass
class EskfConfig:
    """Noise/cov parameters (ESKF::Config, eskf.h:49-65)."""

    vel_process_cov: float = 20.0
    imu_acc_process_cov: float = 500.0
    imu_gyr_process_cov: float = 1000.0
    contact_process_cov: float = 20.0
    acc_bias_process_cov: float = 0.001
    gyr_bias_process_cov: float = 0.001
    kin_bias_process_cov: float = 0.001

    imu_acc_meas_noise: float = 0.1
    imu_acc_z_meas_noise: float = 1.0
    imu_gyr_meas_noise: float = 0.01
    kin_meas_noise: float = 0.1
    chd_meas_noise: float = 0.1
    contact_meas_noise: float = 0.001
    lidar_point_meas_ratio: float = 10.0


@dataclasses.dataclass
class VoxelMapConfig:
    """Voxel-map parameters (VoxelMapConfig, voxel_map.h:41-57)."""

    max_layer: int = 2
    voxel_size: float = 0.5
    min_eigen_value: float = 0.01  # "planner_threshold" in the reference
    sigma_num: float = 3.0
    beam_err: float = 0.2
    dept_err: float = 0.04
    layer_init_num: List[int] = dataclasses.field(default_factory=lambda: [5, 5, 5, 5, 5])
    max_points_num: int = 50
    map_sliding_en: bool = False
    half_map_size: int = 100
    sliding_thresh: float = 8.0
    pub_plane_en: bool = False

    # TPU-native: per-level hash table capacity (power of two), probe depth,
    # and scatter-claim rounds for batched insertion.
    capacity_log2: int = 16
    probe_length: int = 8
    insert_rounds: int = 6
    # Compacted claim-path width for probe-reusing insertion (new keys per
    # scan in steady state are few; bursts fall back to the full series).
    insert_new_cap: int = 512
    # >0: ancestor-gated insert rows compacted to this many (point, level)
    # pairs — child levels only accumulate while every ancestor exists and
    # is not a plane, matching the reference's UpdateOctoTree descent
    # (voxel_map.cc:185-241).  0 keeps ungated all-level insertion.
    insert_row_cap: int = 0
    # Max plane refits per insert call; slots beyond the budget keep
    # accumulating new_n and refit on a later scan (graceful degradation).
    refit_budget: int = 2048
    # Storage dtype for the two big float tables (mom 69 + plane 31 floats
    # per slot): "f32" | "f16" | "bf16".  Reduced precision halves the
    # map's HBM footprint — the fleet replicas-per-chip limiter
    # (docs/PERF_NOTES.md fleet table).  Moments are voxel-center-relative
    # (bounded magnitudes) so f16 accumulation stays mm-accurate; refit
    # math always runs in the compute dtype.
    storage_dtype: str = "f32"


@dataclasses.dataclass
class KinematicsConfig:
    """Leg geometry + contact thresholds (Kinematics::Config, kinematics.h:27-35)."""

    leg_offset_x: float = 0.1881
    leg_offset_y: float = 0.04675
    leg_calf_length: float = 0.213
    leg_thigh_length: float = 0.213
    leg_thigh_offset: float = 0.08
    contact_force_threshold_up: float = 220.0
    contact_force_threshold_down: float = 200.0


@dataclasses.dataclass
class LidarConfig:
    """LiDAR decode parameters (LidarProcessing::Config, lidar_processing.h:74-90)."""

    lidar_type: int = 1  # 1=velodyne, 2=ouster, 3=hesai (sensor_types.hpp:34)
    time_scale: float = 1.0
    blind: float = 1.5
    filter_num: int = 3
    point_stamp_correct: bool = True
    voxel_grid_resolution: float = 0.3


@dataclasses.dataclass
class TpuConfig:
    """Static-shape / compilation knobs (no reference equivalent)."""

    max_buckets: int = 64          # padded 2ms time-buckets per scan
    max_points_per_bucket: int = 128
    max_imu_per_bucket: int = 4    # padded IMU/kin event slots preceding a bucket
    requantize_buckets: bool = True  # snap post-downsample times back to 2ms grid
    # Time-bucket size in ms.  2.0 matches the reference's hardcoded quantum
    # (lidar_processing.cc:48); coarser buckets trade per-bucket update rate
    # for a shorter sequential ESKF chain (fewer lax.scan steps per scan).
    bucket_quantum_ms: float = 2.0
    use_native: bool = True        # use native/libscanprep.so when built
    pipeline: str = "sequential"   # "sequential" (reference-faithful) | "deferred"
    use_pallas: bool = False       # deferred mode: fused Pallas ESKF chain
    use_pallas_match: bool = False  # deferred mode: Pallas match kernels
    use_pallas_refit: bool = False  # insert phase: one-launch refit kernel
    use_pallas_insert: bool = False  # insert phase: one-launch moment rows
    use_pallas_pose: bool = False   # deferred mode: one-launch pose predictor
    # Deferred mode: compact valid rows to this count before the match /
    # insert phases (0 = off).  Exact as long as the cap covers every valid
    # point per scan; see core/filter.py StaticConfig.
    insert_cap: int = 0
    match_cap: int = 0
    # Deferred-mode chain implementation ("fused" all-elementwise | "jax"
    # direct ops) and lax.scan unroll factor; see core/filter.py.
    chain_impl: str = "fused"
    chain_unroll: int = 1
    # Fused pipeline: reuse the match-phase table probe for insertion.
    insert_reuse_probe: bool = True
    # Deferred-mode per-bucket match-pose prediction: "imu" (IMU-event-
    # propagated, robust to aggressive gait) | "const_vel" (constant-
    # velocity extrapolation); see core/filter.py StaticConfig.
    match_pose: str = "imu"
    # Deferred-mode matching passes per scan (iterated-EKF outer loop);
    # 2 recovers sequential-quality association at the dynamics-envelope
    # edge for ~2x the match/chain cost.  See core/filter.py.
    match_iters: int = 1
    # Auto-escalating iterated matching (streaming runner only): when the
    # match rate stays below `escalate_ratio` for `escalate_after`
    # consecutive scans, the runner switches the deferred pipeline onto a
    # match_iters=`match_iters_escalated` variant with no operator action,
    # falling back after `deescalate_after` consecutive scans above
    # `escalate_ratio` + 0.1.  The TPU-native analog of the reference's
    # per-bucket in-scan feedback (KILO.cc:108-233, 373-395), which
    # self-corrects association within a scan and needs no knob.
    # The ratio is deliberately well above the 20% hard-collapse alarm:
    # envelope-edge divergence is SOFT — association quality rots at
    # 35-60% match rate without ever collapsing (measured on the
    # +-0.3 rad @ 4 Hz extreme sim) — and a false escalation merely costs
    # ~+20% latency per extra pass, while a missed one costs the
    # trajectory.  escalate_after=0 disables.
    # Escalation is STICKY by default (deescalate_after=0 = never release):
    # on the extreme-envelope sim, de-escalating after the rate recovered
    # let drift re-accrue faster than the trigger could catch it
    # (0.15 m -> 3.8 m within 15 scans, measured), because by then the map
    # holds wrongly-placed voxels and re-escalation cannot re-associate.
    # Set deescalate_after>0 only for workloads with known transient
    # stressors.
    match_iters_escalated: int = 3
    escalate_ratio: float = 0.65
    escalate_after: int = 3
    deescalate_after: int = 0
    # Sensor-gap recovery: a packet whose clock rebase exceeds this many
    # seconds triggers a soft reset (keep pose/biases, zero velocity,
    # realign clocks, inflate covariance) instead of mean-propagating the
    # whole gap with stale latched rates.  0 disables (reference-faithful
    # behavior: no guard).  See core/filter.py soft_reset_carry.
    gap_reset_s: float = 10.0
    # Host-feed pipelining (the PP analog of the reference's producer/
    # consumer threads, ros_interface.cc:125-172): keep up to this many
    # dispatched-but-unmaterialized scans in flight so host packet build /
    # upload of scan k+1 overlaps device compute of scan k.  0 = fully
    # synchronous (materialize every scan before the next dispatch).
    pipeline_depth: int = 2
    dtype: str = "float32"
    # Re-symmetrize the covariance once per scan (P <- (P+P^T)/2).  The
    # Joseph-free downdate P -= KHP (eskf.cc:91-145) is run ~50x per scan;
    # in f32 the accumulated asymmetry is measurable over minutes-long runs
    # (tools/longrun_stability.py; docs/PERF_NOTES.md "Long-horizon f32
    # stability").  One 30x30 transpose-add per scan is free.
    symmetrize_cov: bool = True


@dataclasses.dataclass
class Config:
    """Top-level config mirroring the flat YAML schema."""

    # Topics (used by the bag reader)
    lidar_topic: str = "/points_raw"
    imu_topic: str = "/imu_raw"
    kinematic_topic: str = "/high_state"

    # Mode switches (options.{h,cc})
    only_imu_use: bool = True
    redundancy: bool = True

    # Initialization
    init_time: float = 0.05
    gravity: float = 9.81

    # Extrinsics (IMU <- LiDAR)
    extrinsic_T: List[float] = dataclasses.field(default_factory=lambda: [0.0, 0.0, 0.2])
    extrinsic_R: List[float] = dataclasses.field(
        default_factory=lambda: [1, 0, 0, 0, 1, 0, 0, 0, 1]
    )

    eskf: EskfConfig = dataclasses.field(default_factory=EskfConfig)
    voxel_map: VoxelMapConfig = dataclasses.field(default_factory=VoxelMapConfig)
    kinematics: KinematicsConfig = dataclasses.field(default_factory=KinematicsConfig)
    lidar: LidarConfig = dataclasses.field(default_factory=LidarConfig)
    tpu: TpuConfig = dataclasses.field(default_factory=TpuConfig)

    # Output options
    save_traj_enable: bool = False
    save_pcd_enable: bool = False
    pcd_frames_per_file: int = 100
    pcd_voxel_leaf_size: float = 0.1
    pub_joint_tf_enable: bool = False

    # Saturation (present in reference configs; reserved)
    satu_acc: float = 35.0
    satu_gyr: float = 30.0


_ESKF_KEYS = {f.name for f in dataclasses.fields(EskfConfig)}
_KIN_KEYS = {f.name for f in dataclasses.fields(KinematicsConfig)}
_LIDAR_KEYS = {f.name for f in dataclasses.fields(LidarConfig)}
_VOXEL_KEY_MAP = {
    "max_layer": "max_layer",
    "voxel_size": "voxel_size",
    "min_eigen_value": "min_eigen_value",
    "sigma_num": "sigma_num",
    "beam_err": "beam_err",
    "dept_err": "dept_err",
    "layer_init_num": "layer_init_num",
    "max_points_num": "max_points_num",
    "map_sliding_en": "map_sliding_en",
    "half_map_size": "half_map_size",
    "sliding_thresh": "sliding_thresh",
    "pub_plane_en": "pub_plane_en",
    "tpu_map_capacity_log2": "capacity_log2",
    "tpu_map_probe_length": "probe_length",
    "tpu_map_insert_rounds": "insert_rounds",
    "tpu_map_insert_new_cap": "insert_new_cap",
    "tpu_map_insert_row_cap": "insert_row_cap",
    "tpu_map_refit_budget": "refit_budget",
    "tpu_map_storage_dtype": "storage_dtype",
}
_TPU_KEY_MAP = {
    "tpu_max_buckets": "max_buckets",
    "tpu_max_points_per_bucket": "max_points_per_bucket",
    "tpu_max_imu_per_bucket": "max_imu_per_bucket",
    "tpu_requantize_buckets": "requantize_buckets",
    "tpu_bucket_quantum_ms": "bucket_quantum_ms",
    "tpu_use_native": "use_native",
    "tpu_pipeline": "pipeline",
    "tpu_use_pallas": "use_pallas",
    "tpu_use_pallas_match": "use_pallas_match",
    "tpu_use_pallas_refit": "use_pallas_refit",
    "tpu_use_pallas_insert": "use_pallas_insert",
    "tpu_use_pallas_pose": "use_pallas_pose",
    "tpu_insert_cap": "insert_cap",
    "tpu_match_cap": "match_cap",
    "tpu_chain_impl": "chain_impl",
    "tpu_chain_unroll": "chain_unroll",
    "tpu_insert_reuse_probe": "insert_reuse_probe",
    "tpu_match_pose": "match_pose",
    "tpu_match_iters": "match_iters",
    "tpu_match_iters_escalated": "match_iters_escalated",
    "tpu_escalate_ratio": "escalate_ratio",
    "tpu_escalate_after": "escalate_after",
    "tpu_deescalate_after": "deescalate_after",
    "tpu_symmetrize_cov": "symmetrize_cov",
    "tpu_gap_reset_s": "gap_reset_s",
    "tpu_pipeline_depth": "pipeline_depth",
    "tpu_dtype": "dtype",
}


def _coerce(value: Any, target: Any) -> Any:
    if isinstance(target, bool):
        if isinstance(value, str):
            return value.strip().lower() in ("true", "1", "yes", "on")
        return bool(value)
    if isinstance(target, int) and not isinstance(target, bool):
        return int(value)
    if isinstance(target, float):
        return float(value)
    return value


def from_dict(flat: Dict[str, Any]) -> Config:
    """Build a Config from a flat key->value dict (the YAML layout)."""
    cfg = Config()
    unknown = []
    for key, value in flat.items():
        if key in _ESKF_KEYS:
            setattr(cfg.eskf, key, _coerce(value, getattr(cfg.eskf, key)))
        elif key in _KIN_KEYS:
            setattr(cfg.kinematics, key, _coerce(value, getattr(cfg.kinematics, key)))
        elif key in _LIDAR_KEYS:
            setattr(cfg.lidar, key, _coerce(value, getattr(cfg.lidar, key)))
        elif key in _VOXEL_KEY_MAP:
            attr = _VOXEL_KEY_MAP[key]
            setattr(cfg.voxel_map, attr, _coerce(value, getattr(cfg.voxel_map, attr)))
        elif key in _TPU_KEY_MAP:
            attr = _TPU_KEY_MAP[key]
            setattr(cfg.tpu, attr, _coerce(value, getattr(cfg.tpu, attr)))
        elif hasattr(cfg, key):
            setattr(cfg, key, _coerce(value, getattr(cfg, key)))
        else:
            unknown.append(key)
    if unknown:
        import logging

        logging.getLogger(__name__).warning("Unknown config keys ignored: %s", unknown)
    validate(cfg)
    return cfg


def load(path: str) -> Config:
    """Load a reference-format YAML config file.

    Parity: YamlHelper (yaml_helper.hpp:27-69) — flat keys, with defaults for
    missing optional keys and errors for malformed values.
    """
    if _HAVE_YAML:
        with open(path, "r") as f:
            flat = yaml.safe_load(f) or {}
    else:
        flat = _parse_flat_yaml(path)
    if not isinstance(flat, dict):
        raise ValueError(f"Config file {path} did not parse to a mapping")
    return from_dict(flat)


def _parse_flat_yaml(path: str) -> Dict[str, Any]:
    """Minimal flat YAML parser fallback (scalars and [a, b, c] lists)."""
    out: Dict[str, Any] = {}
    with open(path, "r") as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, raw = line.partition(":")
            raw = raw.strip()
            if not raw:
                continue
            out[key.strip()] = _parse_scalar(raw)
    return out


def _parse_scalar(raw: str) -> Any:
    if raw.startswith("[") and raw.endswith("]"):
        return [_parse_scalar(x.strip()) for x in raw[1:-1].split(",") if x.strip()]
    low = raw.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        if any(c in raw for c in ".eE") and not raw.isdigit():
            return float(raw)
        return int(raw)
    except ValueError:
        return raw.strip("'\"")


def validate(cfg: Config) -> None:
    vm = cfg.voxel_map
    if vm.max_layer < 0 or vm.max_layer > 4:
        raise ValueError(f"max_layer must be in [0, 4], got {vm.max_layer}")
    if len(vm.layer_init_num) < vm.max_layer + 1:
        raise ValueError("layer_init_num must have at least max_layer+1 entries")
    if vm.voxel_size <= 0:
        raise ValueError("voxel_size must be positive")
    if not isinstance(vm.capacity_log2, int) or not 4 <= vm.capacity_log2 <= 26:
        raise ValueError(
            f"capacity_log2 must be an int in [4, 26], got {vm.capacity_log2!r}"
        )
    if not isinstance(vm.probe_length, int) or vm.probe_length < 1:
        raise ValueError(f"probe_length must be a positive int, got {vm.probe_length!r}")
    if len(cfg.extrinsic_R) != 9 or len(cfg.extrinsic_T) != 3:
        raise ValueError("extrinsic_R must have 9 entries and extrinsic_T 3")
    if cfg.lidar.lidar_type not in (1, 2, 3):
        raise ValueError(f"lidar_type must be 1|2|3, got {cfg.lidar.lidar_type}")
    if cfg.lidar.filter_num < 1:
        raise ValueError("filter_num must be >= 1")
