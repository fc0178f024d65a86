"""Config system: reference-schema loading, defaults, validation."""

import pytest

from legkilo_tpu import config as config_mod


def test_reference_yaml_loads_verbatim():
    """The reference repo's own config files must load unchanged."""
    cfg = config_mod.load("/root/reference/legkilo/config/leg_fusion.yaml")
    assert cfg.only_imu_use is False
    assert cfg.redundancy is True
    assert cfg.lidar.lidar_type == 1
    assert cfg.lidar.filter_num == 3
    assert cfg.voxel_map.voxel_size == 0.5
    assert cfg.voxel_map.max_layer == 2
    assert cfg.voxel_map.layer_init_num[:3] == [5, 5, 5]
    assert cfg.eskf.imu_acc_process_cov == 500
    assert cfg.eskf.lidar_point_meas_ratio == 10
    assert cfg.kinematics.leg_offset_x == 0.1881
    assert cfg.extrinsic_T == [0.0, 0.0, 0.20]


def test_all_four_reference_presets_load():
    for name in ("leg_fusion", "diter", "nclt", "hilti"):
        ref = config_mod.load(f"/root/reference/legkilo/config/{name}.yaml")
        ours = config_mod.load(f"configs/{name}.yaml")
        # Key filter/map parameters agree between the reference preset and
        # our shipped preset.
        assert ref.lidar.lidar_type == ours.lidar.lidar_type, name
        assert ref.lidar.time_scale == ours.lidar.time_scale, name
        assert ref.only_imu_use == ours.only_imu_use, name
        assert ref.eskf.imu_acc_meas_noise == ours.eskf.imu_acc_meas_noise, name
        assert ref.extrinsic_R == [float(x) for x in ours.extrinsic_R] or \
               ref.extrinsic_R == ours.extrinsic_R, name


def test_tpu_keys(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "tpu_max_buckets: 32\ntpu_pipeline: deferred\ntpu_use_pallas: true\n"
        "tpu_map_capacity_log2: 12\ntpu_map_insert_rounds: 3\n"
        "tpu_insert_cap: 4096\ntpu_match_cap: 2048\n"
    )
    cfg = config_mod.load(str(p))
    assert cfg.tpu.max_buckets == 32
    assert cfg.tpu.pipeline == "deferred"
    assert cfg.tpu.use_pallas is True
    assert cfg.voxel_map.capacity_log2 == 12
    assert cfg.voxel_map.insert_rounds == 3
    assert cfg.tpu.insert_cap == 4096
    assert cfg.tpu.match_cap == 2048


def test_unknown_keys_warn_not_fail(tmp_path, caplog):
    p = tmp_path / "c.yaml"
    p.write_text("definitely_not_a_key: 1\nvoxel_size: 0.4\n")
    cfg = config_mod.load(str(p))
    assert cfg.voxel_map.voxel_size == 0.4


def test_validation_errors(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("lidar_type: 9\n")
    with pytest.raises(ValueError):
        config_mod.load(str(p))
    p.write_text("extrinsic_R: [1, 0, 0]\n")
    with pytest.raises(ValueError):
        config_mod.load(str(p))
    p.write_text("max_layer: 7\n")
    with pytest.raises(ValueError):
        config_mod.load(str(p))


def test_flat_parser_fallback(tmp_path, monkeypatch):
    """The minimal parser handles the schema when pyyaml is unavailable."""
    monkeypatch.setattr(config_mod, "_HAVE_YAML", False)
    p = tmp_path / "c.yaml"
    p.write_text(
        "# comment\nvoxel_size: 0.5\nonly_imu_use: true\n"
        "time_scale: 1e-6\nextrinsic_T: [0.0, 0.1, 0.2]\n"
    )
    cfg = config_mod.load(str(p))
    assert cfg.voxel_map.voxel_size == 0.5
    assert cfg.only_imu_use is True
    assert cfg.lidar.time_scale == 1e-6
    assert cfg.extrinsic_T == [0.0, 0.1, 0.2]


def test_package_defaults_full_matmul_precision():
    """Importing the package must opt the process into full-precision f32
    matmuls: TPU's 'default' bf16 truncation inflates trajectory ATE ~38x
    (docs/PERF_NOTES.md "Matmul precision")."""
    import jax

    import legkilo_tpu  # noqa: F401 (import side effect under test)

    assert jax.config.jax_default_matmul_precision == "highest"
