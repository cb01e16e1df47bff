import pytest

from alphadia_tpu.config import Config, load_default_config
from alphadia_tpu.exceptions import KeyAddedConfigError, TypeMismatchConfigError


def test_default_config_loads():
    cfg = load_default_config()
    assert cfg["search"]["target_ms2_tolerance"] == 10
    assert cfg["version"] is not None
    assert cfg.get_path("fdr.fdr") == 0.01


def test_layered_update_and_provenance():
    cfg = load_default_config()
    cfg.update_layer({"search": {"target_ms2_tolerance": 15}}, name="user")
    cfg.update_layer({"search": {"target_ms1_tolerance": 3}}, name="cli")
    assert cfg["search"]["target_ms2_tolerance"] == 15
    assert cfg["search"]["target_ms1_tolerance"] == 3
    summary = cfg.modified_summary()
    assert "user" in summary and "cli" in summary


def test_unknown_key_rejected():
    cfg = load_default_config()
    with pytest.raises(KeyAddedConfigError):
        cfg.update_layer({"search": {"not_a_key": 1}}, name="user")


def test_type_mismatch_rejected():
    cfg = load_default_config()
    with pytest.raises(TypeMismatchConfigError):
        cfg.update_layer({"search": {"target_ms2_tolerance": "ten"}}, name="user")
    # int -> float widening allowed
    cfg.update_layer({"search": {"target_ms2_tolerance": 10.5}}, name="user")
    # None assignment allowed
    cfg.update_layer({"library_path": "/tmp/lib.hdf"}, name="cli")


def test_yaml_roundtrip(tmp_path):
    cfg = load_default_config()
    cfg.update_layer({"search": {"target_ms2_tolerance": 7}}, name="u")
    p = tmp_path / "frozen_config.yaml"
    cfg.to_yaml(p)
    cfg2 = Config.from_yaml(p)
    assert cfg2["search"]["target_ms2_tolerance"] == 7


def test_set_path():
    cfg = load_default_config()
    cfg.set_path("search.target_rt_tolerance", 100.0)
    assert cfg.get_path("search.target_rt_tolerance") == 100.0
    with pytest.raises(KeyAddedConfigError):
        cfg.set_path("search.zzz", 1)
