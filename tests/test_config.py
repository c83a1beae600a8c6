import json

from ttsx.core.config import (
    TTSXConfig, RefinerConfig, S4Config, load_config, save_config, to_dict,
    from_dict)


def test_roundtrip_json(tmp_path):
    cfg = TTSXConfig()
    p = tmp_path / "cfg.json"
    save_config(cfg, p)
    cfg2 = load_config(p)
    assert cfg2 == cfg


def test_roundtrip_yaml(tmp_path):
    cfg = TTSXConfig()
    p = tmp_path / "cfg.yaml"
    save_config(cfg, p)
    cfg2 = load_config(p)
    assert cfg2 == cfg


def test_refiner_band_validation():
    import pytest
    with pytest.raises(ValueError):
        RefinerConfig(bands=(10, 10), cnf_dim=80)


def test_nested_override():
    d = to_dict(TTSXConfig())
    d["prosody"]["s4"]["heads"] = 8
    cfg = from_dict(TTSXConfig, d)
    assert cfg.prosody.s4.heads == 8
    assert isinstance(cfg.refiner.bands, tuple)


def test_configs_hashable():
    hash(TTSXConfig())
    hash(S4Config())
