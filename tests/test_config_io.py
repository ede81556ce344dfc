"""Run-dir config persistence (configs/presets.py): exact round trip
and forward-compatible loading (unknown keys from a different build
must not break restore)."""

import json

from vqvae_tpu.configs import get_config, load_config, save_config
from vqvae_tpu.configs.presets import config_from_json, config_to_json


def test_config_json_round_trip_exact():
    for name in ("tiny", "vctk-multi", "stretch"):
        cfg = get_config(name)
        assert config_from_json(config_to_json(cfg)) == cfg


def test_save_load_config(tmp_path):
    d = str(tmp_path)
    cfg = get_config("tiny")
    save_config(cfg, d)
    assert load_config(d) == cfg
    assert load_config(str(tmp_path / "nope")) is None


def test_config_load_ignores_unknown_fields():
    cfg = get_config("tiny")
    d = json.loads(config_to_json(cfg))
    d["model"]["future_knob"] = 42          # from a newer build
    d["train"]["another_one"] = "x"
    back = config_from_json(json.dumps(d))
    assert back == cfg
