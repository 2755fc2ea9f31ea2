"""Config-system parity tests (reference utils.py:42-84, 193-201, and the
inline self-check at utils.py:204-224)."""

import json
import os
import types

from vdiff_tpu.utils.config import dict2str, fill_with_defaults, update_config

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "vdiff_tpu", "configs")


def test_fill_with_defaults_reference_example():
    config = {"a": None, "b": {"c": 1, "d": None}}
    defaults = {"a": 2, "b": {"c": 3, "d": 4, "e": 5}, "f": 6}
    fill_with_defaults(config, defaults)
    assert config == {"a": 2, "b": {"c": 1, "d": 4, "e": 5}, "f": 6}


def test_fill_with_defaults_null_section():
    """An explicit JSON null for a whole dict-valued section counts as unset
    (regression: setdefault returned the existing None and the recursion
    crashed on None.get)."""
    config = {"train": None}
    defaults = {"train": {"lr": 1e-4, "epochs": 10}}
    fill_with_defaults(config, defaults)
    assert config == {"train": {"lr": 1e-4, "epochs": 10}}


def test_update_config_cli_precedence():
    old = {"lr": 1e-4}
    args = types.SimpleNamespace(lr=3e-4)
    assert update_config("lr", old_config=old, new_config=args) == 3e-4
    assert old["lr"] == 3e-4


def test_update_config_none_falls_back():
    old = {"lr": 1e-4}
    args = types.SimpleNamespace(lr=None)
    assert update_config("lr", old_config=old, new_config=args) == 1e-4


def test_update_config_or_flag_rule():
    """A False store_true CLI flag must fall back to the config value."""
    old = {"use_ema": True}
    args = types.SimpleNamespace(use_ema=False)
    assert update_config("use_ema", old_config=old, new_config=args, logical_op="OR") is True
    args = types.SimpleNamespace(use_ema=True)
    old = {"use_ema": False}
    assert update_config("use_ema", old_config=old, new_config=args, logical_op="OR") is True


def test_update_config_renamed_key():
    old = {"root": "~/datasets"}
    args = types.SimpleNamespace(data_root="/tmp/x")
    assert update_config("root", "data_root", old_config=old, new_config=args) == "/tmp/x"


def test_dict2str():
    assert dict2str({"a": 1, "b": [2, 3], "c": 0.001}) == "a_1_b_2_3_c_1e-03"


def test_shipped_configs_parse_and_merge():
    with open(os.path.join(CONFIG_DIR, "defaults.json")) as f:
        defaults = json.load(f)
    assert "epochs" in defaults["train"]  # reference wart ("epoch") fixed
    for name in ("cifar10_uncond.json", "cifar10_cond.json", "celeba.json", "mnist.json"):
        with open(os.path.join(CONFIG_DIR, name)) as f:
            cfg = json.load(f)
        fill_with_defaults(cfg, defaults)
        assert cfg["diffusion"]["logsnr_schedule"] in {"linear", "sigmoid", "cosine", "legacy"}
        assert cfg["train"]["batch_size"] > 0
