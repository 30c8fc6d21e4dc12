"""Config loading: reference-format YAMLs parse into the typed Config."""

import os

import pytest

pytestmark = pytest.mark.smoke  # <5-min pre-commit tier

from councilx.config import Config, load_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.mark.parametrize("name", [
    "galsses_council_folder.yaml",      # reference's real filename (typo kept)
    "male2female_council_folder.yaml",
    "anime2face_council_folder.yaml",
    "smoke_tiny.yaml",
    "galsses_council_scheduled.yaml",   # loss-weight schedule dicts
])
def test_shipped_configs_load(name):
    cfg = load_config(os.path.join(CONFIG_DIR, name))
    assert cfg.council.council_size >= 1
    assert cfg.gen.dim > 0
    assert cfg.data.crop_image_height > 0


def test_scheduled_config_parses_schedules():
    cfg = load_config(os.path.join(CONFIG_DIR,
                                   "galsses_council_scheduled.yaml"))
    assert set(cfg.loss_schedules) == {"council_w", "mask_total_w"}
    s = cfg.loss_schedules["council_w"]
    assert (s.base, s.start_at_iter, s.warmup_iters) == (0.2, 10000, 10000)
    assert abs(float(s.value(15000)) - 0.1) < 1e-6      # mid-warmup
    m = cfg.loss_schedules["mask_total_w"]
    assert m.anneal == "cosine"
    assert abs(float(m.value(10 ** 6)) - 0.00125) < 1e-9
    # base lands in the typed field so term pruning still works
    assert cfg.council.council_w == 0.2


def test_reference_flat_and_nested_keys():
    raw = {
        "council_size": 3,
        "council_w": 0.5,
        "numberOfCouncil_dis_relative_iteration": 2,
        "gen": {"dim": 16, "style_dim": 4},
        "new_size": 100,
        "crop_image_height": 96,
        "crop_image_width": 96,
    }
    cfg = Config.from_dict(raw)
    assert cfg.council.council_size == 3
    assert cfg.council.council_dis_relative_iteration == 2
    assert cfg.gen.dim == 16
    assert cfg.data.new_size == 100

    nested = {"council": {"council_size": 3, "council_w": 0.5}}
    cfg2 = Config.from_dict(nested)
    assert cfg2.council.council_size == 3


def test_unknown_keys_preserved():
    cfg = Config.from_dict({"my_custom_flag": 42})
    assert cfg.extras["my_custom_flag"] == 42
    assert cfg.to_dict()["my_custom_flag"] == 42


def test_validation():
    with pytest.raises(ValueError):
        Config.from_dict({"council": {"council_size": 0}})
    with pytest.raises(ValueError):
        Config.from_dict({"dis": {"gan_type": "wgan"}})
    with pytest.raises(ValueError):
        Config.from_dict({"do_a2b": False, "do_b2a": False})
