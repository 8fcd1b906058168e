import json

import pytest

from levelgan.config import PRESET_NAMES, Config, load_config, preset


def test_presets_cover_baseline_configs():
    # the five BASELINE.json configs plus the track-family extras
    assert set(PRESET_NAMES) >= {"toy_dcgan_16", "wgan_gp_32", "gumbel_64",
                                 "conditional_32", "curriculum_16"}
    p1 = preset("toy_dcgan_16")
    assert (p1.model.level_size, p1.train.batch_size, p1.train.steps) == (16, 64, 100)
    assert p1.train.loss == "gan"
    p2 = preset("wgan_gp_32")
    assert p2.model.level_size == 32 and p2.train.loss == "wgan_gp"
    p3 = preset("gumbel_64")
    assert p3.model.level_size == 64 and p3.model.head == "gumbel"
    p4 = preset("conditional_32")
    assert p4.model.cond_dim > 0
    p5 = preset("curriculum_16")
    assert p5.curriculum.rollout_steps > 0
    p6 = preset("wgan_gp_32_structural")
    assert p6.model.structural_head == "spatial"
    assert p6.model.head == "gumbel" and p6.train.w_presence > 0


def test_roundtrip_json():
    cfg = preset("wgan_gp_32")
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg == cfg2


def test_override():
    cfg = preset("toy_dcgan_16").override(**{
        "train.steps": "500", "model.use_pallas": "true", "train.lr_g": 1e-3})
    assert cfg.train.steps == 500 and cfg.model.use_pallas is True
    assert cfg.train.lr_g == 1e-3
    with pytest.raises(KeyError):
        cfg.override(**{"train.nope": 1})


def test_load_config_file(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(preset("gumbel_64").to_dict()))
    cfg = load_config(str(p), overrides={"train.steps": 7})
    assert cfg.model.level_size == 64 and cfg.train.steps == 7


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        Config.from_dict({"model": {"bogus": 1}})
    with pytest.raises(KeyError):
        preset("nope")


def test_curriculum_16_joint_preset_is_f7():
    """The measured joint operating point (BASELINE.md round-4 frontier,
    arm f7) ships as a named preset (round 5)."""
    p = preset("curriculum_16_joint")
    assert p.train.loss == "curriculum" and p.train.w_presence == 10.0
    c = p.curriculum
    assert (c.cell_credit, c.w_solvable, c.solvable_target,
            c.gap_on_solvable, c.w_gap) == (True, 2.0, 0.9, True, 5.0)


def test_export_policy_config_validation():
    with pytest.raises(ValueError):
        preset("wgan_gp_32").override(**{"io.export_repair": "maybe"})
    with pytest.raises(ValueError):
        preset("wgan_gp_32").override(
            **{"io.export_repair_placement": "center"})
    with pytest.raises(ValueError):
        preset("wgan_gp_32").override(**{"io.export_exactly_one": "bogus"})


def test_resolve_export_policy():
    from levelgan.api import resolve_export_policy

    tile = preset("wgan_gp_32")
    track = preset("racetrack_32")
    # auto: tile repair OFF, track repair ON
    assert resolve_export_policy(tile) == (False, "confidence", False)
    assert resolve_export_policy(track)[0] is True
    # explicit args override config
    assert resolve_export_policy(tile, True, "uniform") == \
        (True, "uniform", True)          # exactly_one auto-on with repair
    assert resolve_export_policy(tile, True, "uniform", False) == \
        (True, "uniform", False)
    # config policy flows through when args are None
    on = tile.override(**{"io.export_repair": "on",
                          "io.export_repair_placement": "uniform"})
    assert resolve_export_policy(on) == (True, "uniform", True)
    off = on.override(**{"io.export_exactly_one": "off"})
    assert resolve_export_policy(off) == (True, "uniform", False)
