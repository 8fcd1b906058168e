"""Integration tier (SURVEY.md §4.2): end-to-end api.train + CLIs."""

import json
import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # fast tier: pytest -m 'not slow'

from levelgan.api import generate, train
from levelgan.cli.export import main as export_main
from levelgan.cli.train import main as train_main
from levelgan.config import preset

TINY = {
    "model.base_channels": 16, "model.critic_base_channels": 16,
    "model.latent_dim": 16, "model.group_size": 8,
    "train.batch_size": 8, "data.corpus_size": 64,
    "io.log_every": 2, "io.ckpt_every": 4,
}


def test_train_e2e_and_resume(tmp_path):
    cfg = preset("toy_dcgan_16").override(
        **TINY, **{"train.steps": 6, "io.out_dir": str(tmp_path)})
    res = train(cfg, echo=False)
    assert os.path.exists(res["checkpoint"])
    assert np.isfinite(res["metrics"]["d_loss"])
    assert np.isfinite(res["kl"])

    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[-1]["step"] == 6 and "kl" in lines[-1]

    # fault-recovery semantics: resume from latest and continue to 8
    cfg2 = cfg.override(**{"train.steps": 8, "io.resume": "auto"})
    res2 = train(cfg2, echo=False)
    assert int(np.asarray(res2["state"].step)) == 8


def test_determinism_same_seed(tmp_path):
    outs = []
    for d in ("a", "b"):
        cfg = preset("toy_dcgan_16").override(
            **TINY, **{"train.steps": 4, "io.out_dir": str(tmp_path / d)})
        res = train(cfg, echo=False)
        outs.append(jax.device_get(res["state"].generator))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), outs[0], outs[1])


def test_generate_and_export_cli(tmp_path):
    cfg = preset("toy_dcgan_16").override(
        **TINY, **{"train.steps": 2, "io.out_dir": str(tmp_path)})
    res = train(cfg, echo=False)

    levels = generate(cfg, res["state"].generator, 10, batch_size=4)
    assert levels.shape == (10, 16, 16) and levels.dtype == np.uint8
    assert (levels < cfg.model.n_tiles).all()

    out = str(tmp_path / "levels.npz")
    export_main(["--ckpt", res["checkpoint"], "--n", "6", "--out", out,
                 "--batch", "4"])
    assert np.load(out)["levels"].shape == (6, 16, 16)

    txt = str(tmp_path / "levels.txt")
    export_main(["--ckpt", res["checkpoint"], "--n", "2", "--out", txt,
                 "--batch", "2"])
    assert len(open(txt).read().splitlines()) >= 32


def test_train_cli(tmp_path):
    rc = train_main([
        "--preset", "toy_dcgan_16", "--out", str(tmp_path),
        "--set", "train.steps=2", "--set", "train.batch_size=8",
        "--set", "model.base_channels=16", "--set", "model.group_size=8",
        "--set", "model.latent_dim=16", "--set", "data.corpus_size=32",
        "--set", "io.log_every=1", "--set", "io.ckpt_every=10"])
    assert rc == 0
    assert os.path.exists(tmp_path / "ckpt" / "step_00000002")


def test_train_cli_bad_set():
    with pytest.raises(SystemExit):
        train_main(["--set", "nonsense"])


def test_export_cli_cond_validation(tmp_path):
    cfg = preset("conditional_32").override(
        **TINY, **{"train.steps": 1, "train.n_critic": 1,
                   "io.out_dir": str(tmp_path)})
    res = train(cfg, echo=False)
    with pytest.raises(SystemExit):
        export_main(["--ckpt", res["checkpoint"], "--n", "2",
                     "--out", str(tmp_path / "x.npz"), "--cond", "0.5"])
    export_main(["--ckpt", res["checkpoint"], "--n", "2", "--batch", "2",
                 "--out", str(tmp_path / "x.npz"),
                 "--cond", "0.3,0.05,0.05,0.4"])
    assert os.path.exists(tmp_path / "x.npz")


def test_bitpack_roundtrip_against_unpacked(tmp_path):
    """Packed export wire format: unpack(packed ids) == unpacked ids."""
    from levelgan.api import make_generate_fn, packed_bytes, tile_bits, unpack_levels

    cfg = preset("toy_dcgan_16").override(
        **TINY, **{"train.steps": 1, "io.out_dir": str(tmp_path)})
    res = train(cfg, echo=False)
    params = jax.device_get(res["state"].generator)

    key = jax.random.key(7)
    plain = np.asarray(make_generate_fn(cfg, 8, pack=False)(params, key))
    packed = np.asarray(make_generate_fn(cfg, 8, pack=True)(params, key))
    assert tile_bits(cfg.model.n_tiles) == 3  # 8-tile vocabulary
    assert packed.shape == (8, packed_bytes(cfg.model))
    np.testing.assert_array_equal(
        unpack_levels(packed, cfg.model.level_size), plain)


def test_unpack_levels_pure():
    """Host unpack inverts the documented bit-plane layout for all widths."""
    from levelgan.api import unpack_levels

    rng = np.random.default_rng(0)
    for bits in (1, 2, 3, 4, 7):
        ids = rng.integers(0, 2 ** bits, size=(3, 16 * 16)).astype(np.uint8)
        grp = ids.reshape(3, -1, 8)
        planes = [
            (((grp >> j) & 1) << np.arange(8, dtype=np.uint8)).sum(
                -1).astype(np.uint8)
            for j in range(bits)
        ]
        packed = np.stack(planes, axis=-1).reshape(3, -1)
        np.testing.assert_array_equal(
            unpack_levels(packed, 16), ids.reshape(3, 16, 16))
        # streaming form: unpack into a slice of a larger preallocated
        # (uninitialized) result — must assign, not OR into stale bytes
        big = np.full((5, 16, 16), 0xFF, np.uint8)
        ret = unpack_levels(packed, 16, out=big[1:4])
        np.testing.assert_array_equal(ret, ids.reshape(3, 16, 16))
        np.testing.assert_array_equal(big[1:4], ids.reshape(3, 16, 16))


def test_generate_streamed_chunks_match_single_pull(tmp_path):
    """generate() streams chunk unpacks into one preallocated array; a
    multi-chunk run with a ragged tail must equal the per-batch program
    outputs stitched together (same seed → same key split sequence)."""
    from levelgan.api import generate, make_generate_fn

    cfg = preset("toy_dcgan_16").override(
        **TINY, **{"train.steps": 1, "io.out_dir": str(tmp_path)})
    res = train(cfg, echo=False)
    params = jax.device_get(res["state"].generator)

    # batch 4, n 10: two full batches + tail program of 1 batch (12 rows
    # computed, 10 returned)
    out = generate(cfg, params, 10, seed=3, batch_size=4)
    assert out.shape == (10, 16, 16) and out.dtype == np.uint8
    assert out.max() < cfg.model.n_tiles

    # reference: replay generate()'s documented key schedule with the
    # single-batch program (nb_per_dispatch covers all 3 batches in one
    # block here, so one key drives the whole block's fori_loop)
    key = jax.random.key(3)
    _, sub = jax.random.split(key)
    keys = jax.random.split(sub, 3)
    gen_fn = make_generate_fn(cfg, 4, pack=True)
    from levelgan.api import unpack_levels
    chunks = [unpack_levels(np.asarray(gen_fn(params, keys[i])), 16)
              for i in range(3)]
    np.testing.assert_array_equal(out, np.concatenate(chunks)[:10])


def test_progress_gif_cli(tmp_path):
    """Training-progress GIF (SURVEY.md R12): one frame per checkpoint."""
    from levelgan.cli.progress_gif import main as gif_main

    cfg = preset("toy_dcgan_16").override(**TINY).override(
        **{"train.steps": 8, "train.steps_per_dispatch": 4,
           "io.ckpt_every": 4, "io.out_dir": str(tmp_path)})
    train(cfg, echo=False)

    out = str(tmp_path / "progress.gif")
    rc = gif_main([str(tmp_path), "--out", out, "--n", "4", "--cols", "2"])
    assert rc == 0
    produced = out if os.path.exists(out) else out + ".npz"  # PIL-less fallback
    assert os.path.exists(produced)
    if produced.endswith(".gif"):
        from PIL import Image
        with Image.open(produced) as im:
            assert getattr(im, "n_frames", 1) == 2  # ckpts at steps 4 and 8


def test_resume_cadence_fires_off_grid(tmp_path):
    """Periodic ckpt/log must fire on resumed runs whose start step is not a
    multiple of steps_per_dispatch (cadence = boundary crossing, not i%every)."""
    base = dict(TINY)
    base.pop("io.ckpt_every")
    cfg = preset("toy_dcgan_16").override(**base).override(
        **{"train.steps": 12, "train.steps_per_dispatch": 10,
           "io.ckpt_every": 10, "io.keep_ckpts": 0, "io.log_every": 10,
           "io.out_dir": str(tmp_path)})
    train(cfg, echo=False)  # tail chunk leaves final ckpt at step 12

    cfg2 = cfg.override(**{"train.steps": 42, "io.resume": "auto"})
    train(cfg2, echo=False)
    # resumed i takes 22, 32, 42: 10-boundaries crossed each dispatch
    have = sorted(os.listdir(tmp_path / "ckpt"))
    assert "step_00000022" in have and "step_00000032" in have, have
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    steps_logged = [l["step"] for l in lines]
    assert 22 in steps_logged and 32 in steps_logged and 42 in steps_logged
    # step_ms denominator is steps-this-session, not absolute step
    final = [l for l in lines if l["step"] == 42][-1]
    assert final["step_ms"] > 0


def test_print_config_round_trips_via_config_file(tmp_path, capsys):
    rc = train_main(["--preset", "wgan_gp_32", "--set", "train.steps=7",
                     "--print-config"])
    assert rc == 0
    dumped = capsys.readouterr().out
    path = tmp_path / "cfg.json"
    path.write_text(dumped)
    rc = train_main(["--config", str(path), "--print-config"])
    assert rc == 0
    again = json.loads(capsys.readouterr().out)
    assert again == json.loads(dumped)
    assert again["train"]["steps"] == 7


def test_compile_cache_persists_and_warms(tmp_path):
    """io.compile_cache: first run populates the persistent XLA cache dir;
    a second identical run starts from the warm cache (SURVEY.md §5.1
    ergonomics — first compile costs 20-40s through the dev relay)."""
    cache = tmp_path / "xla_cache"
    cfg = preset("toy_dcgan_16").override(
        **TINY, **{"train.steps": 2, "io.out_dir": str(tmp_path / "run1"),
                   "io.compile_cache": str(cache)})
    # the tiny test programs can compile in <1s (the enable() default
    # persistence threshold), which would leave the dir empty — persist
    # everything for this test; and drop the in-process executable cache,
    # which would otherwise satisfy the programs earlier tests already
    # compiled without touching the persistent cache at all
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.clear_caches()
    train(cfg, echo=False)
    entries = list(cache.rglob("*")) if cache.exists() else []
    assert entries, "compile cache dir was not populated"
    # warm re-run must succeed with the cache active (hit path exercised)
    cfg2 = cfg.override(**{"io.out_dir": str(tmp_path / "run2")})
    res = train(cfg2, echo=False)
    assert np.isfinite(res["kl"])
