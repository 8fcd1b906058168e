"""Failure-recovery tier (SURVEY.md §5.3): interrupted + resumed training is
EXACTLY equivalent to an uninterrupted run (params bit-match), because
per-step keys fold from (rng, step) and data sampling is stateless in
(seed, step)."""

import pytest

pytestmark = pytest.mark.slow  # fast tier: pytest -m 'not slow'
import jax
import numpy as np

from levelgan.api import train
from levelgan.config import preset

TINY = {
    "model.base_channels": 16, "model.critic_base_channels": 16,
    "model.latent_dim": 16, "model.group_size": 8,
    "train.batch_size": 8, "data.corpus_size": 64,
    "io.log_every": 100, "io.ckpt_every": 4,
}


def test_resume_bit_matches_uninterrupted(tmp_path):
    # uninterrupted: 8 steps
    cfg_full = preset("toy_dcgan_16").override(
        **TINY, **{"train.steps": 8, "io.out_dir": str(tmp_path / "full")})
    res_full = train(cfg_full, echo=False)

    # crashed at 4 (ckpt_every=4 wrote step_00000004), resume auto -> 8
    cfg_a = preset("toy_dcgan_16").override(
        **TINY, **{"train.steps": 4, "io.out_dir": str(tmp_path / "crash")})
    train(cfg_a, echo=False)
    cfg_b = cfg_a.override(**{"train.steps": 8, "io.resume": "auto"})
    res_resumed = train(cfg_b, echo=False)

    for field in ("generator", "discriminator"):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            getattr(res_full["state"], field),
            getattr(res_resumed["state"], field))


def test_torch_ckpt_exporter(tmp_path):
    import torch

    from tools.export_torch_ckpt import convert

    cfg = preset("toy_dcgan_16").override(
        **TINY, **{"train.steps": 2, "io.out_dir": str(tmp_path)})
    res = train(cfg, echo=False)
    out = str(tmp_path / "ckpt.pt")
    convert(res["checkpoint"], out)

    loaded = torch.load(out, weights_only=False)
    assert set(loaded) >= {"generator", "discriminator", "optim_g",
                           "optim_d", "step", "config"}
    assert loaded["step"] == 2
    assert loaded["config"]["model"]["level_size"] == 16
    # a G param tensor made it through with sane values
    leaf = loaded["generator"]["seed"]["kernel"]
    assert isinstance(leaf, torch.Tensor) and torch.isfinite(leaf).all()

    # ---- round trip: import the .pt back into a levelgan checkpoint ------
    from levelgan.lio.checkpoint import load_checkpoint
    from tools.import_torch_ckpt import convert as import_convert

    imported = import_convert(out, str(tmp_path / "imported"))
    from levelgan.api import make_state
    example = jax.device_get(make_state(cfg, jax.random.key(0)))
    orig, _ = load_checkpoint(res["checkpoint"], example)
    rt, _ = load_checkpoint(imported, example)
    assert int(np.asarray(rt.step)) == 2
    for field in ("generator", "discriminator", "opt_g", "opt_d"):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            getattr(orig, field), getattr(rt, field))

    # the imported checkpoint is trainable: resume continues from step 2
    cfg_resume = cfg.override(**{
        "train.steps": 4, "io.out_dir": str(tmp_path / "imported_run"),
        "io.resume": imported})
    res2 = train(cfg_resume, echo=False)
    assert int(np.asarray(res2["state"].step)) == 4


def test_torch_ckpt_roundtrip_projection_conditioning(tmp_path):
    """Interop is key-layout-generic: the projection critic's extra params
    (cond_embed, cond_proj) survive export->.pt->import bit-exactly."""
    import torch

    from levelgan.api import make_state
    from levelgan.lio.checkpoint import load_checkpoint
    from tools.export_torch_ckpt import convert
    from tools.import_torch_ckpt import convert as import_convert

    cfg = preset("conditional_32").override(
        **TINY, **{"train.steps": 2, "train.n_critic": 1,
                   "model.cond_mode": "projection",
                   "io.out_dir": str(tmp_path)})
    res = train(cfg, echo=False)
    out = str(tmp_path / "ckpt.pt")
    convert(res["checkpoint"], out)
    loaded = torch.load(out, weights_only=False)
    assert {"cond_embed", "cond_proj"} <= set(loaded["discriminator"])
    assert loaded["config"]["model"]["cond_mode"] == "projection"

    imported = import_convert(out, str(tmp_path / "imported"))
    example = jax.device_get(make_state(cfg, jax.random.key(0)))
    orig, _ = load_checkpoint(res["checkpoint"], example)
    rt, _ = load_checkpoint(imported, example)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        orig.discriminator, rt.discriminator)


def test_sigterm_preemption_checkpoints_and_resumes(tmp_path, monkeypatch):
    """SIGTERM mid-run -> finish dispatch, checkpoint, return; resume is
    bit-exact vs an uninterrupted run (SURVEY.md §5.3 graceful preemption).

    The signal is raised synchronously from inside the data feed (main
    thread) so delivery is deterministic: the handler train() installed
    flips its stop flag and the loop exits at the next step boundary."""
    import signal

    import levelgan.api as api

    # host feed: this test injects its signal from the host sampling hook
    # (the device-feed twin below injects from the logging hook instead)
    cfg_full = preset("toy_dcgan_16").override(
        **TINY, **{"train.steps": 8, "train.steps_per_dispatch": 1,
                   "data.feed": "host",
                   "io.out_dir": str(tmp_path / "full")})
    res_full = train(cfg_full, echo=False)

    cfg_pre = cfg_full.override(**{"io.out_dir": str(tmp_path / "pre")})
    real_sample = api.sample_batch
    calls = {"n": 0}

    def sample_and_preempt(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 3:
            signal.raise_signal(signal.SIGTERM)
        return real_sample(*args, **kwargs)

    monkeypatch.setattr(api, "sample_batch", sample_and_preempt)
    res_pre = train(cfg_pre, echo=False)
    monkeypatch.undo()

    assert res_pre["preempted"]
    stopped_at = int(np.asarray(res_pre["state"].step))
    # The signal lands while the feed for step 3 is being sampled; the
    # pre-dispatch stop check skips launching that step (resume-safe since
    # sampling is stateless), so we stop with 2 steps applied.
    assert stopped_at == 2

    cfg_resume = cfg_pre.override(**{"io.resume": "auto"})
    res_resumed = train(cfg_resume, echo=False)
    assert int(np.asarray(res_resumed["state"].step)) == 8
    assert not res_resumed["preempted"]
    for field in ("generator", "discriminator"):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            getattr(res_full["state"], field),
            getattr(res_resumed["state"], field))


def test_sigterm_preemption_device_feed(tmp_path, monkeypatch):
    """Graceful preemption on the shipped device-feed path: the signal is
    raised synchronously from the per-step logging hook (log_every=1), the
    loop exits at the next step boundary, and resume is bit-exact."""
    import signal

    from levelgan.lio.metrics import MetricsLogger

    base = dict(TINY, **{"train.steps": 8, "train.steps_per_dispatch": 1,
                         "io.log_every": 1})
    cfg_full = preset("toy_dcgan_16").override(
        **base, **{"io.out_dir": str(tmp_path / "full")})
    assert cfg_full.data.feed == "device"
    res_full = train(cfg_full, echo=False)

    cfg_pre = cfg_full.override(**{"io.out_dir": str(tmp_path / "pre2")})
    real_log = MetricsLogger.log
    calls = {"n": 0}

    def log_and_preempt(self, *args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 3:
            signal.raise_signal(signal.SIGTERM)
        return real_log(self, *args, **kwargs)

    monkeypatch.setattr(MetricsLogger, "log", log_and_preempt)
    res_pre = train(cfg_pre, echo=False)
    monkeypatch.undo()

    assert res_pre["preempted"]
    # signal landed during the log after step 3 -> stop before dispatching 4
    assert int(np.asarray(res_pre["state"].step)) == 3

    cfg_resume = cfg_pre.override(**{"io.resume": "auto"})
    res_resumed = train(cfg_resume, echo=False)
    assert int(np.asarray(res_resumed["state"].step)) == 8
    assert not res_resumed["preempted"]
    for field in ("generator", "discriminator"):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            getattr(res_full["state"], field),
            getattr(res_resumed["state"], field))


def test_resume_auto_skips_corrupt_latest(tmp_path, capsys):
    """A truncated latest checkpoint (host crash mid-writeback) must not
    brick auto-resume: the loader walks back to the last readable one."""
    cfg = preset("toy_dcgan_16").override(**TINY).override(
        **{"train.steps": 4, "train.steps_per_dispatch": 2,
           "io.ckpt_every": 2, "io.keep_ckpts": 0,
           "io.out_dir": str(tmp_path)})
    train(cfg, echo=False)
    ckpts = sorted((tmp_path / "ckpt").iterdir())
    assert len(ckpts) >= 2
    # corrupt the newest arrays.npz
    (ckpts[-1] / "arrays.npz").write_bytes(b"PK\x03\x04 truncated")

    cfg2 = cfg.override(**{"train.steps": 6, "io.resume": "auto"})
    res = train(cfg2, echo=False)
    out = capsys.readouterr().out
    assert "skipping unreadable checkpoint" in out
    assert int(np.asarray(res["state"].step)) == 6
