import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # fast tier: pytest -m 'not slow'

from levelgan.api import generate, train
from levelgan.config import preset
from levelgan.lio.checkpoint import load_checkpoint, save_checkpoint
from levelgan.track.data import KAPPA_MAX, WIDTH_MAX, WIDTH_MIN

TINY = {
    "train.batch_size": 8, "train.n_critic": 2, "model.rnn_hidden": 32,
    "model.latent_dim": 8, "model.critic_base_channels": 16,
    "model.group_size": 8, "model.n_segments": 16,
    "curriculum.rollout_steps": 10,
    "data.corpus_size": 64, "io.log_every": 2, "io.ckpt_every": 100,
}


def test_track_models_shapes_and_ranges():
    import jax.numpy as jnp
    from levelgan.track.models import TrackCritic, TrackGenerator

    cfg = preset("racetrack_32").override(**TINY)
    m = cfg.model
    gen, critic = TrackGenerator(m), TrackCritic(m)
    z = jax.random.normal(jax.random.key(0), (4, m.latent_dim))
    pg = gen.init(jax.random.key(1), z)["params"]
    tracks = gen.apply({"params": pg}, z)
    assert tracks.shape == (4, 16, 2)
    assert (np.abs(np.asarray(tracks[..., 0])) <= KAPPA_MAX).all()
    w = np.asarray(tracks[..., 1])
    assert (w >= WIDTH_MIN).all() and (w <= WIDTH_MAX).all()
    pd = critic.init(jax.random.key(2), tracks)["params"]
    scores = critic.apply({"params": pd}, tracks)
    assert scores.shape == (4,)

    grads = jax.grad(lambda p: (gen.apply({"params": p}, z) ** 2).sum())(pg)
    total = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0


def test_track_wgan_train_e2e(tmp_path):
    cfg = preset("racetrack_32").override(
        **TINY, **{"train.steps": 3, "io.out_dir": str(tmp_path)})
    res = train(cfg, echo=False)
    assert np.isfinite(res["metrics"]["d_loss"])
    assert np.isfinite(res["kl"])
    tracks = generate(cfg, res["state"].generator, 5, batch_size=5)
    assert tracks.shape == (5, 16, 2) and tracks.dtype == np.float32


def test_race_curriculum_step_updates_everything(tmp_path):
    from levelgan.track.train import (create_track_curriculum_state,
                                      make_track_curriculum_step)

    cfg = preset("race_curriculum_32").override(**TINY)
    state = create_track_curriculum_state(cfg)
    step = jax.jit(make_track_curriculum_step(cfg))
    batch = np.asarray(
        np.random.default_rng(0).normal(0, 0.1, (2, 8, 16, 2)), np.float32)
    new_state, m = step(state, batch)
    for k in ("d_loss", "g_loss", "g_rl", "drivability", "skill_gap",
              "crashes", "laps"):
        assert np.isfinite(float(m[k])), k
    for field in ("generator", "discriminator", "agent_strong", "agent_weak"):
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a, np.float32)
                                      - np.asarray(b, np.float32)).max()),
            getattr(state, field), getattr(new_state, field))
        assert max(jax.tree_util.tree_leaves(diffs)) > 0, field

    # checkpoint roundtrip with track curriculum state
    path = save_checkpoint(str(tmp_path), new_state, cfg)
    restored, cfg2 = load_checkpoint(
        path, create_track_curriculum_state(cfg, jax.random.key(9)))
    assert cfg2 == cfg
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        new_state.generator, restored.generator)


def test_track_export_and_validate(tmp_path):
    from levelgan.cli.export import main as export_main
    from tools.validate import main as validate_main

    cfg = preset("racetrack_32").override(
        **TINY, **{"train.steps": 2, "io.out_dir": str(tmp_path)})
    res = train(cfg, echo=False)
    out = str(tmp_path / "tracks.npz")
    export_main(["--ckpt", res["checkpoint"], "--n", "4", "--out", out,
                 "--batch", "4"])
    assert np.load(out)["tracks"].shape == (4, 16, 2)
    png = str(tmp_path / "tracks.png")
    export_main(["--ckpt", res["checkpoint"], "--n", "4", "--out", png,
                 "--batch", "4"])
    import os
    assert os.path.exists(png) or os.path.exists(png + ".npz")
    with pytest.raises(SystemExit):
        export_main(["--ckpt", res["checkpoint"], "--n", "2",
                     "--out", str(tmp_path / "x.txt")])

    rc = validate_main(["--ckpt", res["checkpoint"], "--n", "64",
                        "--kl-threshold", "10.0"])
    assert rc == 0


def test_track_features_symmetry_invariant():
    import jax.numpy as jnp
    from levelgan.track.data import synthetic_tracks
    from levelgan.track.ops import track_augment, track_features

    tr = jnp.asarray(synthetic_tracks(32, 16, 0))
    f = track_features(tr)
    assert f.shape == (32, 4)
    fa = track_features(track_augment(jax.random.key(3), tr))
    np.testing.assert_allclose(np.asarray(f), np.asarray(fa), atol=1e-5)


def test_conditional_track_wgan_step_runs():
    from levelgan.track.train import create_track_state, make_track_wgan_step

    cfg = preset("racetrack_32").override(**TINY, **{"model.cond_dim": 4})
    state = create_track_state(cfg)
    step = jax.jit(make_track_wgan_step(cfg))
    rng = np.random.default_rng(0)
    from levelgan.track.data import synthetic_tracks
    batch = np.stack([synthetic_tracks(8, 16, s) for s in (1, 2)])
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["g_loss"]))


def test_race_curriculum_single_g_update_per_step():
    """The combined G update must advance the G optimizer exactly once per
    curriculum step (it used to advance twice: WGAN + RL separately)."""
    from levelgan.track.data import synthetic_tracks
    from levelgan.track.train import (create_track_curriculum_state,
                                      make_track_curriculum_step)

    cfg = preset("race_curriculum_32").override(**TINY)
    state = create_track_curriculum_state(cfg)
    step = jax.jit(make_track_curriculum_step(cfg))
    batch = np.stack([synthetic_tracks(8, 16, s) for s in (1, 2)])
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["g_loss"]))
    counts = [int(np.asarray(l))
              for l in jax.tree_util.tree_leaves(state.opt_g)
              if np.asarray(l).ndim == 0]
    assert 1 in counts and 2 not in counts


def test_track_skill_gap_report():
    """lio/skillgap.py handles the track family: race rollouts of the
    checkpoint's own drivers on generated vs corpus tracks."""
    from levelgan.lio.skillgap import skill_gap_report
    from levelgan.track.train import create_track_curriculum_state

    cfg = preset("race_curriculum_32").override(**TINY)
    state = create_track_curriculum_state(cfg)
    rng = np.random.default_rng(2)
    gen = np.asarray(rng.normal(0, 0.1, (8, 16, 2)), np.float32)
    corpus = np.asarray(rng.normal(0, 0.1, (8, 16, 2)), np.float32)
    rep = skill_gap_report(cfg, state, gen, corpus)
    for side in ("generated", "corpus"):
        for k in ("return_gap", "playable_gap", "crashes_strong",
                  "crashes_weak"):
            assert np.isfinite(rep[side][k]), (side, k)
    assert np.isfinite(rep["separation"])
