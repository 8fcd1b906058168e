"""Heading-closure prior (track/ops.py closure_penalty, train.w_closure).

The in-training remedy for the measured GRU heading drift (BASELINE.md
"Track-family quality": only ~29-43% of raw generated loops close within
0.5 rad): squared error between |sum of curvature| and 2*pi,
differentiable pathwise through the tanh-bounded curvature channel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from levelgan.config import preset
from levelgan.track.data import TrackDataset
from levelgan.track.ops import closure_penalty, track_augment

TINY = {
    "train.batch_size": 8, "train.n_critic": 2, "model.rnn_hidden": 32,
    "model.latent_dim": 8, "model.critic_base_channels": 16,
    "model.group_size": 8, "model.n_segments": 16,
    "curriculum.rollout_steps": 10,
    "data.corpus_size": 64, "io.log_every": 2, "io.ckpt_every": 100,
}


def _corpus(n=8):
    # full-size preset: at 48 segments the corpus turn normalization is
    # exact (the short 16-segment test corpus re-clips after normalizing,
    # leaving ~0.02 rad residual — data.synthetic_tracks)
    cfg = preset("racetrack_32")
    ds = TrackDataset.from_config(cfg.data, cfg.model, seed=0)
    return jnp.asarray(ds.tracks[:n])


def test_zero_on_corpus_tracks():
    # corpus tracks close by construction (track/data.py normalizes the
    # heading turn to exactly one loop) — the prior vanishes at the optimum
    assert float(closure_penalty(_corpus())) < 1e-9


def test_penalty_and_gradient_on_open_loops():
    bad = _corpus().at[..., 0].multiply(0.7)   # 30% heading shortfall
    pen = float(closure_penalty(bad))
    assert pen == pytest.approx((0.3 * 2 * np.pi) ** 2, rel=1e-4)
    g = jax.grad(closure_penalty)(bad)
    assert float(jnp.abs(g[..., 0]).max()) > 0          # pathwise gradient
    assert float(jnp.abs(g[..., 1]).max()) == 0.0       # width untouched


def test_direction_agnostic_and_augment_invariant():
    tr = _corpus()
    ccw, cw = tr, tr.at[..., 0].multiply(-1.0)          # both valid loops
    assert float(closure_penalty(cw)) < 1e-9
    bad = tr.at[..., 0].multiply(0.6)
    aug = track_augment(jax.random.key(0), bad)         # shift + mirror
    assert float(closure_penalty(aug)) == pytest.approx(
        float(closure_penalty(bad)), rel=1e-5)
    assert float(closure_penalty(ccw)) < 1e-9


def test_gradient_descent_closes_a_loop():
    # the pathwise gradient actually closes an open loop
    kappa = jnp.full((1, 16), 2 * np.pi / 16 * 0.5)     # half a loop
    width = jnp.full((1, 16), 1.0)
    tr = jnp.stack([kappa, width], -1)
    for _ in range(200):
        tr = tr - 0.01 * jax.grad(closure_penalty)(tr)
    assert float(closure_penalty(tr)) < 1e-6


def test_track_wgan_step_with_closure_runs():
    """Fast tier: the w_closure branch traces, runs, and logs the metric."""
    from levelgan.track.train import create_track_state, make_track_wgan_step

    cfg = preset("racetrack_32").override(
        **TINY, **{"train.w_closure": 1.0})
    batch = np.asarray(
        np.random.default_rng(0).normal(0, 0.1, (2, 8, 16, 2)), np.float32)
    _, m1 = jax.jit(make_track_wgan_step(cfg))(create_track_state(cfg), batch)
    assert np.isfinite(float(m1["g_loss"]))
    assert np.isfinite(float(m1["closure"])) and float(m1["closure"]) >= 0


@pytest.mark.slow
def test_track_wgan_step_closure_is_critic_neutral():
    from levelgan.track.train import create_track_state, make_track_wgan_step

    cfg = preset("racetrack_32").override(
        **TINY, **{"train.w_closure": 1.0})
    base = preset("racetrack_32").override(**TINY)
    batch = np.asarray(
        np.random.default_rng(0).normal(0, 0.1, (2, 8, 16, 2)), np.float32)
    s1, m1 = jax.jit(make_track_wgan_step(cfg))(create_track_state(cfg), batch)
    s0, m0 = jax.jit(make_track_wgan_step(base))(
        create_track_state(base), batch)
    assert np.isfinite(float(m1["g_loss"]))
    # the penalty value is observable when (and only when) the knob is on
    assert np.isfinite(float(m1["closure"])) and float(m1["closure"]) >= 0
    assert "closure" not in m0
    # closure is a generator-only term: the critic update is identical
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        jax.device_get(s1.discriminator), jax.device_get(s0.discriminator))
    # and the generator update is NOT (the prior engages at init: a fresh
    # GRU emitter does not close loops)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        jax.device_get(s1.generator), jax.device_get(s0.generator))
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_track_curriculum_step_with_closure_runs():
    from levelgan.track.train import (create_track_curriculum_state,
                                      make_track_curriculum_step)

    cfg = preset("race_curriculum_32").override(
        **TINY, **{"train.w_closure": 1.0})
    state = create_track_curriculum_state(cfg)
    batch = np.asarray(
        np.random.default_rng(0).normal(0, 0.1, (2, 8, 16, 2)), np.float32)
    _, m = jax.jit(make_track_curriculum_step(cfg))(state, batch)
    assert np.isfinite(float(m["g_loss"]))
    assert np.isfinite(float(m["closure"])) and float(m["closure"]) >= 0


def test_tile_family_rejects_closure():
    from levelgan.train.gan import make_gan_step
    from levelgan.train.wgan_gp import make_wgan_gp_step

    for fam, factory in (("toy_dcgan_16", make_gan_step),
                         ("wgan_gp_32", make_wgan_gp_step)):
        cfg = preset(fam).override(**{"train.w_closure": 1.0})
        with pytest.raises(ValueError, match="track-family only"):
            factory(cfg)


def test_negative_weight_rejected():
    with pytest.raises(ValueError, match="w_closure"):
        preset("racetrack_32").override(**{"train.w_closure": -0.5})


# ---- decode-time closure projection (track/ops.py closure_project) ---------


def test_project_closes_exactly_within_bounds():
    from levelgan.track.data import KAPPA_MAX
    from levelgan.track.ops import closure_project

    rng = np.random.default_rng(3)
    # open loops, both orientations, well inside the feasible region
    tracks = np.stack([
        rng.uniform(-0.3, 0.3, (16, 32)) + rng.choice([-0.1, 0.1], (16, 1)),
        rng.uniform(0.1, 0.3, (16, 32)),
    ], axis=-1).astype(np.float32)
    out = np.asarray(closure_project(jnp.asarray(tracks)))
    turn = np.abs(out[..., 0].sum(-1))
    np.testing.assert_allclose(turn, 2 * np.pi, atol=1e-4)
    assert np.all(np.abs(out[..., 0]) <= KAPPA_MAX + 1e-6)
    np.testing.assert_array_equal(out[..., 1], tracks[..., 1])  # width


def test_project_noop_on_corpus_tracks():
    from levelgan.track.ops import closure_project

    tracks = _corpus(8)
    out = np.asarray(closure_project(jnp.asarray(tracks)))
    np.testing.assert_allclose(out, tracks, atol=1e-5)


def test_project_preserves_orientation():
    from levelgan.track.ops import closure_project

    tracks = np.array(_corpus(8))
    sign_in = np.sign(tracks[..., 0].sum(-1))
    tracks[..., 0] *= 0.8  # open every loop by 20%
    out = np.asarray(closure_project(jnp.asarray(tracks)))
    assert np.array_equal(np.sign(out[..., 0].sum(-1)), sign_in)


def test_project_saturates_when_infeasible():
    from levelgan.track.data import KAPPA_MAX
    from levelgan.track.ops import closure_project

    # 8 segments at KAPPA_MAX gives max turn 4.8 < 2*pi: infeasible —
    # projection must saturate at the bound, not overshoot it
    tracks = np.zeros((2, 8, 2), np.float32)
    tracks[..., 1] = 0.2
    out = np.asarray(closure_project(jnp.asarray(tracks)))
    np.testing.assert_allclose(out[..., 0], KAPPA_MAX, atol=1e-5)


def test_generate_repair_track_family():
    """generate(repair=True) routes tracks through closure_project."""
    from levelgan.api import generate, make_state
    from levelgan.train.state import eval_generator_params

    cfg = preset("racetrack_32").override(**TINY)
    state = make_state(cfg, jax.random.key(0))
    tracks = generate(cfg, eval_generator_params(state), 16, seed=1,
                      batch_size=8, repair=True)
    turn = np.abs(np.asarray(tracks)[..., 0].sum(-1))
    np.testing.assert_allclose(turn, 2 * np.pi, atol=1e-3)


def test_generate_track_repair_defaults_on():
    """repair=None resolves to the family default: track export is
    closure-projected unless explicitly disabled (BASELINE.md round-3:
    the projection is exact and diversity-preserving, so the default
    export/render path ships closed loops)."""
    from levelgan.api import generate, make_state
    from levelgan.train.state import eval_generator_params

    # closure_in_model=False isolates the EXPORT-path default this test
    # pins (the round-4 racetrack_32 preset also closes inside the model)
    cfg = preset("racetrack_32").override(
        **TINY, **{"model.closure_in_model": False})
    state = make_state(cfg, jax.random.key(0))
    params = eval_generator_params(state)
    default = generate(cfg, params, 8, seed=1, batch_size=8)
    turn = np.abs(np.asarray(default)[..., 0].sum(-1))
    np.testing.assert_allclose(turn, 2 * np.pi, atol=1e-3)
    raw = generate(cfg, params, 8, seed=1, batch_size=8, repair=False)
    raw_turn = np.abs(np.asarray(raw)[..., 0].sum(-1))
    assert np.abs(raw_turn - 2 * np.pi).max() > 1e-3  # raw does NOT close
    # round-4 preset default: closure lives in the forward, so even the
    # repair=False export ships closed loops
    cfg2 = preset("racetrack_32").override(**TINY)
    state2 = make_state(cfg2, jax.random.key(0))
    raw2 = generate(cfg2, eval_generator_params(state2), 8, seed=1,
                    batch_size=8, repair=False)
    turn2 = np.abs(np.asarray(raw2)[..., 0].sum(-1))
    np.testing.assert_allclose(turn2, 2 * np.pi, atol=1e-3)


# ---- round-4 model.closure_in_model -----------------------------------------

def test_closure_in_model_output_closes():
    """With the projection inside the forward, every emitted track closes
    exactly (|sum kappa| == 2*pi) — the distribution the critic trains on
    IS the distribution export ships."""
    from levelgan.track.models import TrackGenerator

    cfg = preset("racetrack_32").override(
        **TINY, **{"model.closure_in_model": True})
    gen = TrackGenerator(cfg.model)
    z = jax.random.normal(jax.random.key(0), (8, cfg.model.latent_dim))
    params = gen.init(jax.random.key(1), z)["params"]
    tracks = gen.apply({"params": params}, z)
    closure = np.abs(np.asarray(tracks[..., 0].sum(-1)))
    np.testing.assert_allclose(closure, 2 * np.pi, atol=1e-3)
    # differentiable end to end (the curriculum needs pathwise grads)
    g = jax.grad(lambda p: gen.apply({"params": p}, z).sum())(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_closure_in_model_step_runs():
    from levelgan.track.train import create_track_state, make_track_wgan_step

    cfg = preset("racetrack_32").override(
        **TINY, **{"model.closure_in_model": True})
    batch = np.asarray(
        np.random.default_rng(0).normal(0, 0.1, (2, 8, 16, 2)), np.float32)
    _, m = jax.jit(make_track_wgan_step(cfg))(create_track_state(cfg), batch)
    assert np.isfinite(float(m["g_loss"]))


def test_closure_in_model_tile_family_rejected():
    with pytest.raises(ValueError, match="track-family only"):
        preset("wgan_gp_32").override(**{"model.closure_in_model": True})
