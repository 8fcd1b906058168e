import jax
import jax.numpy as jnp
import numpy as np
import pytest

from levelgan.config import preset
from levelgan.data.dataset import synthetic_corpus
from levelgan.train.gan import make_gan_step
from levelgan.train.state import create_state
from levelgan.train.wgan_gp import make_wgan_gp_step

TINY = {
    "model.base_channels": 16, "model.critic_base_channels": 16,
    "model.latent_dim": 16, "model.group_size": 8,
    "train.batch_size": 8, "data.corpus_size": 32,
}


@pytest.fixture(scope="module")
def tiny_gan_cfg():
    return preset("toy_dcgan_16").override(**TINY)


@pytest.fixture(scope="module")
def tiny_wgan_cfg():
    return preset("wgan_gp_32").override(**TINY, **{"train.n_critic": 2})


def _batch(cfg, n_critic=None, seed=0):
    rng = np.random.default_rng(seed)
    shape = (cfg.train.batch_size, cfg.model.level_size, cfg.model.level_size)
    if n_critic:
        shape = (n_critic,) + shape
    return rng.integers(0, cfg.model.n_tiles, size=shape).astype(np.uint8)


def test_gan_step_runs_and_is_finite(tiny_gan_cfg):
    cfg = tiny_gan_cfg
    state = create_state(cfg)
    step = jax.jit(make_gan_step(cfg))
    for i in range(3):
        state, m = step(state, _batch(cfg, seed=i))
    assert int(state.step) == 3
    for k in ("d_loss", "g_loss", "d_real", "d_fake"):
        assert np.isfinite(float(m[k])), k
    assert float(m["gen_hist"].sum()) == cfg.train.batch_size * 16 * 16


@pytest.mark.slow
def test_gan_step_deterministic(tiny_gan_cfg):
    cfg = tiny_gan_cfg
    step = jax.jit(make_gan_step(cfg))
    outs = []
    for _ in range(2):
        state = create_state(cfg)
        state, m = step(state, _batch(cfg))
        outs.append((float(m["d_loss"]), jax.device_get(state.generator)))
    assert outs[0][0] == outs[1][0]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        outs[0][1], outs[1][1])


def test_gan_step_changes_params(tiny_gan_cfg):
    cfg = tiny_gan_cfg
    state = create_state(cfg)
    before = jax.device_get(state.generator)
    state, _ = jax.jit(make_gan_step(cfg))(state, _batch(cfg))
    after = jax.device_get(state.generator)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), before, after)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


@pytest.mark.slow
def test_wgan_step_runs(tiny_wgan_cfg):
    cfg = tiny_wgan_cfg
    state = create_state(cfg)
    step = jax.jit(make_wgan_gp_step(cfg))
    batch = _batch(cfg, n_critic=cfg.train.n_critic)
    state, m = step(state, batch)
    for k in ("d_loss", "g_loss", "gp", "wdist"):
        assert np.isfinite(float(m[k])), k
    assert float(m["gp"]) >= 0
    assert int(state.step) == 1


@pytest.mark.slow
def test_wgan_gp_decreases_on_trained_critic(tiny_wgan_cfg):
    """A few critic updates should push the GP term down from init."""
    cfg = tiny_wgan_cfg
    state = create_state(cfg)
    step = jax.jit(make_wgan_gp_step(cfg))
    gps = []
    for i in range(6):
        state, m = step(state, _batch(cfg, n_critic=cfg.train.n_critic, seed=i))
        gps.append(float(m["gp"]))
    assert gps[-1] < gps[0]


@pytest.mark.slow
def test_gan_learns_toy_distribution(tiny_gan_cfg):
    """Statistical tier (SURVEY.md §4.2): 150 steps on a structured corpus
    drive the generated tile histogram toward the corpus — KL must drop
    substantially (measured trajectory: ~0.68 -> ~0.3)."""
    from levelgan.lio.metrics import kl_divergence

    cfg = tiny_gan_cfg.override(**{"train.batch_size": 16})
    corpus = synthetic_corpus(64, 16, seed=9)
    rng = np.random.default_rng(0)
    ref = np.bincount(corpus.reshape(-1), minlength=8).astype(np.float64)
    state = create_state(cfg)
    step = jax.jit(make_gan_step(cfg))
    kls = []
    for i in range(150):
        idx = rng.integers(0, len(corpus), cfg.train.batch_size)
        state, m = step(state, corpus[idx])
        kls.append(float(kl_divergence(np.asarray(m["gen_hist"]), ref)))
        assert np.isfinite(float(m["d_loss"]))
    assert np.mean(kls[-10:]) < 0.7 * np.mean(kls[:10])


def test_cosine_lr_horizon_scales_with_n_critic():
    """optax schedules count optimizer updates: under wgan_gp the critic
    updates n_critic times per train step, so its cosine horizon must be
    steps*n_critic or the LR bottoms out after steps/n_critic train steps."""
    from levelgan.train.state import make_optimizers

    cfg = preset("wgan_gp_32").override(**{
        "train.steps": 4, "train.n_critic": 2, "train.lr_schedule": "cosine",
        "train.lr_d": 1e-3})
    _, tx_d = make_optimizers(cfg)

    params = {"w": jnp.ones((4,))}
    opt = tx_d.init(params)
    norms = []
    for _ in range(cfg.train.steps * cfg.train.n_critic):
        updates, opt = tx_d.update({"w": jnp.ones((4,))}, opt, params)
        norms.append(float(jnp.abs(updates["w"]).max()))
    # halfway through the 8 critic updates the cosine should be ~0.5 of
    # base, not already collapsed to the 0.01 floor (the old steps-only
    # horizon reached the floor at update 4 = train step 2 of 4)
    assert norms[4] > 0.25 * norms[0], norms
    # and by the end it HAS decayed to near the floor
    assert norms[-1] < 0.15 * norms[0], norms


def test_gan_step_r1_penalty(tiny_gan_cfg):
    """r1_gamma > 0 adds a positive penalty to d_loss and changes D's
    update; r1_gamma=0 (the reference default) is bit-identical to the
    pre-option behavior by construction (the branch is static)."""
    cfg0 = tiny_gan_cfg
    cfg1 = cfg0.override(**{"train.r1_gamma": 1.0})
    b = _batch(cfg0, seed=7)
    s0, m0 = jax.jit(make_gan_step(cfg0))(create_state(cfg0), b)
    s1, m1 = jax.jit(make_gan_step(cfg1))(create_state(cfg1), b)
    # same seed/state init => only the R1 term differs; D's gradient on
    # reals is nonzero at init, so the penalty must raise d_loss and move
    # the discriminator differently.
    assert float(m1["d_loss"]) > float(m0["d_loss"])
    l0 = jax.tree_util.tree_leaves(s0.discriminator)
    l1 = jax.tree_util.tree_leaves(s1.discriminator)
    assert any(not np.allclose(np.asarray(a), np.asarray(bb))
               for a, bb in zip(l0, l1))
    for k in ("d_loss", "g_loss"):
        assert np.isfinite(float(m1[k])), k


def test_wgan_step_projection_conditioning():
    """conditional_32 with cond_mode='projection' trains: one WGAN-GP step
    (cond features + FiLM G + projection critic + GP through the
    projection head) runs with finite losses."""
    cfg = preset("conditional_32").override(**TINY, **{
        "train.n_critic": 2, "model.cond_mode": "projection"})
    state = create_state(cfg)
    step = jax.jit(make_wgan_gp_step(cfg))
    state, m = step(state, _batch(cfg, n_critic=2))
    for k in ("d_loss", "g_loss", "gp"):
        assert np.isfinite(float(m[k])), k


@pytest.mark.slow
def test_wgan_step_at_128_scale_headroom():
    """The config composes unchanged past the reference's 64x64 ceiling
    (BASELINE.md "Scale headroom"): level_size=128 grows the nets by one
    octave and one full WGAN-GP step runs with finite losses and
    right-shaped samples."""
    cfg = preset("wgan_gp_32").override(**{**TINY,
        "model.level_size": 128, "train.batch_size": 4,
        "train.n_critic": 1, "data.corpus_size": 8})
    state = create_state(cfg)
    step = jax.jit(make_wgan_gp_step(cfg))
    state, metrics = step(state, _batch(cfg, n_critic=cfg.train.n_critic))
    for k in ("d_loss", "g_loss"):
        assert np.isfinite(float(metrics[k])), k
    from levelgan.api import generate
    levels = generate(cfg, state.generator, n=4, seed=0)
    assert levels.shape == (4, 128, 128) and levels.dtype == np.uint8


def test_wgan_step_cond_match():
    """train.w_cond_match: the feature-matching loss traces, runs, logs
    its metric, and is rejected loudly on unconditional models."""
    cfg = preset("conditional_32").override(
        **TINY, **{"train.n_critic": 2, "train.w_cond_match": 10.0})
    state = create_state(cfg)
    step = jax.jit(make_wgan_gp_step(cfg))
    _, m = step(state, _batch(cfg, n_critic=2))
    assert np.isfinite(float(m["g_loss"]))
    assert np.isfinite(float(m["cond_match"])) and float(m["cond_match"]) >= 0

    with pytest.raises(ValueError, match="cond_dim"):
        make_wgan_gp_step(preset("wgan_gp_32").override(
            **TINY, **{"train.w_cond_match": 1.0}))
