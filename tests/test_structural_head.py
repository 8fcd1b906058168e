"""model.structural_head='spatial': exactly-one START/GOAL in the sample
itself (round 5) — the tile-family analogue of track closure_in_model.

Reference parity: no equivalent (the reference ships levels with whatever
structure the GAN learned; SURVEY.md R9's curriculum is its only
structural pressure).  These tests pin the composed sample's invariants,
its differentiability, and the config guards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from levelgan.config import GOAL, START, Config, ModelConfig, TrainConfig
from levelgan.models.heads import sample_head


def _logits(key, b=8, hw=16, t=8):
    return jax.random.normal(key, (b, hw, hw, t), jnp.float32)


@pytest.mark.parametrize("head", ["gumbel", "argmax"])
def test_hard_heads_emit_exactly_one_start_and_goal(head):
    logits = _logits(jax.random.key(0))
    out = sample_head(jax.random.key(1), logits, head, tau=1.0,
                      structural="spatial")
    # valid one-hot level
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-6)
    assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}
    ids = np.asarray(jnp.argmax(out, -1))
    assert (np.sum(ids == START, axis=(1, 2)) == 1).all()
    assert (np.sum(ids == GOAL, axis=(1, 2)) == 1).all()


def test_start_goal_never_collide_across_keys():
    logits = _logits(jax.random.key(2))
    # bias both structural channels hard toward one cell: without the
    # mask the draws would collide almost surely
    logits = logits.at[:, 3, 3, START].set(50.0).at[:, 3, 3, GOAL].set(50.0)
    for i in range(5):
        out = sample_head(jax.random.key(i), logits, "gumbel", tau=1.0,
                          structural="spatial")
        ids = np.asarray(jnp.argmax(out, -1))
        assert (np.sum(ids == START, axis=(1, 2)) == 1).all()
        assert (np.sum(ids == GOAL, axis=(1, 2)) == 1).all()


def test_soft_head_stays_on_simplex_with_unit_structural_mass():
    logits = _logits(jax.random.key(3))
    out = sample_head(jax.random.key(4), logits, "softmax",
                      structural="spatial")
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)
    assert (np.asarray(out) >= 0).all()
    # expected structural mass per level is <= 1 each (soft composition
    # shaves the overlap) and close to 1
    s_mass = np.asarray(out[..., START].sum(axis=(1, 2)))
    g_mass = np.asarray(out[..., GOAL].sum(axis=(1, 2)))
    assert (s_mass <= 1.0 + 1e-5).all() and (s_mass > 0.9).all()
    assert (g_mass <= 1.0 + 1e-5).all() and (g_mass > 0.8).all()


@pytest.mark.parametrize("head", ["softmax", "gumbel"])
def test_gradient_reaches_structural_and_trunk_logits(head):
    logits = _logits(jax.random.key(5), b=4, hw=8)

    def loss(lg):
        out = sample_head(jax.random.key(6), lg, head, tau=1.0,
                          structural="spatial")
        # weight the START map by a position ramp so placement matters
        w = jnp.arange(8.0)[None, :, None]
        return (out[..., START] * w).sum() + (out[..., 0] ** 2).sum()

    g = jax.grad(loss)(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g[..., START])).max() > 0
    assert np.abs(np.asarray(g[..., 0])).max() > 0


def test_config_guards():
    with pytest.raises(ValueError, match="structural_head"):
        ModelConfig(structural_head="bogus")
    with pytest.raises(ValueError, match="tile-family only"):
        ModelConfig(family="track", structural_head="spatial")
    from levelgan.train.curriculum import make_curriculum_step
    cfg = Config(model=ModelConfig(structural_head="spatial", head="gumbel"),
                 train=TrainConfig(loss="curriculum"))
    with pytest.raises(ValueError, match="structural_head"):
        make_curriculum_step(cfg)


def test_wgan_gp_step_runs_and_presence_hinges_vanish():
    """One real wgan_gp step with the spatial head: finite losses, and the
    presence count/concentration hinges are zero by construction (only
    the spread term can be nonzero)."""
    from levelgan.ops.presence import presence_penalty

    logits = _logits(jax.random.key(7), b=16, hw=8)
    out = sample_head(jax.random.key(8), logits, "gumbel", tau=1.0,
                      structural="spatial")
    # spread-off penalty is exactly zero on an exactly-one sample
    p = presence_penalty(out, w_spread=0.0)
    assert float(p) == pytest.approx(0.0, abs=1e-10)

    from levelgan.config import preset
    from levelgan.train.state import create_state
    from levelgan.train.wgan_gp import make_wgan_gp_step
    cfg = preset("wgan_gp_32").override(**{
        "model.level_size": 8, "model.base_channels": 16,
        "model.critic_base_channels": 16, "model.latent_dim": 16,
        "model.group_size": 8, "model.head": "gumbel",
        "model.structural_head": "spatial",
        "train.batch_size": 8, "train.n_critic": 2, "train.w_presence": 1.0,
        "data.corpus_size": 32})
    step = jax.jit(make_wgan_gp_step(cfg))
    state = create_state(cfg, jax.random.key(0))
    ids = np.random.default_rng(0).integers(
        0, cfg.model.n_tiles, (2, 8, 8, 8)).astype(np.uint8)
    state, metrics = step(state, jnp.asarray(ids))
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
