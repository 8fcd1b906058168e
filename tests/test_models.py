import jax
import jax.numpy as jnp
import numpy as np
import pytest

from levelgan.config import ModelConfig
from levelgan.models import Critic, Generator, generator_stages, sample_head


def _init(m, batch=2):
    gen, critic = Generator(m), Critic(m)
    z = jnp.zeros((batch, m.latent_dim))
    x = jnp.zeros((batch, m.level_size, m.level_size, m.n_tiles))
    cond = jnp.zeros((batch, m.cond_dim)) if m.cond_dim else None
    pg = gen.init(jax.random.key(0), z, cond)["params"]
    pd = critic.init(jax.random.key(1), x, cond)["params"]
    return gen, critic, pg, pd, z, x, cond


@pytest.mark.parametrize("size", [
    16, 32, pytest.param(64, marks=pytest.mark.slow)])
def test_shapes(size):
    m = ModelConfig(level_size=size, base_channels=16, group_size=8,
                    latent_dim=8)
    gen, critic, pg, pd, z, x, cond = _init(m)
    logits = gen.apply({"params": pg}, z)
    assert logits.shape == (2, size, size, m.n_tiles)
    assert logits.dtype == jnp.float32
    scores = critic.apply({"params": pd}, x)
    assert scores.shape == (2,)


def test_stage_count():
    assert len(generator_stages(ModelConfig(level_size=16))) == 2
    assert len(generator_stages(ModelConfig(level_size=64))) == 4
    with pytest.raises(ValueError):
        generator_stages(ModelConfig(level_size=24))


def test_conditional_paths():
    m = ModelConfig(level_size=16, cond_dim=4, base_channels=16,
                    group_size=8, latent_dim=8)
    gen, critic, pg, pd, z, x, cond = _init(m)
    l1 = gen.apply({"params": pg}, z, jnp.zeros((2, 4)))
    l2 = gen.apply({"params": pg}, z, jnp.ones((2, 4)))
    assert not np.allclose(np.asarray(l1), np.asarray(l2))
    with pytest.raises(ValueError):
        gen.apply({"params": pg}, z, None)
    s1 = critic.apply({"params": pd}, x, jnp.zeros((2, 4)))
    s2 = critic.apply({"params": pd}, x, jnp.ones((2, 4)))
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_conditional_projection_mode():
    """cond_mode='projection': condition enters at the head, trunk stays
    unconditional — score is cond-sensitive, gradients flow to the
    projection params and to x, and the trunk param tree is identical to
    the unconditional critic's plus {cond_embed, cond_proj}."""
    m = ModelConfig(level_size=16, cond_dim=4, cond_mode="projection",
                    base_channels=16, critic_base_channels=16,
                    group_size=8, latent_dim=8)
    gen, critic, pg, pd, z, x, cond = _init(m)
    # non-zero input: the projection term is <W_p emb(c), sum_hw phi(x)>,
    # identically zero on an all-zero feature map
    x = jax.random.normal(jax.random.key(7), x.shape)
    s1 = critic.apply({"params": pd}, x, jnp.zeros((2, 4)))
    s2 = critic.apply({"params": pd}, x, jnp.ones((2, 4)))
    assert not np.allclose(np.asarray(s1), np.asarray(s2))
    assert "cond_proj" in pd
    # trunk unchanged vs unconditional: down0 sees only n_tiles channels
    assert pd["down0"]["kernel"].shape[2] == m.n_tiles

    # non-zero cond too: with the default zero bias, emb(0)=0 and the
    # d/dW_p outer product emb^T (x) pooled vanishes identically
    cond = jnp.ones((2, 4))

    def loss(pd, x):
        return critic.apply({"params": pd}, x, cond).sum()

    gp, gx = jax.grad(loss, argnums=(0, 1))(pd, x)
    assert float(jnp.abs(gp["cond_proj"]["kernel"]).sum()) > 0
    assert float(jnp.abs(gx).sum()) > 0
    with pytest.raises(ValueError):
        ModelConfig(cond_mode="nope")


def test_sample_heads():
    logits = jax.random.normal(jax.random.key(0), (4, 8, 8, 6))
    key = jax.random.key(1)
    soft = sample_head(key, logits, "softmax")
    np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, rtol=1e-5)
    hard = sample_head(key, logits, "gumbel", tau=0.7)
    assert set(np.unique(np.asarray(hard))) <= {0.0, 1.0}
    arg = sample_head(key, logits, "argmax")
    np.testing.assert_array_equal(
        np.asarray(arg.argmax(-1)), np.asarray(logits.argmax(-1)))
    with pytest.raises(ValueError):
        sample_head(key, logits, "nope")


@pytest.mark.slow
def test_generator_grads_flow():
    m = ModelConfig(level_size=16, base_channels=16, group_size=8, latent_dim=8)
    gen, critic, pg, pd, z, x, cond = _init(m)
    z = jax.random.normal(jax.random.key(5), z.shape)

    def loss(pg):
        return (gen.apply({"params": pg}, z) ** 2).mean()

    grads = jax.grad(loss)(pg)
    norms = [float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(norms)) and sum(norms) > 0


def test_critic_mbstd():
    """model.critic_mbstd appends the batch-stddev channel: scores change,
    and a batch of identical samples is distinguishable from a diverse one
    through the extra feature (cross-sample statistics now visible)."""
    import jax
    import jax.numpy as jnp
    from levelgan.config import preset
    from levelgan.models import Critic

    cfg = preset("wgan_gp_32").override(**{
        "model.critic_base_channels": 16, "model.group_size": 8,
        "model.critic_mbstd": "trunk"}).model
    critic = Critic(cfg)
    key = jax.random.key(0)
    x = jax.random.uniform(key, (8, 32, 32, 8))
    params = critic.init(key, x)["params"]
    diverse = critic.apply({"params": params}, x)
    collapsed = critic.apply({"params": params},
                             jnp.broadcast_to(x[:1], x.shape))
    assert np.isfinite(np.asarray(diverse)).all()
    # identical inputs => identical per-sample scores, but the mbstd
    # channel differs between the two BATCHES, so scores can't coincide
    # with the diverse batch's score for the same leading sample
    assert float(jnp.abs(collapsed - collapsed[0]).max()) < 1e-5
    assert float(jnp.abs(diverse[0] - collapsed[0])) > 1e-6


def test_critic_mbstd_input_mode():
    """'input' mode appends the per-position batch stddev at the critic
    input: a positionally-collapsed batch is distinguishable from a
    spread one even when per-sample content is identical up to position."""
    import jax
    import jax.numpy as jnp
    from levelgan.config import preset
    from levelgan.models import Critic

    cfg = preset("wgan_gp_32").override(**{
        "model.critic_base_channels": 16, "model.group_size": 8,
        "model.critic_mbstd": "input"}).model
    critic = Critic(cfg)
    key = jax.random.key(0)
    x = jax.random.uniform(key, (8, 32, 32, 8))
    params = critic.init(key, x)["params"]
    # input grew one channel
    assert params["down0"]["kernel"].shape[2] == cfg.n_tiles + 1
    s_spread = critic.apply({"params": params}, x)
    s_same = critic.apply({"params": params},
                          jnp.broadcast_to(x[:1], x.shape))
    assert np.isfinite(np.asarray(s_spread)).all()
    assert float(jnp.abs(s_spread[0] - s_same[0])) > 1e-6

    with pytest.raises(ValueError, match="critic_mbstd"):
        preset("wgan_gp_32").override(**{"model.critic_mbstd": "bogus"})
