"""K2 kernel tier: the Pallas gradient-penalty core must match the XLA
oracle — value AND the double-backward gradient w.r.t. critic params."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from levelgan.kernels.gp_penalty import gradient_penalty_pallas, norm_penalty
from levelgan.ops.grad_penalty import gradient_penalty


def test_norm_penalty_value_and_grad():
    g2 = jax.random.normal(jax.random.key(0), (8, 48))

    def oracle(g2):
        norms = jnp.sqrt(jnp.sum(g2 * g2, axis=1) + 1e-12)
        return jnp.square(norms - 1.0)

    np.testing.assert_allclose(np.asarray(norm_penalty(g2)),
                               np.asarray(oracle(g2)), rtol=1e-5)
    gp = jax.grad(lambda g: norm_penalty(g).sum())(g2)
    gx = jax.grad(lambda g: oracle(g).sum())(g2)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-4, atol=1e-6)


def _linear_critic():
    a = jax.random.normal(jax.random.key(1), (4, 4, 3))

    def d_apply(params, x, cond):
        return jnp.einsum("bhwc,hwc->b", x, params)

    return a, d_apply


def test_matches_oracle_linear_critic():
    a, d_apply = _linear_critic()
    key = jax.random.key(2)
    real = jax.random.normal(jax.random.key(3), (8, 4, 4, 3))
    fake = jax.random.normal(jax.random.key(4), (8, 4, 4, 3))
    gp_p = float(gradient_penalty_pallas(d_apply, a, key, real, fake))
    gp_x = float(gradient_penalty(d_apply, a, key, real, fake))
    np.testing.assert_allclose(gp_p, gp_x, rtol=1e-5)


def test_double_backward_matches_oracle_linear():
    a, d_apply = _linear_critic()
    key = jax.random.key(5)
    real = jax.random.normal(jax.random.key(6), (4, 4, 4, 3))
    fake = jax.random.normal(jax.random.key(7), (4, 4, 4, 3))
    gp = jax.grad(lambda p: gradient_penalty_pallas(
        d_apply, p, key, real, fake))(a)
    gx = jax.grad(lambda p: gradient_penalty(
        d_apply, p, key, real, fake))(a)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-4, atol=1e-6)


def test_double_backward_matches_oracle_conv_critic():
    """Full nonlinear critic: params-gradient of the penalty (the real
    double backward) matches the oracle."""
    from levelgan.config import ModelConfig
    from levelgan.models import Critic

    m = ModelConfig(level_size=16, critic_base_channels=16, group_size=8,
                    dtype="float32")
    critic = Critic(m)
    x0 = jnp.zeros((2, 16, 16, m.n_tiles))
    params = critic.init(jax.random.key(0), x0)["params"]

    def d_apply(p, x, cond):
        return critic.apply({"params": p}, x, cond)

    key = jax.random.key(8)
    real = jax.random.normal(jax.random.key(9), (4, 16, 16, m.n_tiles))
    fake = jax.random.normal(jax.random.key(10), (4, 16, 16, m.n_tiles))

    gp = jax.grad(lambda p: gradient_penalty_pallas(
        d_apply, p, key, real, fake))(params)
    gx = jax.grad(lambda p: gradient_penalty(
        d_apply, p, key, real, fake))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5),
        gp, gx)


def _critic_cfg(level, cond_dim=0):
    from levelgan.config import ModelConfig
    return ModelConfig(level_size=level, critic_base_channels=16,
                       group_size=8, dtype="float32", cond_dim=cond_dim)


@pytest.mark.parametrize("level,cond_dim", [
    (16, 0), pytest.param(32, 0, marks=pytest.mark.slow), (16, 4)])
def test_fused_critic_input_grad_matches_oracle(level, cond_dim):
    """K2 stage (c): the fused critic-forward+input-gradient kernel must
    match jax.grad through the XLA-twin critic."""
    from levelgan.kernels.critic_grad import make_critic_input_grad
    from levelgan.models import Critic

    m = _critic_cfg(level, cond_dim)
    critic = Critic(m)
    x0 = jnp.zeros((2, level, level, m.n_tiles))
    cond0 = jnp.zeros((2, cond_dim)) if cond_dim else None
    params = critic.init(jax.random.key(0), x0, cond0)["params"]

    x = jax.random.normal(jax.random.key(1), (4, level, level, m.n_tiles))
    cond = (jax.random.normal(jax.random.key(2), (4, cond_dim))
            if cond_dim else None)

    g_fused = make_critic_input_grad(m)(params, x, cond)
    g_oracle = jax.grad(lambda xx: critic.apply(
        {"params": params}, xx, cond).astype(jnp.float32).sum())(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_oracle),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("level,cond_dim", [
    (16, 0), pytest.param(32, 0, marks=pytest.mark.slow), (16, 4)])
def test_fused_gp_value_and_double_backward(level, cond_dim):
    """K2 stage (c): penalty value and its params-gradient (the WGAN-GP
    double backward) must match the pure-XLA oracle."""
    from levelgan.kernels.critic_grad import make_gradient_penalty
    from levelgan.models import Critic

    m = _critic_cfg(level, cond_dim)
    critic = Critic(m)
    x0 = jnp.zeros((2, level, level, m.n_tiles))
    cond0 = jnp.zeros((2, cond_dim)) if cond_dim else None
    params = critic.init(jax.random.key(0), x0, cond0)["params"]

    def d_apply(p, x, cond):
        return critic.apply({"params": p}, x, cond)

    key = jax.random.key(3)
    real = jax.random.normal(jax.random.key(4), (4, level, level, m.n_tiles))
    fake = jax.random.normal(jax.random.key(5), (4, level, level, m.n_tiles))
    cond = (jax.random.normal(jax.random.key(6), (4, cond_dim))
            if cond_dim else None)

    gp_fused = make_gradient_penalty(m)
    v_f = float(gp_fused(d_apply, params, key, real, fake, cond))
    v_x = float(gradient_penalty(d_apply, params, key, real, fake, cond))
    np.testing.assert_allclose(v_f, v_x, rtol=1e-4)

    g_f = jax.grad(lambda p: gp_fused(d_apply, p, key, real, fake, cond))(
        params)
    g_x = jax.grad(lambda p: gradient_penalty(
        d_apply, p, key, real, fake, cond))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5), g_f, g_x)


def test_fused_gp_routing():
    """pallas_gp picker semantics: 'auto' ships the measured-fastest XLA GP
    (K1 stays Pallas), 'core'/'fused' select the kernels explicitly, and
    'fused' on an unsupported shape (64x64) raises instead of silently
    degrading."""
    import dataclasses

    from levelgan.kernels.critic_grad import (fused_supported,
                                              make_gradient_penalty)

    assert fused_supported(_critic_cfg(16))
    assert fused_supported(_critic_cfg(32))
    m64 = _critic_cfg(64)
    assert not fused_supported(m64)

    assert make_gradient_penalty(m64) is gradient_penalty
    assert make_gradient_penalty(_critic_cfg(32)) is gradient_penalty
    core = dataclasses.replace(m64, pallas_gp="core")
    assert make_gradient_penalty(core) is gradient_penalty_pallas
    fused32 = dataclasses.replace(_critic_cfg(32), pallas_gp="fused")
    assert callable(make_gradient_penalty(fused32))
    with pytest.raises(ValueError, match="pallas_gp"):
        make_gradient_penalty(dataclasses.replace(m64, pallas_gp="fused"))
    with pytest.raises(ValueError, match="pallas_gp"):
        dataclasses.replace(m64, pallas_gp="devise")


@pytest.mark.slow
def test_wgan_step_with_pallas_gp():
    """End-to-end: WGAN-GP step runs with use_pallas (Pallas GP core +
    Pallas upsample blocks) and matches metrics shape/finiteness."""
    from levelgan.config import preset
    from levelgan.train.state import create_state
    from levelgan.train.wgan_gp import make_wgan_gp_step

    cfg = preset("wgan_gp_32").override(**{
        "train.batch_size": 4, "train.n_critic": 2,
        "model.base_channels": 16, "model.critic_base_channels": 16,
        "model.latent_dim": 8, "model.group_size": 8,
        "model.use_pallas": True, "model.dtype": "float32"})
    state = create_state(cfg)
    step = jax.jit(make_wgan_gp_step(cfg))
    batch = np.random.default_rng(0).integers(
        0, 8, size=(2, 4, 32, 32)).astype(np.uint8)
    state, metrics = step(state, batch)
    for k in ("d_loss", "g_loss", "gp", "wdist"):
        assert np.isfinite(float(metrics[k])), k


def test_fused_unsupported_for_projection_conditioning():
    """The stage-(c) kernel embodies the concat architecture; projection
    conditioning must be excluded from its support set (and 'fused' must
    fail loudly rather than compute the wrong gradient)."""
    import dataclasses

    from levelgan.kernels.critic_grad import (fused_supported,
                                              make_gradient_penalty)

    m = _critic_cfg(16, cond_dim=4)
    assert fused_supported(m)
    mp = dataclasses.replace(m, cond_mode="projection")
    assert not fused_supported(mp)
    with pytest.raises(ValueError, match="fused"):
        make_gradient_penalty(dataclasses.replace(mp, pallas_gp="fused"))
