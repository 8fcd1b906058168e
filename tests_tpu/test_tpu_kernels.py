"""Real-TPU kernel tier (SURVEY.md §4.2; VERDICT.md round-1 item 2).

K1/K2 forward+backward parity vs the XLA oracles, compiled through Mosaic
on the actual chip at gumbel_64 scale (batch 64, 64x64x8 — the VMEM
batch-tiling regime), plus one ``use_pallas=true`` train step per family.
Tolerances are bf16-scale where the shipped compute dtype is bf16.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from levelgan.config import preset
from levelgan.kernels.upsample_block import upsample_block_pallas
from levelgan.ops.blocks import upsample_block_xla


def _stage_io(b, h, ci, co, seed=0):
    ks = jax.random.split(jax.random.key(seed), 4)
    x = jax.random.normal(ks[0], (b, h, h, ci), jnp.float32)
    w = jax.random.normal(ks[1], (4, 4, ci, co), jnp.float32) * 0.05
    gamma = jax.random.uniform(ks[2], (co,), minval=0.5, maxval=1.5)
    beta = jax.random.normal(ks[3], (co,)) * 0.1
    return x, w, gamma, beta


# gumbel_64 generator stages at the shipped batch 64 (models.generator):
GUMBEL64_STAGES = [(64, 4, 512, 256), (64, 8, 256, 128),
                   (64, 16, 128, 64), (64, 32, 64, 32)]


@pytest.mark.parametrize("b,h,ci,co", GUMBEL64_STAGES)
def test_k1_forward_parity_on_tpu(b, h, ci, co):
    x, w, gamma, beta = _stage_io(b, h, ci, co)
    f_x = jax.jit(lambda *a: upsample_block_xla(
        *a, group_size=16, compute_dtype=jnp.float32))
    f_p = jax.jit(lambda *a: upsample_block_pallas(
        *a, group_size=16, compute_dtype=jnp.float32))
    y_x = np.asarray(f_x(x, w, gamma, beta))
    y_p = np.asarray(f_p(x, w, gamma, beta))
    np.testing.assert_allclose(y_p, y_x, atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("b,h,ci,co", GUMBEL64_STAGES)
def test_k1_backward_parity_on_tpu(b, h, ci, co):
    x, w, gamma, beta = _stage_io(b, h, ci, co)

    def grads(fn):
        def loss(x, w, g, bb):
            y = fn(x, w, g, bb, group_size=16, compute_dtype=jnp.float32)
            return (y ** 2).mean()
        return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(
            x, w, gamma, beta)

    gx = grads(upsample_block_xla)
    gp = grads(upsample_block_pallas)
    for i, (a, bb) in enumerate(zip(gx, gp)):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   atol=5e-3, rtol=5e-3, err_msg=f"arg {i}")


def test_k2_penalty_parity_on_tpu():
    """norm_penalty fwd+bwd at gumbel_64 scale: F = 64*64*8 f32 per sample
    is the over-VMEM-without-tiling regime (round-1 commit 2d2b226)."""
    from levelgan.kernels.gp_penalty import norm_penalty

    b, f = 64, 64 * 64 * 8
    g2 = jax.random.normal(jax.random.key(0), (b, f), jnp.float32)

    def oracle(g2):
        return jnp.square(jnp.sqrt(jnp.sum(g2 * g2, axis=1) + 1e-12) - 1.0)

    p = np.asarray(jax.jit(norm_penalty)(g2))
    o = np.asarray(jax.jit(oracle)(g2))
    np.testing.assert_allclose(p, o, atol=1e-3, rtol=1e-4)

    w = jax.random.normal(jax.random.key(1), (b,))
    gp_ = np.asarray(jax.jit(jax.grad(
        lambda g: (norm_penalty(g) * w).sum()))(g2))
    go = np.asarray(jax.jit(jax.grad(
        lambda g: (oracle(g) * w).sum()))(g2))
    np.testing.assert_allclose(gp_, go, atol=1e-3, rtol=1e-3)


def _one_pallas_step(preset_name, n_steps=2):
    """One (or two) full use_pallas=true train steps on the chip."""
    from levelgan import api

    cfg = preset(preset_name).override(**{
        "model.use_pallas": True, "train.steps": n_steps,
        "train.steps_per_dispatch": 1, "data.corpus_size": 256,
    })
    step_fn, kind = api.make_step_fn(cfg)
    state = jax.jit(lambda k: api.make_state(cfg, k))(
        jax.random.key(0))
    ds = api.make_dataset(cfg)
    jit_step = jax.jit(step_fn, donate_argnums=(0,))
    for s in range(n_steps):
        batch = api.sample_batch(cfg, ds, kind, step=s)
        state, metrics = jit_step(state, jnp.asarray(batch))
    return {k: float(np.asarray(v)) for k, v in metrics.items()
            if np.asarray(v).ndim == 0}


def test_pallas_train_step_wgan_gp_32():
    m = _one_pallas_step("wgan_gp_32")
    assert np.isfinite(m["d_loss"]) and np.isfinite(m["g_loss"])
    assert np.isfinite(m["gp"])


def test_pallas_train_step_gumbel_64():
    m = _one_pallas_step("gumbel_64")
    assert np.isfinite(m["d_loss"]) and np.isfinite(m["g_loss"])
    assert np.isfinite(m["gp"])
