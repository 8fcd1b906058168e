"""train.prng_impl: one config knob selects the PRNG end to end.

'threefry2x32' (default) keeps the layout-invariant streams the DP
bit-match guarantee rests on; 'rbg' is the measured-faster TPU option
(BASELINE.md round-2 notes). These tests pin: the knob reaches every
key-construction site via levelgan.rng.key, an rbg run trains and
checkpoints exactly like threefry, and an impl mismatch between a
checkpoint and the resuming config fails loudly instead of corrupting
the restored stream. Reference equivalent: none (SURVEY.md R15 — the
reference uses torch's single global seed).
"""

import jax
import numpy as np
import pytest

from levelgan import rng
from levelgan.config import preset
from levelgan.lio.checkpoint import load_checkpoint, save_checkpoint
from levelgan.train.gan import make_gan_step
from levelgan.train.state import create_state

TINY = {
    "model.base_channels": 16, "model.critic_base_channels": 16,
    "model.latent_dim": 16, "model.group_size": 8,
    "train.batch_size": 8, "data.corpus_size": 32,
}


def _cfg(impl):
    return preset("toy_dcgan_16").override(
        **TINY, **{"train.prng_impl": impl})


def _batch(cfg, seed=0):
    r = np.random.default_rng(seed)
    size = (cfg.train.batch_size, cfg.model.level_size, cfg.model.level_size)
    return r.integers(0, cfg.model.n_tiles, size=size).astype(np.uint8)


def test_key_honors_config_impl():
    assert "rbg" in str(jax.random.key_impl(rng.key(_cfg("rbg"))))
    assert "threefry2x32" in str(
        jax.random.key_impl(rng.key(_cfg("threefry2x32"))))
    # explicit seed overrides train.seed but keeps the impl
    k = rng.key(_cfg("rbg"), 123)
    assert "rbg" in str(jax.random.key_impl(k))


def test_invalid_impl_rejected():
    with pytest.raises(ValueError, match="prng_impl"):
        _cfg("pcg64")


def test_rbg_state_and_step(tmp_path):
    """An rbg run trains (finite losses), and its state — whose rng
    key-data is (4,) uint32 vs threefry's (2,) — checkpoint-roundtrips."""
    cfg = _cfg("rbg")
    state = create_state(cfg)
    assert "rbg" in str(jax.random.key_impl(state.rng))
    step = jax.jit(make_gan_step(cfg))
    for i in range(2):
        state, m = step(state, _batch(cfg, seed=i))
    assert np.isfinite(float(m["d_loss"]))
    assert np.isfinite(float(m["g_loss"]))

    path = save_checkpoint(str(tmp_path), jax.device_get(state), cfg)
    restored, _ = load_checkpoint(path, create_state(cfg, rng.key(cfg, 99)))
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(restored.rng)),
        np.asarray(jax.random.key_data(state.rng)))
    assert "rbg" in str(jax.random.key_impl(restored.rng))


def test_impl_mismatch_fails_loudly(tmp_path):
    """Resuming a threefry checkpoint under prng_impl=rbg must raise
    (key-data shapes differ), not silently mis-wrap the stream."""
    cfg_tf = _cfg("threefry2x32")
    path = save_checkpoint(
        str(tmp_path), jax.device_get(create_state(cfg_tf)), cfg_tf)
    cfg_rbg = _cfg("rbg")
    with pytest.raises(ValueError, match="prng_impl"):
        load_checkpoint(path, create_state(cfg_rbg))
