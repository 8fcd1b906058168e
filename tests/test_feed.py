"""Device-resident data feed (DataConfig.feed='device').

The shipped TPU path stages the whole corpus in HBM once and samples
minibatch indices inside the jit step, so a training dispatch carries no
per-step host->device data (SURVEY.md §3.1: the reference's per-step host
copy, eliminated rather than overlapped).  Tests: determinism, resume
equivalence, 1-vs-8-device DP equivalence of the on-device draw, and
host-feed fallback for oversized corpora.
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # fast tier: pytest -m 'not slow'

from levelgan import api
from levelgan.api import (corpus_array, make_dataset, make_device_feed_step,
                          make_multi_step_device, make_state, make_step_fn)
from levelgan.config import preset
from levelgan.dist.mesh import make_mesh, replicated_sharding

TINY = {
    "model.base_channels": 16, "model.critic_base_channels": 16,
    "model.latent_dim": 16, "model.group_size": 8,
    "train.batch_size": 16, "train.n_critic": 2, "data.corpus_size": 32,
    "model.dtype": "float32",
}


def _run(cfg, mesh, n_steps, state=None):
    repl = replicated_sharding(mesh)
    ds = make_dataset(cfg)
    step_fn, kind = make_step_fn(cfg)
    fed = make_device_feed_step(cfg, step_fn, kind, mesh)
    corpus = jax.device_put(corpus_array(ds), repl)
    jit_fed = jax.jit(fed, in_shardings=(repl, repl))
    if state is None:
        state = jax.jit(lambda k: make_state(cfg, k), out_shardings=repl)(
            jax.random.key(cfg.train.seed))
    m = None
    for _ in range(n_steps):
        state, m = jit_fed(state, corpus)
    return jax.device_get(state), jax.device_get(m)


def test_device_feed_runs_and_is_deterministic(devices8):
    cfg = preset("wgan_gp_32").override(**TINY)
    mesh = make_mesh(1)
    s1, m1 = _run(cfg, mesh, 3)
    s2, m2 = _run(cfg, mesh, 3)
    assert np.isfinite(m1["d_loss"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        s1.generator, s2.generator)


def test_device_feed_resume_matches_uninterrupted(devices8):
    """Stateless (seed, step) draws: 2+2 steps == 4 straight steps."""
    cfg = preset("wgan_gp_32").override(**TINY)
    mesh = make_mesh(1)
    s4, _ = _run(cfg, mesh, 4)
    s2, _ = _run(cfg, mesh, 2)
    # "resume": restart from s2's host copy, as checkpoint load does
    repl = replicated_sharding(mesh)
    s2dev = jax.device_put(s2, repl)
    s22, _ = _run(cfg, mesh, 2, state=s2dev)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=0, atol=0),
        s4.generator, s22.generator)


def test_device_feed_dp8_matches_single(devices8):
    """Replicated index draw + sharded gather: same batches on any mesh."""
    cfg = preset("toy_dcgan_16").override(**TINY)
    s1, m1 = _run(cfg, make_mesh(1), 2)
    s8, m8 = _run(cfg, make_mesh(8), 2)
    assert np.isfinite(m8["d_loss"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=0, atol=2e-5),
        s1.generator, s8.generator)


def test_device_feed_multi_step_counts_steps(devices8):
    cfg = preset("wgan_gp_32").override(**TINY)
    mesh = make_mesh(1)
    repl = replicated_sharding(mesh)
    ds = make_dataset(cfg)
    step_fn, kind = make_step_fn(cfg)
    fed = make_device_feed_step(cfg, step_fn, kind, mesh)
    corpus = jax.device_put(corpus_array(ds), repl)
    multi = jax.jit(make_multi_step_device(fed, 3), in_shardings=(repl, repl))
    state = jax.jit(lambda k: make_state(cfg, k), out_shardings=repl)(
        jax.random.key(0))
    state, m = multi(state, corpus)
    assert int(jax.device_get(state.step)) == 3
    assert np.isfinite(jax.device_get(m["d_loss"]))
    assert m["gen_hist"].shape == (cfg.model.n_tiles,)


def test_track_family_device_feed(devices8):
    cfg = preset("racetrack_32").override(**{
        "train.batch_size": 8, "train.n_critic": 2, "data.corpus_size": 16,
        "model.rnn_hidden": 32, "model.latent_dim": 16,
        "model.dtype": "float32"})
    _, m = _run(cfg, make_mesh(1), 2)
    assert np.isfinite(m["d_loss"])


def test_oversized_corpus_falls_back_to_host(devices8, tmp_path, monkeypatch):
    cfg = preset("toy_dcgan_16").override(**TINY).override(**{
        "train.steps": 2, "train.steps_per_dispatch": 1,
        "io.out_dir": str(tmp_path / "run"), "io.log_every": 0,
        "io.ckpt_every": 0})
    monkeypatch.setattr(api, "_DEVICE_CORPUS_BUDGET", 1)  # force fallback
    out = api.train(cfg, echo=False)
    assert np.isfinite(out["metrics"].get("d_loss", 0.0))


def test_api_train_device_feed_end_to_end(devices8, tmp_path):
    cfg = preset("toy_dcgan_16").override(**TINY).override(**{
        "train.steps": 4, "train.steps_per_dispatch": 3,  # exercises tail<spd
        "io.out_dir": str(tmp_path / "run"), "io.log_every": 2,
        "io.ckpt_every": 0})
    assert cfg.data.feed == "device"
    out = api.train(cfg, echo=False)
    assert int(jax.device_get(out["state"].step)) == 4
