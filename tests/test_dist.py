"""Distributed tier (SURVEY.md §4.2): DP on a fake 8-device mesh must match
the single-device step on the same global batch."""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from levelgan.config import preset
from levelgan.dist.mesh import make_mesh, replicated_sharding, shard_batch
from levelgan.train.gan import make_gan_step
from levelgan.train.state import create_state

TINY = {
    "model.base_channels": 16, "model.critic_base_channels": 16,
    "model.latent_dim": 16, "model.group_size": 8,
    "train.batch_size": 16, "data.corpus_size": 32,
    # f32 compute: the mesh-equivalence check compares post-Adam params,
    # and Adam normalizes away gradient scale — bf16 reduction-order noise
    # would dominate the comparison.
    "model.dtype": "float32",
}


def _run_steps(cfg, mesh, batches):
    repl = replicated_sharding(mesh)
    b_shard = NamedSharding(mesh, P("data"))
    state = jax.jit(lambda k: create_state(cfg, k), out_shardings=repl)(
        jax.random.key(0))
    step = jax.jit(make_gan_step(cfg), in_shardings=(repl, b_shard))
    for b in batches:
        state, m = step(state, jax.device_put(b, b_shard))
    return jax.device_get(state), jax.device_get(m)


def test_mesh_sizes(devices8):
    assert make_mesh(0).devices.size == 8
    assert make_mesh(2).devices.size == 2
    with pytest.raises(ValueError):
        make_mesh(16)


def test_shard_batch_places_on_mesh(devices8):
    mesh = make_mesh(4)
    x = shard_batch(mesh, np.zeros((16, 8, 8), np.uint8))
    assert len(x.devices()) == 4


@pytest.mark.slow
def test_dp8_matches_single_device(devices8):
    """Same global batch: 8-way DP step == single-device step (grad pmean
    emitted by XLA from shardings)."""
    cfg = preset("toy_dcgan_16").override(**TINY)
    rng = np.random.default_rng(0)
    batches = [rng.integers(0, 8, size=(16, 16, 16)).astype(np.uint8)
               for _ in range(2)]

    state1, m1 = _run_steps(cfg, make_mesh(1), batches)
    state8, m8 = _run_steps(cfg, make_mesh(8), batches)

    assert np.isfinite(m8["d_loss"])
    np.testing.assert_allclose(m1["d_loss"], m8["d_loss"], rtol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=5e-4, atol=5e-6),
        state1.generator, state8.generator)


def test_2d_mesh_expresses_channel_sharding(devices8):
    """SURVEY.md §2.3: TP is not built, but the mesh must be able to EXPRESS
    channel sharding as a pure annotation.  A (data=4, model=2) mesh with a
    'model'-sharded conv kernel must produce the replicated-weights result
    (XLA inserts the collectives from the specs alone)."""
    import jax.numpy as jnp

    mesh = make_mesh(4, tp=2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)

    x = np.random.default_rng(0).normal(size=(8, 8, 8, 16)).astype(np.float32)
    w = np.random.default_rng(1).normal(size=(3, 3, 16, 32)).astype(np.float32)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y_repl = conv(x, w)
    f = jax.jit(conv, in_shardings=(
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P(None, None, None, "model"))))
    y_tp = f(jax.device_put(x, NamedSharding(mesh, P("data"))),
             jax.device_put(w, NamedSharding(mesh, P(None, None, None,
                                                     "model"))))
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_repl),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_tp_sharded_train_step_matches_replicated(devices8):
    """The FULL vanilla-GAN train step on a (data=4, model=2) mesh with
    channel-sharded weights (tp_param_sharding) must reproduce the
    replicated single-device step — TP as pure annotation, collectives
    emitted by GSPMD."""
    from levelgan.dist.mesh import tp_param_sharding

    cfg = preset("toy_dcgan_16").override(**TINY)
    rng = np.random.default_rng(0)
    batches = [rng.integers(0, 8, size=(16, 16, 16)).astype(np.uint8)
               for _ in range(2)]

    state1, m1 = _run_steps(cfg, make_mesh(1), batches)

    mesh = make_mesh(4, tp=2)
    shapes = jax.eval_shape(lambda k: create_state(cfg, k),
                            jax.random.key(0))
    st_shard = tp_param_sharding(mesh, shapes)
    # sanity: at least one conv kernel actually ends up 'model'-sharded
    specs = [s.spec for s in jax.tree_util.tree_leaves(st_shard)]
    assert any("model" in (ax for ax in sp if ax) for sp in specs)

    b_shard = NamedSharding(mesh, P("data"))
    state = jax.jit(lambda k: create_state(cfg, k), out_shardings=st_shard)(
        jax.random.key(0))
    # pin the OUTPUT state to the same shardings: left free, GSPMD may
    # re-shard outputs and the next call's in_shardings check rejects them
    repl = replicated_sharding(mesh)
    m_shapes = jax.eval_shape(make_gan_step(cfg), shapes,
                              jax.ShapeDtypeStruct((16, 16, 16), np.uint8))[1]
    step = jax.jit(make_gan_step(cfg), in_shardings=(st_shard, b_shard),
                   out_shardings=(st_shard,
                                  jax.tree_util.tree_map(
                                      lambda _: repl, m_shapes)))
    for b in batches:
        state, m = step(state, jax.device_put(b, b_shard))
    state_tp, m_tp = jax.device_get(state), jax.device_get(m)

    np.testing.assert_allclose(m1["d_loss"], m_tp["d_loss"], rtol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=5e-4, atol=5e-6),
        state1.generator, state_tp.generator)


def test_batch_not_divisible_rejected(devices8):
    from levelgan.api import train
    cfg = preset("toy_dcgan_16").override(
        **{**TINY, "train.batch_size": 12, "dist.dp": 8})
    with pytest.raises(ValueError):
        train(cfg)
