import jax.numpy as jnp
import numpy as np

from levelgan.config import COIN, GOAL, HAZARD, START, WALL
from levelgan.data.features import level_features


def test_features_handbuilt():
    lv = np.zeros((8, 8), np.uint8)
    lv[0, :] = WALL  # 8 walls
    lv[1, 1] = START
    lv[6, 5] = GOAL
    lv[3, 3] = HAZARD
    lv[4, 4] = COIN
    lv[5, 5] = COIN
    f = np.asarray(level_features(jnp.asarray(lv[None])))[0]
    np.testing.assert_allclose(f[0], 8 / 64)    # wall frac
    np.testing.assert_allclose(f[1], 1 / 64)    # hazard frac
    np.testing.assert_allclose(f[2], 2 / 64)    # coin frac
    np.testing.assert_allclose(f[3], (5 + 4) / 16)  # L1(S,G)/(h+w)


def test_features_d4_invariant():
    """Conditioning features are invariant under the augmentation group —
    the property wgan_gp.py relies on for the G-update cond."""
    import jax
    from levelgan.data.augment import d4_apply
    from levelgan.data.dataset import synthetic_corpus

    levels = jnp.asarray(synthetic_corpus(4, 16, seed=3))
    base = np.asarray(level_features(levels))
    for e in range(8):
        aug = jax.vmap(lambda x: d4_apply(x, jnp.asarray(e)))(levels)
        np.testing.assert_allclose(
            np.asarray(level_features(aug)), base, atol=1e-6)


def test_features_batch_range():
    from levelgan.data.dataset import synthetic_corpus
    f = np.asarray(level_features(jnp.asarray(synthetic_corpus(16, 16, seed=1))))
    assert f.shape == (16, 4)
    assert (f >= 0).all() and (f <= 1).all()


def test_soft_features_match_hard_on_onehot():
    """On corpus-shaped levels (one START, one GOAL) the differentiable
    twin equals level_features exactly."""
    import jax
    import jax.numpy as jnp
    from levelgan.data.codec import encode
    from levelgan.data.dataset import synthetic_corpus
    from levelgan.data.features import level_features, soft_level_features

    ids = synthetic_corpus(32, 16, seed=0)
    hard = np.asarray(level_features(jnp.asarray(ids)))
    soft = np.asarray(soft_level_features(encode(jnp.asarray(ids), 8)))
    np.testing.assert_allclose(soft, hard, atol=1e-4)


def test_soft_features_gradient_flows():
    import jax
    import jax.numpy as jnp
    from levelgan.data.features import soft_level_features

    logits = jax.random.normal(jax.random.key(0), (2, 8, 8, 8))

    def loss(lg):
        f = soft_level_features(jax.nn.softmax(lg, -1))
        return jnp.square(f - 0.3).mean()

    g = jax.grad(loss)(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
