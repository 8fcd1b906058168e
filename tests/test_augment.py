import itertools

import jax
import jax.numpy as jnp
import numpy as np

from levelgan.data import augment, d4_apply, encode


def _grid(h=6):
    return jnp.arange(h * h, dtype=jnp.float32).reshape(h, h)


def test_d4_identity():
    x = _grid()
    np.testing.assert_array_equal(np.asarray(d4_apply(x, jnp.asarray(0))), np.asarray(x))


def test_d4_matches_numpy():
    x = _grid()
    xn = np.asarray(x)
    for e in range(8):
        got = np.asarray(d4_apply(x, jnp.asarray(e)))
        want = xn[:, ::-1] if e >= 4 else xn
        want = np.rot90(want, k=e % 4)
        np.testing.assert_array_equal(got, want, err_msg=f"element {e}")


def test_d4_is_a_group():
    """Closure: composing any two elements lands back in the 8-element set."""
    x = _grid()
    all_imgs = [np.asarray(d4_apply(x, jnp.asarray(e))) for e in range(8)]
    for a, b in itertools.product(range(8), repeat=2):
        composed = np.asarray(d4_apply(d4_apply(x, jnp.asarray(a)), jnp.asarray(b)))
        assert any(np.array_equal(composed, img) for img in all_imgs), (a, b)


def test_d4_preserves_histogram():
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 8, size=(16, 16)).astype(np.uint8))
    for e in range(8):
        out = np.asarray(d4_apply(ids, jnp.asarray(e)))
        np.testing.assert_array_equal(
            np.bincount(out.reshape(-1), minlength=8),
            np.bincount(np.asarray(ids).reshape(-1), minlength=8))


def test_augment_batch_onehot_consistency():
    """Augmenting ids then encoding == encoding then augmenting one-hot."""
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 8, size=(8, 12, 12)).astype(np.uint8))
    key = jax.random.key(3)
    aug_ids = augment(key, ids)                             # [B,H,W]
    aug_oh = augment(key, encode(ids, 8), spatial_offset=1)  # [B,H,W,C]
    np.testing.assert_array_equal(np.asarray(encode(aug_ids, 8)), np.asarray(aug_oh))


def test_augment_jits():
    ids = jnp.zeros((4, 8, 8), dtype=jnp.uint8)
    out = jax.jit(augment)(jax.random.key(0), ids)
    assert out.shape == ids.shape


def test_augment_covers_group():
    """With enough samples every one of the 8 elements occurs."""
    x = _grid(4)
    batch = jnp.broadcast_to(x, (256, 4, 4))
    out = np.asarray(augment(jax.random.key(7), batch))
    uniq = {out[i].tobytes() for i in range(out.shape[0])}
    assert len(uniq) == 8
