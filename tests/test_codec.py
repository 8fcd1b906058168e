import jax
import jax.numpy as jnp
import numpy as np

from levelgan.data import encode, decode


def test_roundtrip():
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 8, size=(4, 16, 16)).astype(np.uint8)
    onehot = encode(jnp.asarray(ids), 8)
    assert onehot.shape == (4, 16, 16, 8)
    assert onehot.dtype == jnp.float32
    back = decode(onehot)
    assert back.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(back), ids)


def test_encode_is_onehot():
    ids = jnp.asarray([[0, 3], [7, 1]], dtype=jnp.uint8)
    oh = encode(ids, 8)
    np.testing.assert_allclose(np.asarray(oh.sum(-1)), 1.0)
    assert oh[0, 1, 3] == 1.0 and oh[1, 0, 7] == 1.0


def test_decode_soft_samples():
    # decode works on soft distributions (argmax semantics)
    soft = jnp.asarray([[[0.1, 0.7, 0.2], [0.5, 0.25, 0.25]]])
    ids = decode(soft)
    np.testing.assert_array_equal(np.asarray(ids), [[1, 0]])


def test_jit_and_bf16():
    ids = jnp.zeros((2, 8, 8), dtype=jnp.uint8)
    oh = jax.jit(lambda x: encode(x, 8, dtype=jnp.bfloat16))(ids)
    assert oh.dtype == jnp.bfloat16
    assert decode(oh).shape == (2, 8, 8)
