import jax
import jax.numpy as jnp
import numpy as np

from levelgan.ops.grad_penalty import gradient_penalty, interpolate


def test_interpolate_convex():
    key = jax.random.key(0)
    real = jnp.ones((8, 4, 4, 3))
    fake = jnp.zeros((8, 4, 4, 3))
    x = np.asarray(interpolate(key, real, fake))
    assert (x >= 0).all() and (x <= 1).all()
    # per-sample eps: each sample is constant
    per_sample = x.reshape(8, -1)
    assert np.allclose(per_sample, per_sample[:, :1])
    # samples differ from each other
    assert np.unique(per_sample[:, 0]).size > 4


def test_analytic_linear_critic():
    """For D(x) = <a, x>, grad_x D = a everywhere => gp = (||a|| - 1)^2."""
    a = jax.random.normal(jax.random.key(1), (4, 4, 3))

    def d_apply(params, x, cond):
        return jnp.einsum("bhwc,hwc->b", x, params)

    key = jax.random.key(2)
    real = jax.random.normal(jax.random.key(3), (8, 4, 4, 3))
    fake = jax.random.normal(jax.random.key(4), (8, 4, 4, 3))
    gp = float(gradient_penalty(d_apply, a, key, real, fake))
    expected = (float(jnp.linalg.norm(a)) - 1.0) ** 2
    np.testing.assert_allclose(gp, expected, rtol=1e-5)


def test_gp_double_backward_closed_form():
    """d gp / d a for linear critic: 2(||a||-1) * a/||a|| — the
    double-backward path the north star names."""
    a = jax.random.normal(jax.random.key(5), (3, 3, 2))

    def d_apply(params, x, cond):
        return jnp.einsum("bhwc,hwc->b", x, params)

    key = jax.random.key(6)
    real = jax.random.normal(jax.random.key(7), (4, 3, 3, 2))
    fake = jax.random.normal(jax.random.key(8), (4, 3, 3, 2))

    grad = jax.grad(
        lambda p: gradient_penalty(d_apply, p, key, real, fake))(a)
    norm = jnp.linalg.norm(a)
    expected = 2.0 * (norm - 1.0) * a / norm
    np.testing.assert_allclose(np.asarray(grad), np.asarray(expected),
                               rtol=1e-4)


def test_gp_unit_norm_critic_is_zero():
    a = jax.random.normal(jax.random.key(9), (4, 4, 2))
    a = a / jnp.linalg.norm(a)

    def d_apply(params, x, cond):
        return jnp.einsum("bhwc,hwc->b", x, params)

    gp = float(gradient_penalty(
        d_apply, a, jax.random.key(10),
        jnp.ones((4, 4, 4, 2)), jnp.zeros((4, 4, 4, 2))))
    assert gp < 1e-9
