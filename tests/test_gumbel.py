import jax
import jax.numpy as jnp
import numpy as np

from levelgan.ops import gumbel_softmax, tau_schedule


def test_hard_is_onehot():
    key = jax.random.key(0)
    logits = jax.random.normal(jax.random.key(1), (4, 8, 8, 6))
    y = gumbel_softmax(key, logits, tau=1.0, hard=True)
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, rtol=1e-6)
    assert set(np.unique(np.asarray(y))) <= {0.0, 1.0}


def test_soft_is_simplex():
    y = gumbel_softmax(jax.random.key(0),
                       jax.random.normal(jax.random.key(1), (16, 6)),
                       tau=0.7, hard=False)
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, rtol=1e-5)
    assert (np.asarray(y) >= 0).all()


def test_straight_through_gradient():
    """grad of hard ST sample == grad of the soft path."""
    logits = jax.random.normal(jax.random.key(2), (8, 6))
    key = jax.random.key(3)

    def loss_hard(lg):
        return (gumbel_softmax(key, lg, 0.8, hard=True) ** 2).sum()

    def loss_soft_valgrad(lg):
        # same downstream fn evaluated with gradient flowing through y_soft,
        # but forward value taken at y_hard: d/dlg sum(y_hard * ... ) —
        # for f(y)=sum(y^2), ST grad = 2*y_hard . dy_soft/dlg
        y_soft = gumbel_softmax(key, lg, 0.8, hard=False)
        y_hard = jax.lax.stop_gradient(
            jax.nn.one_hot(jnp.argmax(y_soft, -1), 6))
        y = y_soft + jax.lax.stop_gradient(y_hard - y_soft)
        return (y ** 2).sum()

    g1 = jax.grad(loss_hard)(logits)
    g2 = jax.grad(loss_soft_valgrad)(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)
    assert np.abs(np.asarray(g1)).sum() > 0


def test_low_tau_matches_argmax_of_logits_statistically():
    """At very low tau with zero-gumbel... instead: samples follow softmax(logits)."""
    logits = jnp.log(jnp.asarray([0.7, 0.2, 0.1]))
    keys = jax.random.split(jax.random.key(4), 4000)
    ys = jax.vmap(lambda k: gumbel_softmax(k, logits, 0.5, hard=True))(keys)
    freq = np.asarray(ys.mean(0))
    np.testing.assert_allclose(freq, [0.7, 0.2, 0.1], atol=0.03)


def test_tau_schedule():
    assert float(tau_schedule(0, 2.0, 0.5, 100)) == 2.0
    np.testing.assert_allclose(float(tau_schedule(100, 2.0, 0.5, 100)), 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(tau_schedule(500, 2.0, 0.5, 100)), 0.5, rtol=1e-6)
    mid = float(tau_schedule(50, 2.0, 0.5, 100))
    assert 0.5 < mid < 2.0
