"""WGAN-GP gradient penalty — pure-XLA oracle implementation.

Reference equivalent: ``torch.autograd.grad(D(x_hat), x_hat,
create_graph=True)`` + ``((||g||-1)^2).mean()`` (SURVEY.md R4/K2 [NS]).

In JAX the double-backward needs no special machinery: the penalty below is
an ordinary differentiable function of the critic params (the inner
``jax.grad`` w.r.t. inputs composes under the outer ``jax.grad`` w.r.t.
params), and XLA fuses the whole thing into the step program.  This
implementation is the permanent correctness oracle (SURVEY.md §7.4 item 1);
the fused Pallas kernel K2 must match it to tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interpolate(key: jax.Array, real: jax.Array, fake: jax.Array) -> jax.Array:
    """x_hat = eps*real + (1-eps)*fake with per-sample eps ~ U[0,1]."""
    eps = jax.random.uniform(
        key, (real.shape[0],) + (1,) * (real.ndim - 1), dtype=real.dtype)
    return eps * real + (1.0 - eps) * fake


def gradient_penalty(d_apply, params_d, key, real, fake, cond=None) -> jax.Array:
    """E[(||grad_x_hat D(x_hat)||_2 - 1)^2].

    ``d_apply(params, x, cond) -> [B] scores``.  Differentiable w.r.t.
    ``params_d`` (the double backward the north star names).
    """
    with jax.named_scope("K2_grad_penalty_xla"):
        x_hat = interpolate(key, real, fake)

        def d_sum(x):
            return d_apply(params_d, x, cond).astype(jnp.float32).sum()

        # Sum trick: outputs are per-sample independent, so grad of the sum
        # is the batch of per-sample input gradients.  Exception: with
        # model.critic_mbstd set, the minibatch-stddev channel couples
        # scores through the batch, so g gains cross-sample terms — the
        # penalty then regularizes the batch-coupled critic as a whole
        # (standard ProGAN practice accepts this; documented in config.py).
        g = jax.grad(d_sum)(x_hat)
        sq = jnp.sum(jnp.square(g.astype(jnp.float32)),
                     axis=tuple(range(1, g.ndim)))
        norms = jnp.sqrt(sq + 1e-12)
        return jnp.mean(jnp.square(norms - 1.0))
