"""Gumbel-softmax straight-through sampler + temperature schedule.

Reference equivalent: a torch ``gumbel_softmax`` util with tau annealing and
straight-through estimation (SURVEY.md R5 [NS]).  Pure XLA: the sampler is
elementwise + a channel softmax/argmax, which XLA fuses into the generator's
final stage (SURVEY.md K4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gumbel_softmax(key: jax.Array, logits: jax.Array, tau,
                   hard: bool = True, axis: int = -1) -> jax.Array:
    """Sample from a relaxed categorical over ``axis``.

    hard=True  -> straight-through: forward value is exactly one-hot,
                  gradient is that of the tau-softened softmax.
    hard=False -> the soft relaxed sample itself.
    """
    gumbels = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
    y_soft = jax.nn.softmax((logits + gumbels) / tau, axis=axis)
    if not hard:
        return y_soft
    idx = jnp.argmax(y_soft, axis=axis)
    y_hard = jax.nn.one_hot(idx, logits.shape[axis], dtype=logits.dtype, axis=axis)
    # Straight-through: forward = y_hard, backward = d(y_soft).
    return y_soft + jax.lax.stop_gradient(y_hard - y_soft)


def tau_schedule(step, tau_start: float, tau_end: float, anneal_steps: int):
    """Exponential tau anneal from tau_start to tau_end over anneal_steps."""
    if anneal_steps <= 0:
        return jnp.asarray(tau_end, dtype=jnp.float32)
    frac = jnp.clip(step / anneal_steps, 0.0, 1.0).astype(jnp.float32)
    log_tau = (1.0 - frac) * jnp.log(tau_start) + frac * jnp.log(tau_end)
    return jnp.exp(log_tau)
