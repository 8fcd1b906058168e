"""Sampling heads: logits -> level tensor, per estimator.

The generator returns raw tile logits; every consumer picks its estimator
here (SURVEY.md K4/N9):
  'softmax' — soft relaxed level (differentiable; vanilla GAN path)
  'gumbel'  — straight-through Gumbel-softmax: hard one-hot forward,
              soft gradient (discrete-tile configs 3-5)
  'argmax'  — hard one-hot, no gradient (export / eval)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from levelgan.ops.gumbel import gumbel_softmax


def sample_head(key, logits, head: str, tau=1.0):
    if head == "softmax":
        return jax.nn.softmax(logits, axis=-1)
    if head == "gumbel":
        return gumbel_softmax(key, logits, tau, hard=True)
    if head == "argmax":
        idx = jnp.argmax(logits, axis=-1)
        return jax.nn.one_hot(idx, logits.shape[-1], dtype=logits.dtype)
    raise ValueError(f"unknown head '{head}'")
