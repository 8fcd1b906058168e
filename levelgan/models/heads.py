"""Sampling heads: logits -> level tensor, per estimator.

The generator returns raw tile logits; every consumer picks its estimator
here (SURVEY.md K4/N9):
  'softmax' — soft relaxed level (differentiable; vanilla GAN path)
  'gumbel'  — straight-through Gumbel-softmax: hard one-hot forward,
              soft gradient (discrete-tile configs 3-5)
  'argmax'  — hard one-hot, no gradient (export / eval)

``structural='spatial'`` (model.structural_head, round 5) additionally
realizes the corpus's exactly-one START/GOAL invariant in the sample
itself: the trunk's START/GOAL channels are removed from the per-cell
tile categorical and reinterpreted as per-POSITION logits, from which one
START cell and one GOAL cell are drawn (spatial softmax / Gumbel-ST /
argmax over the H*W cells, matching ``head``) and composed with the
non-structural sample.  Forward value under the hard heads: a valid
one-hot level with exactly one START and exactly one GOAL; gradient flows
to the structural logits through the spatial relaxation and to the trunk
through the base sample.  The GOAL draw masks out the chosen START cell
(hard heads), so the two never collide.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from levelgan.config import GOAL, START
from levelgan.ops.gumbel import gumbel_softmax

_NEG = -1e9  # additive logit mask; finite so masked softmax stays exact 0-mass


def sample_head(key, logits, head: str, tau=1.0, structural: str = "none"):
    if structural == "spatial":
        return _spatial_structural(key, logits, head, tau)
    return _plain_head(key, logits, head, tau)


def _plain_head(key, logits, head: str, tau):
    if head == "softmax":
        return jax.nn.softmax(logits, axis=-1)
    if head == "gumbel":
        return gumbel_softmax(key, logits, tau, hard=True)
    if head == "argmax":
        idx = jnp.argmax(logits, axis=-1)
        return jax.nn.one_hot(idx, logits.shape[-1], dtype=logits.dtype)
    raise ValueError(f"unknown head '{head}'")


def _spatial_select(key, lmap, head: str, tau):
    """One cell from per-position logits [B, H, W] -> map summing to 1.

    Soft head: spatial softmax (expected placement); hard heads: one-hot
    cell, straight-through for 'gumbel'.
    """
    b, h, w = lmap.shape
    flat = lmap.reshape(b, h * w)
    if head == "softmax":
        sel = jax.nn.softmax(flat, axis=-1)
    elif head == "gumbel":
        sel = gumbel_softmax(key, flat, tau, hard=True)
    elif head == "argmax":
        sel = jax.nn.one_hot(jnp.argmax(flat, axis=-1), h * w,
                             dtype=lmap.dtype)
    else:
        raise ValueError(f"unknown head '{head}'")
    return sel.reshape(b, h, w)


def _spatial_structural(key, logits, head: str, tau):
    n_tiles = logits.shape[-1]
    if n_tiles <= max(START, GOAL):
        raise ValueError(f"structural_head='spatial' needs n_tiles > "
                         f"{max(START, GOAL)}, got {n_tiles}")
    k_base, k_s, k_g = jax.random.split(key, 3)

    # Non-structural tile sample: structural channels masked out of the
    # per-cell categorical (exact zero mass under every head).
    chan = jnp.arange(n_tiles)
    struct_chan = (chan == START) | (chan == GOAL)
    base = _plain_head(k_base, jnp.where(struct_chan, _NEG, logits),
                       head, tau)

    s_map = _spatial_select(k_s, logits[..., START], head, tau)
    g_logits = logits[..., GOAL]
    if head != "softmax":
        # hard START cell is off-limits to GOAL; mask is sample-dependent
        # data, not a differentiable path
        g_logits = jnp.where(jax.lax.stop_gradient(s_map) > 0.5, _NEG,
                             g_logits)
    g_map = _spatial_select(k_g, g_logits, head, tau)

    start_oh = jax.nn.one_hot(START, n_tiles, dtype=logits.dtype)
    goal_oh = jax.nn.one_hot(GOAL, n_tiles, dtype=logits.dtype)
    # Sequential convex composition keeps every cell on the simplex; the
    # START overlay comes last so it wins any soft overlap.
    out = base * (1.0 - g_map[..., None]) + g_map[..., None] * goal_oh
    out = out * (1.0 - s_map[..., None]) + s_map[..., None] * start_oh
    return out
