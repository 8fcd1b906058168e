"""On-device difficulty / feature-vector extraction for conditioning.

Reference equivalent: the conditional path feeds a difficulty/feature vector
into G (SURVEY.md R10 [NS],[TK-L]).  Here the condition of a *real* level is
computed from the level itself, fully in XLA, inside the train step: fake
samples are conditioned on the real batch's features (standard cGAN pairing),
and at export time users pass explicit feature vectors.

Features (cond_dim=4): [wall fraction, hazard fraction, coin fraction,
normalized start->goal L1 distance] — each in [0, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from levelgan.config import COIN, GOAL, HAZARD, START, WALL

FEATURE_NAMES = ("wall_frac", "hazard_frac", "coin_frac", "goal_dist")
N_FEATURES = 4


def level_features(ids: jax.Array) -> jax.Array:
    """uint8 tile ids [B, H, W] -> features [B, 4], float32, on-device."""
    ids = ids.astype(jnp.int32)
    b, h, w = ids.shape
    area = h * w

    def frac(tile):
        return (ids == tile).sum(axis=(1, 2)).astype(jnp.float32) / area

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def pos_of(tile):
        mask = (ids == tile)
        flat = mask.reshape(b, -1)
        idx = jnp.argmax(flat, axis=-1)  # first occurrence (0 if absent)
        return rows.reshape(-1)[idx], cols.reshape(-1)[idx]

    sr, sc = pos_of(START)
    gr, gc = pos_of(GOAL)
    dist = (jnp.abs(sr - gr) + jnp.abs(sc - gc)).astype(jnp.float32) / (h + w)

    return jnp.stack([frac(WALL), frac(HAZARD), frac(COIN), dist], axis=-1)
