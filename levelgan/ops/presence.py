"""Differentiable structural-tile presence prior (``train.w_presence``).

Motivation (measured — artifacts/quality_wgan_gp_32.json): the plain
adversarial objective mode-drops the rarest structural tiles.  START and
GOAL are ~0.1% of corpus tiles each, and a converged wgan_gp_32 checkpoint
whose tile-marginal KL gate PASSES at 0.0023 emits zero of either, so 0%
of its levels are solvable.  The reference's deep fix is the
agent-in-the-loop curriculum (config 5); ``ops/repair.py`` is the post-hoc
decode-time fix.  This op is the IN-TRAINING fix for the plain GAN
families (configs 1-4): a hinge penalty on the per-level *expected* count
of each structural tile, differentiable straight through the relaxed
sample — a direct low-variance gradient where the curriculum needs a
score-function estimator.

Why a hinge at 1 (and not a marginal-matching term): the corpus invariant
is "every level contains at least one START and one GOAL"
(data/dataset.py).  ``relu(1 - E[count])^2`` is zero once a level carries
one expected tile of each kind, so the prior vanishes at the corpus
optimum and cannot distort converged marginals — it only re-injects the
dropped mass.  With the straight-through Gumbel head the forward count is
the hard count (integer), and the gradient flows through the underlying
softmax path; with the relaxed softmax head the count itself is the soft
expectation.

Reference parity: no equivalent (the reference's answer to playability is
the RL curriculum, SURVEY.md R9); default ``w_presence=0.0`` keeps every
preset loss-identical to the reference-shaped objective.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from levelgan.config import GOAL, START

STRUCTURAL_TILES = (START, GOAL)


def presence_penalty(fake: jax.Array, tiles=STRUCTURAL_TILES,
                     target: float = 1.0) -> jax.Array:
    """Mean hinge penalty on per-level expected structural-tile counts.

    fake: [B, H, W, n_tiles] relaxed or straight-through one-hot sample
    (channel last = tile probability/indicator).  Returns a scalar:
    ``mean_b,t relu(target - sum_hw fake[b,..,t])^2`` — zero exactly when
    every level carries >= ``target`` expected tiles of every kind in
    ``tiles``.
    """
    counts = fake[..., jnp.asarray(tiles)].sum(axis=(1, 2))  # [B, len(tiles)]
    deficit = jax.nn.relu(jnp.float32(target) - counts.astype(jnp.float32))
    return jnp.square(deficit).mean()
