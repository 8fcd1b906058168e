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

Why the CONCENTRATION term is also needed (measured failure of the
count-only first cut): with the relaxed softmax head the expected-count
hinge is satisfiable DIFFUSELY — at the corpus marginal (~0.1% START)
a 32x32 level carries 1024 x 0.001 ~= 1.0 expected STARTs with no single
cell ever winning the argmax, so a 1500-step wgan_gp_32 run with the
count-only penalty still decoded to has_start 0.0 at every probe
(runs/wgan_presence round-2 history).  ``relu(1 - max_hw p_t)^2`` closes
that hole: it is zero only when some cell commits to the tile with
probability ~1 (exactly the corpus shape: one one-hot START per level),
and its gradient concentrates on each level's best candidate cell — the
differentiable analogue of repair's argmax placement.  For the
straight-through head the forward max is binary (the tile is either
sampled somewhere or not), and the gradient routes to the underlying
softmax of the best cell.

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
    """Mean hinge penalty on structural-tile presence, count + concentration.

    fake: [B, H, W, n_tiles] relaxed or straight-through one-hot sample
    (channel last = tile probability/indicator).  Returns a scalar:
    ``mean_b,t [relu(target - sum_hw fake[b,..,t])^2
                + relu(1 - max_hw fake[b,..,t])^2]`` — zero exactly when
    every level both carries >= ``target`` expected tiles of every kind in
    ``tiles`` AND commits at least one cell to each with probability ~1
    (so the argmax decode actually emits it; see module docstring).
    """
    chans = fake[..., jnp.asarray(tiles)].astype(jnp.float32)  # [B,H,W,|t|]
    count_deficit = jax.nn.relu(
        jnp.float32(target) - chans.sum(axis=(1, 2)))          # [B, |t|]
    conc_deficit = jax.nn.relu(1.0 - chans.max(axis=(1, 2)))   # [B, |t|]
    return (jnp.square(count_deficit) + jnp.square(conc_deficit)).mean()
