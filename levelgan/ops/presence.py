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

Why the SPREAD term (round-3 fix for the measured positional collapse):
the count+concentration prior reaches 0.943 solvable on wgan_gp_32 but
inflates the structural channels' per-position chi2/dof 7.6 -> 846
(BASELINE.md round 2): the concentration hinge's gradient always lands
on each level's current-best cell, so the generator satisfies it
cheapest by committing the SAME few cells for every z — placement
collapses even though per-level commitment is exactly what we asked
for.  The spread term penalizes that batch-level collapse directly and
nothing else: per structural tile, take each level's *normalized*
placement distribution over cells, average it over the batch, and
require the effective fraction of cells used (inverse Simpson index,
normalized by the most a batch of B one-hot placements could use:
min(B, HW)) to stay above ``min_eff``.  Corpus-shaped placement (an
approximately uniform-random cell per level) is far above the floor, so
the term vanishes at the corpus optimum like the other two hinges; a
generator funneling all levels onto a few favored cells sits below it
and gets pushed to diversify ACROSS z, not within a level (each level
still commits one cell).  Under data-parallel sharding the batch
marginal is the per-device one — a statistical regularizer, not a
collective (documented; the DP bit-match guarantee covers the default
``w_presence=0`` path).

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
                     target: float = 1.0, w_spread: float = 1.0,
                     min_eff: float = 0.25, w_excess: float = 0.0,
                     excess_band: float = 0.0) -> jax.Array:
    """Mean hinge penalty on structural-tile presence:
    count + concentration + placement spread (+ optional excess band).

    fake: [B, H, W, n_tiles] relaxed or straight-through one-hot sample
    (channel last = tile probability/indicator).  Returns a scalar:
    ``mean_b,t [relu(target - sum_hw fake[b,..,t])^2
                + relu(1 - max_hw fake[b,..,t])^2
                + w_excess * relu(sum_hw - max_hw - excess_band)^2]
      + w_spread * mean_t relu(min_eff - eff_t)^2`` where ``eff_t`` is
    the effective fraction of achievable cells the batch's committed
    tile-t placements cover (inverse Simpson index of the batch-mean
    placement distribution, / min(B, HW)).  Zero exactly when every
    level carries >=
    ``target`` expected tiles of every kind in ``tiles``, commits at
    least one cell to each with probability ~1 (so the argmax decode
    actually emits it), AND the batch spreads those commitments over >=
    ``min_eff`` of the achievable min(B, HW) distinct cells (see module docstring for the measured
    motivation of each term).  ``w_spread=0`` recovers the round-2
    count+concentration prior.

    ``w_excess`` (round-4, ``train.presence_excess``): the corpus invariant
    is EXACTLY one START/GOAL (data/dataset.py), but the three hinges above
    are one-sided — absence is penalized, excess is free, and the measured
    result is ~1.7 STARTs/level in training (one_start_frac 0.017-0.073 vs
    corpus 1.0; BASELINE.md round 3 — the attributed driver of the residual
    in-training structural chi2).  The excess term is STRAIGHT-THROUGH like
    the spread term, and for the same measured reason in the opposite
    direction: a first cut penalizing the SOFT non-winner mass
    ``relu(sum_hw - max_hw)`` fired on every level from step 0 with the
    relaxed softmax head (diffuse transitional mass has sum - max ~ 1 even
    when the argmax decode emits nothing), destabilized the adversarial
    game outright, and sent the marginal KL 0.03 -> 0.18 (runs/
    wgan_presence_mbinx round-4 history); a second cut with a hard-count
    forward but the same whole-grid soft backward still diverged (wdist
    -> 3e4 over 6000 steps, generated tile entropy inflated 1.23 -> 1.62:
    pressure on every cell's structural logit leaks through the softmax
    into every other channel — runs/wgan_presence_mbinx6k).  Final form,
    surgical on both sides: FORWARD counts the cells where the tile
    actually WINS the cell argmax (what the decoder emits) and hinges on
    copies beyond ``target`` — zero until a level carries real duplicate
    tiles; BACKWARD routes ONLY through the soft mass at the duplicate
    WINNING cells (total winner mass minus the best winner's), so the
    gradient touches ~1 cell per duplicate and nothing else — the
    legitimate placement is spared and no global logit pressure exists
    for the adversarial game to amplify.  ``excess_band`` adds slack
    copies before the hinge engages.  Default 0.0 preserves the round-3
    objective exactly.
    """
    chans = fake[..., jnp.asarray(tiles)].astype(jnp.float32)  # [B,H,W,|t|]
    counts = chans.sum(axis=(1, 2))                            # [B, |t|]
    maxes = chans.max(axis=(1, 2))                             # [B, |t|]
    count_deficit = jax.nn.relu(jnp.float32(target) - counts)
    conc_deficit = jax.nn.relu(1.0 - maxes)
    per_level = jnp.square(count_deficit) + jnp.square(conc_deficit)
    # static-zero w_excess keeps the round-3 trace; a TRACED weight (the
    # round-5 ramp schedule) always includes the term, scaled in-graph
    if isinstance(w_excess, jax.Array) or w_excess:
        # hard winner count (exactly what argmax decode emits)...
        win_mask = (jnp.argmax(fake, axis=-1)[..., None]
                    == jnp.asarray(tiles))                     # [B,H,W,|t|]
        win = win_mask.sum(axis=(1, 2))                        # [B, |t|]
        extra_hard = jax.nn.relu(win.astype(jnp.float32)
                                 - jnp.float32(target))
        # ...with the soft mass at the DUPLICATE winning cells as the
        # backward surrogate (winner total minus the best winner — zero
        # gradient everywhere except the extra argmax-winning cells)
        wmass = chans * win_mask.astype(jnp.float32)
        soft_extra = wmass.sum(axis=(1, 2)) - wmass.max(axis=(1, 2))
        extra = extra_hard + soft_extra - jax.lax.stop_gradient(soft_extra)
        excess = jax.nn.relu(extra - jnp.float32(excess_band))
        per_level = per_level + w_excess * jnp.square(excess)
    pen = per_level.mean()
    if w_spread:
        b = chans.shape[0]
        hw = chans.shape[1] * chans.shape[2]
        flat = chans.reshape(b, hw, -1)                        # [B, HW, |t|]
        # STRAIGHT-THROUGH placement marginal.  The soft marginal alone is
        # decode-invisible — measured (round-3 A/B): with the relaxed
        # softmax head every level can put its argmax-WINNING (but
        # fractional) mass on the same cell while spreading the rest, the
        # soft marginal looks diverse, the hinge never engages, and the
        # decoded placements still collapse onto ~9 cells at spread
        # weights 1 and 10 alike (quality_wgan_presence_spread*
        # artifacts).  Power/temperature sharpening is no fix: the
        # renormalized sharp distribution saturates and its gradient
        # vanishes.  So: FORWARD uses the hard argmax-placement marginal
        # (exactly what the decoder emits), BACKWARD routes through the
        # soft normalized placement — the same straight-through pattern as
        # the Gumbel head.  Winners are commitment-weighted (stop-grad
        # max) so levels that don't carry the tile at all contribute
        # ~nothing instead of a spurious argmax cell.
        wt = jax.lax.stop_gradient(flat.max(axis=1))           # [B, |t|]
        win = jax.nn.one_hot(jnp.argmax(flat, axis=1), hw,
                             axis=1, dtype=jnp.float32)        # [B, HW, |t|]
        wsum = wt.sum(axis=0) + 1e-6
        m_hard = (win * wt[:, None, :]).sum(axis=0) / wsum     # [HW, |t|]
        q = flat / (flat.sum(axis=1, keepdims=True) + 1e-6)
        m_soft = (q * wt[:, None, :]).sum(axis=0) / wsum
        marginal = m_hard + m_soft - jax.lax.stop_gradient(m_soft)
        simpson = jnp.square(marginal).sum(axis=0)             # [|t|]
        # inverse Simpson = effective number of cells used; a batch of B
        # one-hot placements can use at most min(B, HW) distinct cells,
        # so normalize by that: uniform-random placement -> eff ~ 1
        # (collision-depressed by ~(1 + B/HW)), total collapse -> 1/B
        eff = 1.0 / (min(b, hw) * simpson + 1e-9)
        spread_deficit = jax.nn.relu(jnp.float32(min_eff) - eff)
        pen = pen + w_spread * jnp.square(spread_deficit).mean()
    return pen


def excess_weight_schedule(t, step):
    """Effective excess-hinge weight at ``step`` (round-5 fine-tune ramp).

    Static 0.0 / static float when no start/ramp is configured (so the
    default path traces the exact round-4 program); otherwise a traced
    scalar: 0 before ``presence_excess_start``, then a linear rise to
    ``presence_excess`` over ``presence_excess_ramp`` steps.  The round-4
    step-function fine-tune dropped the full weight onto a converged
    mbstd pair and its endpoints landed mid-re-convergence (BASELINE.md
    round-4 presence conclusion); the ramp rides that transient out.
    """
    w = t.presence_excess
    if not w or not (t.presence_excess_start or t.presence_excess_ramp):
        return w
    since = (jnp.asarray(step, jnp.float32)
             - jnp.float32(t.presence_excess_start))
    frac = jnp.clip(since / jnp.float32(max(t.presence_excess_ramp, 1)),
                    0.0, 1.0)
    return jnp.float32(w) * frac


def mbstd_scale_schedule(t, step):
    """Critic mbstd-channel multiplier at ``step`` (round-5 anneal).

    None when off (the critic traces its unscaled round-4 program);
    otherwise a traced scalar fading linearly 1 -> mbstd_anneal_floor
    over [mbstd_anneal_start, mbstd_anneal_start + mbstd_anneal_steps)
    and holding the floor thereafter.
    """
    if not t.mbstd_anneal_steps:
        return None
    since = (jnp.asarray(step, jnp.float32)
             - jnp.float32(t.mbstd_anneal_start))
    frac = jnp.clip(since / jnp.float32(t.mbstd_anneal_steps), 0.0, 1.0)
    return 1.0 - (1.0 - jnp.float32(t.mbstd_anneal_floor)) * frac
