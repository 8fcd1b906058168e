"""On-device level solvability: batched flood-fill reachability in XLA.

Reference equivalent: the reference's premise is that generated levels are
scored by PLAYING them with RL agents (SURVEY.md R7-R9) — that dynamic path
exists here as ``env.rollout``/``env.agent``.  This module is the
deterministic complement: a topological solver answering "does a path of
passable tiles connect START to GOAL" for a whole batch of levels in one
jit program, so generated-sample quality can be scored without a trained
agent (``tools/eval_quality``).

TPU-first design: the flood fill is wavefront dilation — each iteration ORs
the 4-neighborhood shift of the reached mask and ANDs passability — run to
fixpoint under ``lax.while_loop``.  Shifts are concat-of-slices (no
wraparound), pure elementwise VPU work over the full [B, H, W] batch at
once; the loop exits early at the batch-wide fixpoint and is bounded by the
carved-region diameter, not H*W.

Semantics: WALL blocks; every other tile (EMPTY/START/GOAL/HAZARD/COIN/
SAND/ICE) is passable, matching ``env.sim``'s movement rule (only walls
stop you; hazards/terrain only cost reward).  This is topological
reachability: it ignores the ice-slide kinematics of ``env.sim.transition``
(a sliding agent can overshoot a cell), so it is the graph-connectivity
upper bound on dynamic agent playability; ``env.rollout`` with a trained
agent remains the exact evaluator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from levelgan.config import GOAL, START, WALL
from levelgan.env.sim import _pos_mask, start_positions


def _neighbors(m: jax.Array) -> jax.Array:
    """[..., H, W] bool -> bool mask of 4-neighbors of any True cell.

    Zero-padded shifts (concat of slices) rather than jnp.roll: roll wraps
    around the grid edge, which would let the wavefront tunnel from one
    border to the opposite one.
    """
    zr = jnp.zeros_like(m[..., :1, :])
    zc = jnp.zeros_like(m[..., :, :1])
    down = jnp.concatenate([zr, m[..., :-1, :]], axis=-2)
    up = jnp.concatenate([m[..., 1:, :], zr], axis=-2)
    right = jnp.concatenate([zc, m[..., :, :-1]], axis=-1)
    left = jnp.concatenate([m[..., :, 1:], zc], axis=-1)
    return down | up | right | left


def reachable(ids: jax.Array) -> jax.Array:
    """[B, H, W] uint8 tile ids -> [B, H, W] bool: cells reachable from the
    start position (first START tile, else grid center — same rule as
    ``env.sim.start_positions``) through non-WALL tiles."""
    h, w = ids.shape[-2], ids.shape[-1]
    passable = ids != WALL
    seed = _pos_mask(h, w, start_positions(ids)) & passable

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        reach, _ = state
        new = (reach | _neighbors(reach)) & passable
        return new, jnp.any(new != reach)

    reach, _ = jax.lax.while_loop(cond, body, (seed, jnp.any(seed)))
    return reach


def solvable(ids: jax.Array) -> jax.Array:
    """[B, H, W] uint8 -> [B] bool: a GOAL tile is reachable from start."""
    return (reachable(ids) & (ids == GOAL)).any(axis=(-2, -1))


def well_formed(ids: jax.Array) -> dict[str, jax.Array]:
    """Structural sanity of a level batch: per-level bool arrays.

    ``one_start``/``one_goal``: exactly one of the tile (the synthetic
    corpus invariant, dataset.py); ``has_goal`` is the weaker check the
    solver needs.
    """
    n_start = (ids == START).sum(axis=(-2, -1))
    n_goal = (ids == GOAL).sum(axis=(-2, -1))
    return {
        "has_start": n_start > 0,
        "has_goal": n_goal > 0,
        "one_start": n_start == 1,
        "one_goal": n_goal == 1,
    }
