"""Batched playability environment: agents play tile levels, fully in XLA.

Reference equivalent: the torch game simulation used to score generated
levels (SURVEY.md R7 — a racing game there; here, matched to the tile-grid
domain of the [NS] configs: grid navigation with walls/hazards/coins/terrain).

TPU-first (SURVEY.md §3.4): the episode time loop is ``lax.scan`` INSIDE the
jit program, ``vmap``-batched over levels — one XLA program per rollout, no
host stepping.  Everything is static-shape; "done" episodes keep stepping but
rewards/transitions are masked.

Game rules (per step):
  actions 0..3 = up/down/left/right
  - moving into a WALL or off-grid: stay in place
  - ICE: slide one extra cell in the move direction (if not blocked)
  - SAND: extra movement penalty
  - HAZARD: penalty (episode continues)
  - COIN: +0.2 once per coin (collected mask)
  - GOAL: +1.0, episode done
  - every step: -0.01 time penalty
Start: first START tile if present, else grid center.
Playability of a level = did the agent reach the goal within T steps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from levelgan.config import COIN, GOAL, HAZARD, START, WALL
from levelgan.data.dataset import ICE, SAND


class EnvParams(NamedTuple):
    rollout_steps: int = 48
    gamma: float = 0.97
    step_penalty: float = 0.01
    hazard_penalty: float = 0.5
    sand_penalty: float = 0.02
    coin_reward: float = 0.2
    goal_reward: float = 1.0


# numpy, NOT jnp: a module-level jnp constant materializes on first import,
# and this module is imported LAZILY from inside traced functions (e.g.
# ops/repair.py's target_dist branch) — under an active jit trace the
# device array is created as a tracer, leaks into this global, and every
# later user in the process dies with UnexpectedTracerError (measured:
# the first combined gate_all run, round 4).  jnp consumers treat the np
# array as a constant and XLA folds it.
_DELTAS = np.asarray([[-1, 0], [1, 0], [0, -1], [0, 1]], np.int32)


def start_positions(ids: jax.Array) -> jax.Array:
    """[B,H,W] ids -> [B,2] start coords (first START, else center)."""
    b, h, w = ids.shape
    flat = (ids == START).reshape(b, -1)
    has_start = flat.any(axis=-1)
    idx = jnp.argmax(flat, axis=-1)
    pos = jnp.stack([idx // w, idx % w], axis=-1).astype(jnp.int32)
    center = jnp.asarray([h // 2, w // 2], jnp.int32)
    return jnp.where(has_start[:, None], pos, center)


def _pos_mask(h: int, w: int, pos: jax.Array) -> jax.Array:
    """[..., 2] int coords -> [..., H, W] bool one-hot position mask.

    Dense iota-compare instead of scatter: TPU scatters serialize (the
    curriculum_16 trace showed 4 scatter ops costing ~0.96 ms/step, 26% of
    the whole step — artifacts/profile_curriculum_16.md); a [H, W] compare
    is 256 fused VPU lanes at 16x16."""
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return (iy == pos[..., 0, None, None]) & (ix == pos[..., 1, None, None])


def transition(ids: jax.Array, pos: jax.Array, action: jax.Array,
               coins_taken: jax.Array, done: jax.Array, p: EnvParams):
    """One env step for a batch. ids [B,H,W], pos [B,2], action [B],
    coins_taken [B,H,W] bool, done [B] bool.
    Returns (new_pos, reward, new_done, new_coins_taken)."""
    h, w = ids.shape[1], ids.shape[2]
    hi = jnp.asarray([h - 1, w - 1], jnp.int32)
    delta = jnp.asarray(_DELTAS)[action]

    def step_one(ids1, pos1, delta1, coins1, done1):
        def tile_at(pos):
            # dense masked-sum lookup (same rationale as _pos_mask: TPU
            # gathers serialize inside the scan; 256 fused lanes don't)
            return jnp.sum(jnp.where(_pos_mask(h, w, pos),
                                     ids1.astype(jnp.int32), 0))

        prop = jnp.clip(pos1 + delta1, 0, hi)
        blocked = tile_at(prop) == WALL
        new_pos = jnp.where(blocked, pos1, prop)
        # ice slide: one extra cell if standing on ICE and not blocked
        on_ice = tile_at(new_pos) == ICE
        prop2 = jnp.clip(new_pos + delta1, 0, hi)
        slide = on_ice & (tile_at(prop2) != WALL)
        new_pos = jnp.where(slide, prop2, new_pos)
        # frozen if already done
        new_pos = jnp.where(done1, pos1, new_pos)

        at_new = _pos_mask(h, w, new_pos)
        tile = tile_at(new_pos)
        fresh_coin = (tile == COIN) & ~jnp.any(at_new & coins1)
        reward = (-p.step_penalty
                  + p.goal_reward * (tile == GOAL)
                  - p.hazard_penalty * (tile == HAZARD)
                  - p.sand_penalty * (tile == SAND)
                  + p.coin_reward * fresh_coin)
        reward = jnp.where(done1, 0.0, reward)
        new_done = done1 | (tile == GOAL)
        new_coins = coins1 | (at_new & (fresh_coin & ~done1))
        return new_pos, reward, new_done, new_coins

    return jax.vmap(step_one)(ids, pos, delta, coins_taken, done)


def make_obs(onehot: jax.Array, pos: jax.Array,
             coins_taken: jax.Array) -> jax.Array:
    """Policy observation [B,H,W,C+1]: level one-hot with collected coins
    zeroed from the COIN channel, plus an agent-position plane."""
    h, w = onehot.shape[1], onehot.shape[2]
    coin_mask = 1.0 - coins_taken.astype(onehot.dtype)
    level = onehot.at[..., COIN].set(onehot[..., COIN] * coin_mask)
    plane = _pos_mask(h, w, pos).astype(onehot.dtype)
    return jnp.concatenate([level, plane[..., None]], axis=-1)


class Trajectory(NamedTuple):
    pos: jax.Array          # [T, B, 2] position BEFORE each action
    coins: jax.Array        # [T, B, H, W] collected mask BEFORE each action
    actions: jax.Array      # [T, B]
    rewards: jax.Array      # [T, B]
    active: jax.Array       # [T, B] 1.0 while episode not done at action time
    returns: jax.Array      # [T, B] discounted reward-to-go
    total_return: jax.Array  # [B]
    reached: jax.Array      # [B] bool: goal reached within T


def rollout(policy_apply, agent_params, ids: jax.Array, onehot: jax.Array,
            key: jax.Array, p: EnvParams) -> Trajectory:
    """Play a batch of levels for T steps with a stochastic policy.

    ``policy_apply(params, obs) -> (action_logits [B,4], value [B])``.
    Gradients are NOT taken through here — the A2C loss replays the stored
    states (SURVEY.md §3.4; keeps the scan carry light).
    """
    b = ids.shape[0]
    pos0 = start_positions(ids)
    coins0 = jnp.zeros(ids.shape, bool)
    done0 = jnp.zeros((b,), bool)

    def env_step(carry, key_t):
        pos, coins, done = carry
        obs = make_obs(onehot, pos, coins)
        logits, _ = policy_apply(agent_params, obs)
        action = jax.random.categorical(key_t, logits, axis=-1)
        new_pos, reward, new_done, new_coins = transition(
            ids, pos, action, coins, done, p)
        out = (pos, coins, action, reward, 1.0 - done.astype(jnp.float32))
        return (new_pos, new_coins, new_done), out

    keys = jax.random.split(key, p.rollout_steps)
    with jax.named_scope("rollout_scan"):      # profiler range (SURVEY §5.1)
        (pos_f, coins_f, done_f), (pos_t, coins_t, act_t, rew_t, active_t) = \
            jax.lax.scan(env_step, (pos0, coins0, done0), keys)

    def disc(carry, r):
        g = r + p.gamma * carry
        return g, g

    _, returns = jax.lax.scan(disc, jnp.zeros((b,)), rew_t, reverse=True)
    return Trajectory(pos=pos_t, coins=coins_t, actions=act_t, rewards=rew_t,
                      active=active_t, returns=returns,
                      total_return=rew_t.sum(axis=0), reached=done_f)
