"""Policy-gradient agent: small conv actor-critic over level observations.

Reference equivalent: the REINFORCE/A2C-family agents that learn to play
levels (SURVEY.md R8 [TK-M]).  A2C-lite: advantage = discounted return - V,
entropy bonus, value head; the update replays the trajectory's stored states
in one batched forward pass (grads never flow through the env scan).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from levelgan.config import CurriculumConfig, ModelConfig
from levelgan.env.sim import Trajectory, make_obs

N_ACTIONS = 4


class AgentPolicy(nn.Module):
    """obs [B,H,W,C] -> (action logits [B,4], value [B])."""
    hidden: int = 64

    @nn.compact
    def __call__(self, obs):
        x = obs
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME")(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding="SAME")(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.hidden)(x))
        logits = nn.Dense(N_ACTIONS,
                          kernel_init=nn.initializers.normal(0.01))(x)
        value = nn.Dense(1, kernel_init=nn.initializers.normal(0.01))(x)
        return logits, value.squeeze(-1)


def init_agent(key: jax.Array, m: ModelConfig) -> dict:
    obs = jnp.zeros((1, m.level_size, m.level_size, m.n_tiles + 1))
    return AgentPolicy().init(key, obs)["params"]


def policy_apply(params, obs):
    return AgentPolicy().apply({"params": params}, obs)


def _a2c_terms(logits, value, actions, returns, active):
    """Per-timestep A2C terms from policy outputs (shared by both losses)."""
    logp_all = jax.nn.log_softmax(logits, axis=-1)
    logp = jnp.take_along_axis(
        logp_all, actions[:, None], axis=-1).squeeze(-1)
    adv = returns - value
    pg = -(logp * jax.lax.stop_gradient(adv)) * active
    vl = jnp.square(adv) * active
    ent = -(jnp.exp(logp_all) * logp_all).sum(-1) * active
    return pg, vl, ent


def _a2c_reduce(pg, vl, ent, active, cur: CurriculumConfig):
    denom = jnp.maximum(active.sum(), 1.0)
    pg_loss = pg.sum() / denom
    v_loss = vl.sum() / denom
    ent_mean = ent.sum() / denom
    loss = pg_loss + cur.value_coef * v_loss - cur.entropy_coef * ent_mean
    return loss, {"pg_loss": pg_loss, "v_loss": v_loss, "entropy": ent_mean}


def a2c_loss(params, onehot: jax.Array, traj: Trajectory,
             cur: CurriculumConfig) -> tuple[jax.Array, dict]:
    """Replay stored states, compute actor-critic loss over [T, B].

    Observations are recomputed per timestep from (onehot, pos, coins)
    rather than stored — [T,B,H,W,C] obs tensors would dominate memory.
    """
    def per_t(pos, coins, actions, returns, active):
        obs = make_obs(onehot, pos, coins)
        logits, value = policy_apply(params, obs)
        return _a2c_terms(logits, value, actions, returns, active)

    pg, vl, ent = jax.vmap(per_t)(
        traj.pos, traj.coins, traj.actions, traj.returns, traj.active)
    return _a2c_reduce(pg, vl, ent, traj.active, cur)


def a2c_loss_from_obs(params, policy_apply_fn, obs, actions, returns,
                      active, cur: CurriculumConfig):
    """Generic A2C loss over stored observations [T, B, ...] — used by env
    families whose observations are plain vectors (e.g. the race sim)."""
    def per_t(o, a, r, act):
        logits, value = policy_apply_fn(params, o)
        return _a2c_terms(logits, value, a, r, act)

    pg, vl, ent = jax.vmap(per_t)(obs, actions, returns, active)
    return _a2c_reduce(pg, vl, ent, active, cur)


def agent_update(params, opt_state, tx: optax.GradientTransformation,
                 onehot, traj, cur: CurriculumConfig):
    (loss, aux), grads = jax.value_and_grad(a2c_loss, has_aux=True)(
        params, onehot, traj, cur)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss, aux
