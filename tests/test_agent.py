import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from levelgan.config import EMPTY, GOAL, START, CurriculumConfig
from levelgan.data.codec import encode
from levelgan.env.agent import (AgentPolicy, a2c_loss, agent_update,
                                init_agent, policy_apply)
from levelgan.env.sim import EnvParams, rollout


def test_policy_shapes():
    from levelgan.config import ModelConfig
    params = init_agent(jax.random.key(0), ModelConfig(level_size=16))
    obs = jnp.zeros((5, 16, 16, 9))
    logits, value = policy_apply(params, obs)
    assert logits.shape == (5, 4) and value.shape == (5,)


def test_a2c_update_is_finite_and_moves_params():
    from levelgan.config import ModelConfig
    m = ModelConfig(level_size=16)
    params = init_agent(jax.random.key(0), m)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 8, size=(4, 16, 16)).astype(np.uint8))
    onehot = encode(ids, 8)
    traj = rollout(policy_apply, params, ids, onehot, jax.random.key(1),
                   EnvParams(rollout_steps=6))
    cur = CurriculumConfig()
    tx = optax.adam(1e-3)
    new_params, _, loss, aux = agent_update(
        params, tx.init(params), tx, onehot, traj, cur)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(aux["entropy"]))
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), params, new_params)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


@pytest.mark.slow
def test_agent_learns_corridor():
    """Statistical: on a fixed corridor level (goal to the right), A2C should
    raise playability far above the random policy baseline."""
    lv = np.full((8, 8), EMPTY, np.uint8)
    lv[4, 1] = START
    lv[4, 6] = GOAL
    ids = jnp.asarray(np.tile(lv, (16, 1, 1)))
    onehot = encode(ids, 8)

    from levelgan.config import ModelConfig
    params = init_agent(jax.random.key(0), ModelConfig(level_size=8))
    cur = CurriculumConfig(entropy_coef=0.01, gamma=0.95)
    tx = optax.adam(3e-3)
    opt = tx.init(params)
    ep = EnvParams(rollout_steps=10, gamma=0.95)

    @jax.jit
    def train_iter(params, opt, key):
        traj = rollout(policy_apply, params, ids, onehot, key, ep)
        params, opt, loss, _ = agent_update(params, opt, tx, onehot, traj, cur)
        return params, opt, traj.reached.astype(jnp.float32).mean()

    play = []
    for i in range(150):
        params, opt, p = train_iter(params, opt, jax.random.key(i))
        play.append(float(p))
    assert np.mean(play[-10:]) > max(0.5, 2 * np.mean(play[:10]) )
