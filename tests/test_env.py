import jax
import jax.numpy as jnp
import numpy as np

from levelgan.config import COIN, EMPTY, GOAL, HAZARD, START, WALL
from levelgan.data.codec import encode
from levelgan.data.dataset import ICE
from levelgan.env.sim import (EnvParams, make_obs, rollout, start_positions,
                              transition)

P = EnvParams(rollout_steps=8, gamma=0.9)


def _lvl(rows):
    return jnp.asarray(np.array(rows, np.uint8))[None]  # [1,H,W]


def test_start_positions():
    lv = np.full((2, 6, 6), EMPTY, np.uint8)
    lv[0, 2, 3] = START
    # lv[1] has no START -> center
    pos = np.asarray(start_positions(jnp.asarray(lv)))
    np.testing.assert_array_equal(pos[0], [2, 3])
    np.testing.assert_array_equal(pos[1], [3, 3])


def _step(ids, pos, action, coins=None, done=None):
    b = ids.shape[0]
    coins = coins if coins is not None else jnp.zeros(ids.shape, bool)
    done = done if done is not None else jnp.zeros((b,), bool)
    return transition(ids, jnp.asarray(pos, jnp.int32),
                      jnp.asarray(action), coins, done, P)


def test_wall_blocks():
    ids = _lvl([[EMPTY, WALL], [EMPTY, EMPTY]])
    new_pos, r, done, _ = _step(ids, [[0, 0]], [3])  # right into wall
    np.testing.assert_array_equal(np.asarray(new_pos)[0], [0, 0])
    np.testing.assert_allclose(np.asarray(r)[0], -P.step_penalty)


def test_border_clamps():
    ids = _lvl([[EMPTY, EMPTY], [EMPTY, EMPTY]])
    new_pos, _, _, _ = _step(ids, [[0, 0]], [0])  # up off-grid
    np.testing.assert_array_equal(np.asarray(new_pos)[0], [0, 0])


def test_goal_reward_and_done():
    ids = _lvl([[EMPTY, GOAL]])
    new_pos, r, done, _ = _step(ids, [[0, 0]], [3])
    assert bool(np.asarray(done)[0])
    np.testing.assert_allclose(np.asarray(r)[0],
                               P.goal_reward - P.step_penalty)


def test_hazard_penalty():
    ids = _lvl([[EMPTY, HAZARD]])
    _, r, done, _ = _step(ids, [[0, 0]], [3])
    assert not bool(np.asarray(done)[0])
    np.testing.assert_allclose(np.asarray(r)[0],
                               -P.hazard_penalty - P.step_penalty)


def test_coin_collected_once():
    ids = _lvl([[EMPTY, COIN]])
    pos, r1, _, coins = _step(ids, [[0, 0]], [3])
    np.testing.assert_allclose(np.asarray(r1)[0],
                               P.coin_reward - P.step_penalty)
    # step off and back on
    pos2, _, _, coins = _step(ids, np.asarray(pos), [2], coins=coins)
    pos3, r3, _, _ = _step(ids, np.asarray(pos2), [3], coins=coins)
    np.testing.assert_allclose(np.asarray(r3)[0], -P.step_penalty)


def test_ice_slides():
    ids = _lvl([[EMPTY, ICE, EMPTY, WALL]])
    new_pos, _, _, _ = _step(ids, [[0, 0]], [3])
    np.testing.assert_array_equal(np.asarray(new_pos)[0], [0, 2])  # slid over ice
    # slide blocked by wall: starting on ice cell moving right
    new_pos2, _, _, _ = _step(ids, [[0, 2]], [3])
    np.testing.assert_array_equal(np.asarray(new_pos2)[0], [0, 2])  # wall blocks


def test_done_freezes():
    ids = _lvl([[EMPTY, GOAL]])
    done = jnp.asarray([True])
    new_pos, r, _, _ = _step(ids, [[0, 0]], [3], done=done)
    np.testing.assert_array_equal(np.asarray(new_pos)[0], [0, 0])
    np.testing.assert_allclose(np.asarray(r)[0], 0.0)


def test_make_obs():
    ids = np.full((1, 4, 4), EMPTY, np.uint8)
    ids[0, 1, 2] = COIN
    onehot = encode(jnp.asarray(ids), 8)
    coins = jnp.zeros((1, 4, 4), bool).at[0, 1, 2].set(True)
    obs = np.asarray(make_obs(onehot, jnp.asarray([[0, 0]]), coins))
    assert obs.shape == (1, 4, 4, 9)
    assert obs[0, 1, 2, COIN] == 0.0      # collected coin hidden
    assert obs[0, 0, 0, 8] == 1.0          # agent plane


def test_rollout_matches_python_loop():
    """scan rollout == step-by-step python reference with the same keys
    (SURVEY.md §4.2 env tier)."""
    rng = np.random.default_rng(0)
    ids_np = rng.integers(0, 8, size=(4, 8, 8)).astype(np.uint8)
    ids = jnp.asarray(ids_np)
    onehot = encode(ids, 8)

    def policy_apply(params, obs):
        # deterministic fake policy: logits from obs sum, value 0
        s = obs.sum(axis=(1, 2, 3))
        logits = jnp.stack([s, -s, 2 * s, jnp.zeros_like(s)], -1)
        return logits, jnp.zeros_like(s)

    p = EnvParams(rollout_steps=5, gamma=0.9)
    key = jax.random.key(42)
    traj = rollout(policy_apply, None, ids, onehot, key, p)

    # python reference
    pos = start_positions(ids)
    coins = jnp.zeros(ids.shape, bool)
    done = jnp.zeros((4,), bool)
    keys = jax.random.split(key, 5)
    rewards = []
    for t in range(5):
        obs = make_obs(onehot, pos, coins)
        logits, _ = policy_apply(None, obs)
        action = jax.random.categorical(keys[t], logits, axis=-1)
        np.testing.assert_array_equal(np.asarray(traj.actions[t]),
                                      np.asarray(action))
        np.testing.assert_array_equal(np.asarray(traj.pos[t]), np.asarray(pos))
        pos, r, done, coins = transition(ids, pos, action, coins, done, p)
        rewards.append(np.asarray(r))
    np.testing.assert_allclose(np.asarray(traj.rewards), np.stack(rewards))

    # discounted returns
    ret = np.zeros(4)
    for t in reversed(range(5)):
        ret = rewards[t] + 0.9 * ret
        np.testing.assert_allclose(np.asarray(traj.returns[t]), ret, rtol=1e-6)


def test_rollout_reaches_adjacent_goal():
    ids = np.full((1, 4, 4), EMPTY, np.uint8)
    ids[0, 1, 1] = START
    ids[0, 1, 2] = GOAL
    onehot = encode(jnp.asarray(ids), 8)

    def policy_apply(params, obs):
        b = obs.shape[0]
        logits = jnp.tile(jnp.asarray([-1e9, -1e9, -1e9, 0.0]), (b, 1))
        return logits, jnp.zeros((b,))  # always move right

    traj = rollout(policy_apply, None, jnp.asarray(ids), onehot,
                   jax.random.key(0), EnvParams(rollout_steps=3))
    assert bool(np.asarray(traj.reached)[0])
    # one rewarded step (goal - step penalty), then masked after done
    np.testing.assert_allclose(float(traj.total_return[0]),
                               1.0 - 0.01, atol=1e-6)
