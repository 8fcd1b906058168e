"""Batched race simulation: cars drive generated tracks, fully in XLA.

Reference equivalent: the torch racing game — segment tracks, car
kinematics, collision, per-step reward (SURVEY.md R7 [TK-M]).

TPU-native: Frenet-frame (track-relative) car dynamics — state per car is
(s: arc progress, d: lateral offset, psi: heading error, v: speed) — so
"collision" is just |d| exceeding the local half-width, and track geometry
enters only through per-segment curvature/width lookups (dynamic gathers).
The episode loop is ``lax.scan`` inside jit, vmapped over (tracks x cars).

Actions (9 discrete): steer {-1,0,1} x throttle {-1,0,1}.
Reward: arc progress per step, lap bonus, off-track crash penalty (crash
clamps the car back on-track and kills speed).  Drivability of a track =
mean progress / laps of the agent within the horizon.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class RaceParams(NamedTuple):
    rollout_steps: int = 64
    dt: float = 0.5
    v_max: float = 1.2
    accel: float = 0.2
    steer_rate: float = 0.5
    drag: float = 0.05
    crash_penalty: float = 1.0
    lap_bonus: float = 5.0
    step_penalty: float = 0.005
    preview: int = 6          # upcoming curvature samples in the observation
    gamma: float = 0.99


class CarState(NamedTuple):
    s: jax.Array      # [B] arc position (units of segments)
    d: jax.Array      # [B] lateral offset
    psi: jax.Array    # [B] heading error
    v: jax.Array      # [B] speed
    laps: jax.Array   # [B] completed laps (float)


def init_cars(batch: int) -> CarState:
    z = jnp.zeros((batch,))
    return CarState(s=z, d=z, psi=z, v=z, laps=z)


def _seg_lookup(per_seg: jax.Array, s: jax.Array) -> jax.Array:
    """per_seg [B, T], s [B] -> value of the segment containing s.

    Dense one-hot contraction instead of take_along_axis: TPU gathers
    serialize — the race_curriculum_32 trace showed the two in-scan
    lookups costing 0.43 ms/step, 24% of the whole step
    (artifacts/profile_race_curriculum_32.md) — while a [B, T] compare +
    masked sum at T=32 fuses into the surrounding elementwise work."""
    t = per_seg.shape[-1]
    idx = jnp.clip(jnp.floor(s).astype(jnp.int32) % t, 0, t - 1)
    mask = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1) == idx[:, None]
    return jnp.sum(jnp.where(mask, per_seg, 0.0), axis=1)


def observe(tracks: jax.Array, car: CarState, p: RaceParams) -> jax.Array:
    """[B, obs_dim] policy observation: car state + local width + preview
    of the next ``p.preview`` curvatures."""
    kappa, width = tracks[..., 0], tracks[..., 1]
    t = kappa.shape[-1]
    idx0 = jnp.floor(car.s).astype(jnp.int32)
    offs = jnp.arange(p.preview)
    idx = (idx0[:, None] + offs[None, :]) % t
    # dense window lookup (see _seg_lookup rationale): [B, P, T] one-hot
    # mask contracted against kappa — 64x8x32 fused MACs vs a serialized
    # gather per (car, preview) pair
    mask = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, t), 2)
            == idx[:, :, None])
    preview = jnp.sum(jnp.where(mask, kappa[:, None, :], 0.0), axis=-1)
    w_here = _seg_lookup(width, car.s)
    return jnp.concatenate([
        jnp.stack([car.v, car.d / (w_here * 0.5 + 1e-6),
                   jnp.sin(car.psi), jnp.cos(car.psi)], axis=-1),
        preview,
    ], axis=-1)


OBS_DIM_BASE = 4
N_ACTIONS = 9


def race_step(tracks: jax.Array, car: CarState, action: jax.Array,
              p: RaceParams):
    """One dynamics step for a batch of cars. action [B] in [0, 9)."""
    kappa, width = tracks[..., 0], tracks[..., 1]
    t = kappa.shape[-1]
    steer = (action % 3).astype(jnp.float32) - 1.0
    accel = (action // 3).astype(jnp.float32) - 1.0

    k_here = _seg_lookup(kappa, car.s)
    v = jnp.clip(car.v + (p.accel * accel - p.drag * car.v) * p.dt,
                 0.0, p.v_max)
    psi = car.psi + (p.steer_rate * steer - k_here * v * jnp.cos(car.psi)) * p.dt
    ds = v * jnp.cos(psi) * p.dt
    s_new = car.s + ds
    d = car.d + v * jnp.sin(psi) * p.dt

    # collision: outside the local half-width
    w_half = 0.5 * _seg_lookup(width, s_new)
    crashed = jnp.abs(d) > w_half
    d = jnp.where(crashed, jnp.sign(d) * w_half * 0.5, d)
    v = jnp.where(crashed, 0.1 * v, v)
    psi = jnp.where(crashed, 0.0, psi)

    lap = (s_new >= t).astype(jnp.float32)
    s_new = jnp.where(s_new >= t, s_new - t, s_new)

    reward = (ds - p.step_penalty
              - p.crash_penalty * crashed.astype(jnp.float32)
              + p.lap_bonus * lap)
    new_car = CarState(s=s_new, d=d, psi=psi, v=v, laps=car.laps + lap)
    return new_car, reward, crashed


class RaceTrajectory(NamedTuple):
    obs: jax.Array          # [T, B, obs_dim]
    actions: jax.Array      # [T, B]
    rewards: jax.Array      # [T, B]
    returns: jax.Array      # [T, B]
    active: jax.Array       # [T, B] (always 1 — races run the full horizon)
    total_return: jax.Array  # [B]
    progress: jax.Array     # [B] total arc progress incl. laps
    crashes: jax.Array      # [B] crash count


def race_rollout(policy_apply, agent_params, tracks: jax.Array,
                 key: jax.Array, p: RaceParams) -> RaceTrajectory:
    b = tracks.shape[0]
    car0 = init_cars(b)

    def env_step(carry, key_t):
        car = carry
        obs = observe(tracks, car, p)
        logits, _ = policy_apply(agent_params, obs)
        action = jax.random.categorical(key_t, logits, axis=-1)
        new_car, reward, crashed = race_step(tracks, car, action, p)
        return new_car, (obs, action, reward, crashed.astype(jnp.float32))

    keys = jax.random.split(key, p.rollout_steps)
    with jax.named_scope("rollout_scan"):      # profiler range (SURVEY §5.1)
        car_f, (obs_t, act_t, rew_t, crash_t) = jax.lax.scan(
            env_step, car0, keys)

    def disc(carry, r):
        g = r + p.gamma * carry
        return g, g

    _, returns = jax.lax.scan(disc, jnp.zeros((b,)), rew_t, reverse=True)
    progress = car_f.laps * tracks.shape[1] + car_f.s
    return RaceTrajectory(
        obs=obs_t, actions=act_t, rewards=rew_t, returns=returns,
        active=jnp.ones_like(rew_t), total_return=rew_t.sum(0),
        progress=progress, crashes=crash_t.sum(0))


class DriverPolicy(nn.Module):
    """MLP actor-critic over race observations."""
    hidden: int = 64

    @nn.compact
    def __call__(self, obs):
        x = nn.relu(nn.Dense(self.hidden)(obs))
        x = nn.relu(nn.Dense(self.hidden)(x))
        logits = nn.Dense(N_ACTIONS, kernel_init=nn.initializers.normal(0.01))(x)
        value = nn.Dense(1, kernel_init=nn.initializers.normal(0.01))(x)
        return logits, value.squeeze(-1)


def init_driver(key: jax.Array, p: RaceParams) -> dict:
    obs = jnp.zeros((1, OBS_DIM_BASE + p.preview))
    return DriverPolicy().init(key, obs)["params"]


def driver_apply(params, obs):
    return DriverPolicy().apply({"params": params}, obs)
