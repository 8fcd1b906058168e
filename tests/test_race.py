import jax
import jax.numpy as jnp
import numpy as np
import pytest

from levelgan.track.race import (CarState, RaceParams, driver_apply,
                                 init_cars, init_driver, observe,
                                 race_rollout, race_step)

P = RaceParams(rollout_steps=8)


def _straight_track(b=2, t=16, width=0.3):
    tr = np.zeros((b, t, 2), np.float32)
    tr[..., 1] = width
    return jnp.asarray(tr)


def test_accelerate_moves_forward():
    tracks = _straight_track()
    car = init_cars(2)
    # action 6 = accel +1, steer -1? action = steer + 3*throttle:
    # steer = a%3-1, accel = a//3-1 -> a=7: steer 0, accel +1
    for _ in range(5):
        car, r, crashed = race_step(tracks, car, jnp.asarray([7, 7]), P)
    assert float(car.v[0]) > 0 and float(car.s[0]) > 0
    assert not bool(crashed[0])


def test_steering_off_track_crashes():
    tracks = _straight_track(width=0.1)
    car = CarState(s=jnp.zeros(2), d=jnp.zeros(2),
                   psi=jnp.full((2,), 0.8),  # pointed off-track
                   v=jnp.full((2,), 1.0), laps=jnp.zeros(2))
    car2, r, crashed = race_step(tracks, car, jnp.asarray([4, 4]), P)
    assert bool(crashed[0])
    assert float(r[0]) < 0
    # crash clamps back inside and kills speed
    w_half = 0.05
    assert abs(float(car2.d[0])) <= w_half
    assert float(car2.v[0]) < float(car.v[0])


def test_lap_detection():
    tracks = _straight_track(t=4)
    car = CarState(s=jnp.asarray([3.8, 0.0]), d=jnp.zeros(2),
                   psi=jnp.zeros(2), v=jnp.full((2,), 1.0),
                   laps=jnp.zeros(2))
    car2, r, _ = race_step(tracks, car, jnp.asarray([7, 7]), P)
    assert float(car2.laps[0]) == 1.0 and float(car2.s[0]) < 1.0
    assert float(r[0]) > P.lap_bonus * 0.5
    assert float(car2.laps[1]) == 0.0


@pytest.mark.slow
def test_observation_shape_and_rollout():
    from levelgan.track.data import synthetic_tracks

    tracks = jnp.asarray(synthetic_tracks(4, 16, seed=0))
    params = init_driver(jax.random.key(0), P)
    obs = observe(tracks, init_cars(4), P)
    assert obs.shape == (4, 4 + P.preview)
    traj = race_rollout(driver_apply, params, tracks, jax.random.key(1), P)
    assert traj.obs.shape == (P.rollout_steps, 4, 4 + P.preview)
    assert traj.rewards.shape == (P.rollout_steps, 4)
    assert np.isfinite(np.asarray(traj.total_return)).all()
    assert (np.asarray(traj.progress) >= 0).all()


def test_driver_learns_full_throttle():
    """On a wide straight track, A2C should learn to go fast: progress
    rises well above the random policy's."""
    import optax
    from levelgan.config import CurriculumConfig
    from levelgan.env.agent import a2c_loss_from_obs

    tracks = _straight_track(b=16, t=32, width=0.4)
    p = RaceParams(rollout_steps=24)
    params = init_driver(jax.random.key(0), p)
    cur = CurriculumConfig(entropy_coef=0.003, gamma=0.99)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def it(params, opt, key):
        traj = race_rollout(driver_apply, params, tracks, key, p)
        (loss, _), grads = jax.value_and_grad(
            a2c_loss_from_obs, has_aux=True)(
                params, driver_apply, traj.obs, traj.actions,
                traj.returns, traj.active, cur)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, traj.progress.mean()

    prog = []
    for i in range(120):
        params, opt, pr = it(params, opt, jax.random.key(i))
        prog.append(float(pr))
    assert np.mean(prog[-10:]) > 1.5 * np.mean(prog[:10])
