"""Track-family sample quality: drivability + geometry well-formedness.

The tile family's quality story is the flood-fill solver (env/solver.py);
the track family's is DYNAMIC by nature — a track is good if a competent
driver can lap it.  This module provides the deterministic evaluator: a
scripted proportional controller (curvature feed-forward + PD on lateral
offset and heading error, speed scheduled against upcoming curvature)
rolled out through the exact race dynamics (track/race.py), so the metric
needs no trained agent and is reproducible bit-for-bit.

Geometry metrics complement it: heading-closure error (a closed circuit
turns by exactly +-2*pi — the corpus invariant, track/data.py), curvature
bound violations, and width-range violations.

All rollout compute is one jit program (lax.scan over time, whole track
batch at once); only scalar fractions cross to host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from levelgan.track.data import KAPPA_MAX, WIDTH_MAX, WIDTH_MIN
from levelgan.track.race import (CarState, RaceParams, _seg_lookup,
                                 init_cars, race_step)


def scripted_action(tracks: jax.Array, car: CarState,
                    p: RaceParams) -> jax.Array:
    """Deterministic driver: discrete action [B] for the current state.

    Steering: curvature feed-forward (the steer that holds psi constant on
    the local arc) plus PD pull-back on normalized lateral offset and
    heading error, quantized to {-1, 0, 1} with a dead zone.  Throttle:
    bang-bang toward a target speed scheduled inversely with the largest
    upcoming |curvature| (brake into hairpins, full speed on straights).
    """
    kappa, width = tracks[..., 0], tracks[..., 1]
    t = kappa.shape[-1]
    k_here = _seg_lookup(kappa, car.s)
    w_half = 0.5 * _seg_lookup(width, car.s) + 1e-6

    # gains from a measured sweep on corpus tracks (this file's history):
    # dead zone 0.2 / d-gain 1.0 / psi-gain 2.0 / speed factor 4.0 laps
    # 100% of the corpus with the fewest crash-recoveries (2.5 per 160
    # steps vs 8.4 for the tightest gains)
    ff = k_here * car.v * jnp.cos(car.psi) / p.steer_rate
    ctrl = ff - 1.0 * (car.d / w_half) - 2.0 * jnp.sin(car.psi)
    steer = jnp.sign(ctrl) * (jnp.abs(ctrl) > 0.2)

    # preview: max |kappa| over the next 4 segments (dense window lookup,
    # same rationale as race.observe)
    idx0 = jnp.floor(car.s).astype(jnp.int32)
    idx = (idx0[:, None] + jnp.arange(4)[None, :]) % t
    mask = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, t), 2)
            == idx[:, :, None])
    k_pre = jnp.max(jnp.sum(jnp.where(mask, jnp.abs(kappa)[:, None, :], 0.0),
                            axis=-1), axis=-1)
    v_tgt = p.v_max / (1.0 + 4.0 * k_pre)
    thr = jnp.sign(v_tgt - car.v)

    return ((thr + 1.0) * 3.0 + (steer + 1.0)).astype(jnp.int32)


def scripted_rollout(tracks: jax.Array, p: RaceParams):
    """Roll the scripted driver for p.rollout_steps; returns per-track
    (progress [B] in segments incl. laps, laps [B], crashes [B])."""
    car0 = init_cars(tracks.shape[0])

    def step(car, _):
        action = scripted_action(tracks, car, p)
        new_car, _, crashed = race_step(tracks, car, action, p)
        return new_car, crashed.astype(jnp.float32)

    with jax.named_scope("scripted_rollout"):
        car_f, crash_t = jax.lax.scan(step, car0, None,
                                      length=p.rollout_steps)
    progress = car_f.laps * tracks.shape[1] + car_f.s
    return progress, car_f.laps, crash_t.sum(axis=0)


def track_quality_report(tracks: np.ndarray, *,
                         rollout_steps: int | None = None) -> dict[str, float]:
    """All track quality metrics for a float32 [B, T, 2] batch."""
    t = tracks.shape[1]
    # horizon: 3x the steps a full-speed car needs per lap, so one bad
    # hairpin does not mask an otherwise drivable track
    p = RaceParams(rollout_steps=rollout_steps or
                   int(3 * t / (RaceParams().v_max * RaceParams().dt)))

    @jax.jit
    def measure(tk):
        progress, laps, crashes = scripted_rollout(tk, p)
        kappa, width = tk[..., 0], tk[..., 1]
        closure = jnp.abs(jnp.abs(kappa.sum(-1)) - 2.0 * jnp.pi)
        return {
            "lap_frac": jnp.mean((laps >= 1.0).astype(jnp.float32)),
            "mean_progress_segments": jnp.mean(progress),
            "mean_crashes": jnp.mean(crashes),
            "closure_error_rad_mean": jnp.mean(closure),
            "closure_ok_frac": jnp.mean((closure < 0.5).astype(jnp.float32)),
            "kappa_violation_frac": jnp.mean(
                (jnp.abs(kappa) > KAPPA_MAX + 1e-4).astype(jnp.float32)),
            "width_violation_frac": jnp.mean(
                ((width < WIDTH_MIN - 1e-4) |
                 (width > WIDTH_MAX + 1e-4)).astype(jnp.float32)),
        }

    out = {k: float(v) for k, v in
           jax.device_get(measure(jnp.asarray(tracks))).items()}
    out["n_tracks"] = int(len(tracks))
    out["rollout_steps"] = int(p.rollout_steps)
    # diversity: mean pairwise L1 curvature distance over a subsample
    k = min(128, len(tracks))
    kap = tracks[:k, :, 0]
    diff = np.abs(kap[:, None, :] - kap[None, :, :]).mean(-1)
    out["mean_pairwise_kappa_l1"] = float(
        (diff.sum() - np.trace(diff)) / max(k * (k - 1), 1))
    return out
