"""Headline benchmark: G+D train-step time vs the measured CPU reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
  metric      — toy_dcgan16_train_step_time (BASELINE.json config 1)
  value       — median ms/step on the default backend (TPU under the driver)
  vs_baseline — speedup over the torch-CPU reference measured on this machine
                (reference_impl/baseline_measured.json; north-star target >=20x)

Protocol per BASELINE.md: median over >=50 post-warmup steps, per-step
block_until_ready fencing, host batch feed included (honest end-to-end step).
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


def measure_step_time(steps: int = 50, warmup: int = 10) -> float:
    import jax

    from levelgan.api import make_step_fn, sample_batch
    from levelgan.config import preset
    from levelgan.data.dataset import LevelDataset
    from levelgan.dist.mesh import make_mesh, replicated_sharding
    from levelgan.train.state import create_state
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = preset("toy_dcgan_16")
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    mesh = make_mesh(cfg.dist.dp)
    repl = replicated_sharding(mesh)
    b_shard = NamedSharding(mesh, P("data"))
    ds = LevelDataset.from_config(cfg.data, cfg.model, seed=cfg.train.seed)
    step_fn, kind = make_step_fn(cfg)
    state = jax.jit(lambda k: create_state(cfg, k), out_shardings=repl)(
        jax.random.key(0))
    jit_step = jax.jit(step_fn, donate_argnums=(0,),
                       in_shardings=(repl, b_shard))

    for _ in range(warmup):
        batch = jax.device_put(sample_batch(cfg, ds, kind), b_shard)
        state, metrics = jit_step(state, batch)
    jax.block_until_ready(metrics)
    log("warmup done, timing...")

    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        batch = jax.device_put(sample_batch(cfg, ds, kind), b_shard)
        state, metrics = jit_step(state, batch)
        jax.block_until_ready(metrics["d_loss"])
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1e3)


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
