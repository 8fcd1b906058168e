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

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def measure_step_time(steps_per_dispatch: int | None = None,
                      trials: int = 7) -> float:
    """Headline = the per-preset sweep's harness on the toy preset.

    ONE benchmark code path: tools/bench_all.bench_preset (warmup dispatch,
    serialized trials, then the pipelined back-to-back block with a single
    hard host sync — exactly api.train's cadence).  bench.py only picks the
    preset and formats the one-line JSON."""
    import jax

    from levelgan.config import preset
    from tools.bench_all import bench_preset

    cfg = preset("toy_dcgan_16")
    if steps_per_dispatch is None:
        steps_per_dispatch = max(1, cfg.train.steps_per_dispatch)
    log(f"backend={jax.default_backend()} devices={jax.devices()} "
        f"K={steps_per_dispatch} feed={cfg.data.feed}")
    row = bench_preset("toy_dcgan_16", steps_per_dispatch, trials)
    log(f"serialized worst case: {row['step_ms_serialized']:.3f} ms")
    return float(row["step_ms"])


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
