"""Per-preset train-step benchmark (BASELINE.md protocol, all configs).

For each preset: jit the preset's step function in the shipped multi-step
dispatch mode (K steps via lax.scan in one program), warm up one dispatch,
then time ``trials`` dispatches with a HARD host sync each (the only sync
the dev axon relay cannot return early from — see bench.py) and report the
median per-step ms. H2D batch feed is included.

Usage: python -m tools.bench_all [--k 50] [--trials 5] [--out BENCH_ALL.json]
Prints one JSON line per preset; writes the full table to --out.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from levelgan import rng

PRESETS = ("toy_dcgan_16", "wgan_gp_32", "gumbel_64", "conditional_32",
           "curriculum_16", "curriculum_16_joint",
           "racetrack_32", "race_curriculum_32")


def _enable_compile_cache():
    """Persistent XLA compile cache (delegates to levelgan.xla_cache)."""
    from levelgan.xla_cache import enable
    enable()


def bench_preset(name: str, k: int, trials: int,
                 overrides: dict | None = None) -> dict:
    import jax
    from jax.sharding import NamedSharding

    _enable_compile_cache()

    from levelgan.api import (batch_spec, corpus_array, make_dataset,
                              make_device_feed_step, make_multi_step,
                              make_multi_step_device, make_state,
                              make_step_fn, sample_batch)
    from levelgan.config import preset
    from levelgan.dist.mesh import make_mesh, replicated_sharding

    cfg = preset(name)
    if overrides:
        cfg = cfg.override(**overrides)
    mesh = make_mesh(cfg.dist.dp)
    repl = replicated_sharding(mesh)
    ds = make_dataset(cfg)
    step_fn, kind = make_step_fn(cfg)
    b_shard = NamedSharding(mesh, batch_spec(kind, multi=True))
    state = jax.jit(lambda key: make_state(cfg, key), out_shardings=repl)(
        rng.key(cfg, 0))
    feed_device = cfg.data.feed == "device"
    if feed_device:
        # Shipped path: corpus staged in HBM once; each dispatch carries no
        # per-step data — index sampling happens inside the program.
        corpus_dev = jax.device_put(corpus_array(ds), repl)
        fed = make_device_feed_step(cfg, step_fn, kind, mesh)
        multi = jax.jit(make_multi_step_device(fed, k), donate_argnums=(0,),
                        in_shardings=(repl, repl))

        def feed(step0: int):
            return corpus_dev
    else:
        multi = jax.jit(make_multi_step(step_fn, k), donate_argnums=(0,),
                        in_shardings=(repl, b_shard))

        def feed(step0: int):
            bs = np.stack([sample_batch(cfg, ds, kind, step=step0 + j)
                           for j in range(k)])
            return jax.device_put(bs, b_shard)

    def sync(metrics) -> float:
        return float(np.asarray(metrics["d_loss"]).ravel()[-1])

    t0 = time.perf_counter()
    state, metrics = multi(state, feed(0))
    sync(metrics)
    compile_s = time.perf_counter() - t0

    # Serialized: feed -> dispatch -> hard sync per trial.  Worst case; pays
    # the host feed and the relay round trip on every dispatch block.
    per_step = []
    for t in range(trials):
        t0 = time.perf_counter()
        state, metrics = multi(state, feed((t + 1) * k))
        last = sync(metrics)
        per_step.append((time.perf_counter() - t0) / k)
    assert np.isfinite(last), f"{name}: non-finite loss {last}"

    # Pipelined: the shipped api.train cadence — async dispatch lets the
    # host stack the next feed while the device runs the current block;
    # sync only once at the end (api.train syncs only at log points).
    base = (trials + 1) * k
    t0 = time.perf_counter()
    for t in range(trials):
        state, metrics = multi(state, feed(base + t * k))
    last = sync(metrics)
    pipelined = (time.perf_counter() - t0) / (trials * k)
    assert np.isfinite(last), f"{name}: non-finite loss {last}"

    return {
        "preset": name,
        "loss": kind,
        "batch_size": cfg.train.batch_size,
        "step_ms": round(float(pipelined * 1e3), 3),
        "step_ms_serialized": round(float(np.median(per_step) * 1e3), 3),
        "feed": cfg.data.feed,
        "steps_per_dispatch": k,
        "compile_s": round(compile_s, 1),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--out", default=None)
    ap.add_argument("--presets", default=",".join(PRESETS))
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                    help="dotted config override applied to every preset, "
                         "e.g. --set model.use_pallas=true")
    ap.add_argument("--tpu-tests", action="store_true",
                    help="run the real-TPU kernel tier (tests_tpu/) first "
                         "so kernel regressions surface before benching")
    args = ap.parse_args(argv)

    if args.trials < 1 or args.k < 1:
        raise SystemExit("--trials and --k must be >= 1")

    if args.tpu_tests:
        # In-process (the chip is single-tenant: a subprocess would fight
        # this process for the backend).  -p no:cacheprovider keeps the
        # repo clean when invoked from read-only contexts.
        import pytest as _pytest
        rc = _pytest.main(["tests_tpu", "-q", "-p", "no:cacheprovider"])
        if rc != 0:
            raise SystemExit(f"tests_tpu tier failed (exit {rc})")

    from levelgan.cli.train import parse_overrides
    overrides = parse_overrides(args.set)

    import jax
    rows = []
    for name in args.presets.split(","):
        row = bench_preset(name, args.k, args.trials, overrides)
        if overrides:
            row["overrides"] = overrides
        row["backend"] = jax.default_backend()
        print(json.dumps(row), flush=True)
        rows.append(row)
        jax.clear_caches()
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
