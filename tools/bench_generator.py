"""Full-Generator benchmark: use_pallas true/false, fwd-only and train.

The kernel-level microbench (tools/bench_kernels) shows per-stage parity
between K1-Pallas and the XLA fallback, but stage numbers hide cross-stage
fusion and the custom_vjp residual traffic.  This tool measures the unit
that actually matters — the whole Generator apply (+ sample head), forward
and trained — K iterations chained in ONE jit program per the BASELINE.md
protocol, on the real chip.

Writes artifacts/bench_generator.json; cited by BASELINE.md's K1 analysis.

Usage: python -m tools.bench_generator [--preset gumbel_64] [--k 300]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from levelgan import rng


def bench(cfg, use_pallas: bool, mode: str, k: int, trials: int) -> float:
    from levelgan.models import Generator, sample_head

    m = dataclasses.replace(cfg.model, use_pallas=use_pallas)
    gen = Generator(m)
    key = rng.key(cfg, 0)
    z = jax.random.normal(key, (cfg.train.batch_size, m.latent_dim),
                          jnp.float32)
    params = gen.init(key, z)["params"]

    if mode == "fwd":
        def body(c, k2):
            z, params = c
            logits = gen.apply({"params": params}, z)
            lv = sample_head(k2, logits, m.head, tau=1.0)
            fb = lv.astype(jnp.float32).mean()   # serialize iterations
            return (z + 1e-6 * fb, params), ()
    else:
        def body(c, k2):
            z, params = c

            def loss(p):
                logits = gen.apply({"params": p}, z)
                lv = sample_head(k2, logits, m.head, tau=1.0)
                return (lv.astype(jnp.float32) ** 2).mean()
            l, g = jax.value_and_grad(loss)(params)
            params = jax.tree.map(lambda p, d: p - 1e-6 * d, params, g)
            return (z + 1e-6 * l, params), ()

    @jax.jit
    def run(z, params):
        keys = jax.random.split(rng.key(cfg, 1), k)
        (z, params), _ = jax.lax.scan(body, (z, params), keys)
        return z.sum()

    float(np.asarray(run(z, params)))   # compile + warm
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(np.asarray(run(z, params)))
        ts.append((time.perf_counter() - t0) / k * 1e3)
    return float(np.median(ts))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="gumbel_64")
    ap.add_argument("--k", type=int, default=300)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--out", default="artifacts/bench_generator.json")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                    help="dotted config override, e.g. --set "
                         "model.level_size=128 for at-scale shape probes")
    args = ap.parse_args(argv)

    from tools.bench_all import _enable_compile_cache
    _enable_compile_cache()

    from levelgan.cli.train import parse_overrides
    from levelgan.config import preset
    overrides = parse_overrides(args.set)
    cfg = preset(args.preset)
    if overrides:
        cfg = cfg.override(**overrides)
    out = {"preset": args.preset, "batch_size": cfg.train.batch_size,
           "k": args.k, "backend": jax.default_backend()}
    if overrides:
        out["overrides"] = overrides
    for mode in ("fwd", "train"):
        for up in (False, True):
            ms = bench(cfg, up, mode, args.k, args.trials)
            tag = f"{mode}_{'pallas' if up else 'xla'}_ms"
            out[tag] = round(ms, 4)
            print(f"[bench_generator] G {mode:5s} "
                  f"use_pallas={up}: {ms:.4f} ms/iter")
    if args.out:
        import os
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"[bench_generator] wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
