"""Export-path throughput benchmark + relay-bandwidth analysis.

VERDICT.md round-1 item 4: the gumbel_64 export target (>=10k levels/sec/
chip, BASELINE.json north_star) is D2H-bound on the dev axon relay, whose
bandwidth varies by day (measured 0.5-20 MB/s).  This tool records, in one
artifact, everything needed to judge the target:

  1. D2H bandwidth probe       — the day's relay weather (>=3 trials)
  2. dispatch-latency probe    — the relay round-trip floor
  3. compute+pack-only rate    — the whole export program (sample ->
     argmax decode -> bit-plane pack) with an on-device sink, i.e. the
     framework's rate with the relay taken out
  4. end-to-end api.generate   — what a user measures today, incl. D2H
     and host unpack (>=3 trials, post-warmup)
  5. the implied ceiling       — bandwidth / bytes-per-level, and whether
     >=10k levels/s is reachable through today's relay at all

Protocol per BASELINE.md: batched export, ckpt load excluded (fresh-init
params — throughput does not depend on weights), hard host sync via value
pulls (block_until_ready is unreliable through the relay).

Usage: python -m tools.bench_export [--preset gumbel_64] [--trials 3]
       [--out artifacts/bench_export.json]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from levelgan import rng


def _sync(x) -> float:
    return float(np.asarray(x).ravel()[0])


def probe_d2h(nbytes: int, trials: int):
    """Device->host bandwidth (MB/s) pulling a device buffer of ``nbytes``.

    A FRESH buffer per trial: jax caches the host copy of an array after
    its first transfer, so re-pulling the same buffer measures memcpy, not
    the relay (observed: 139 GB/s "bandwidth" on the second pull)."""
    import jax
    import jax.numpy as jnp

    make = jax.jit(lambda i: jnp.full((nbytes,), i, jnp.uint8))
    _sync(make(jnp.uint8(0))[:1])      # compile + warm the transfer path
    rates = []
    for t in range(trials):
        buf = make(jnp.uint8(t + 1))
        _sync(buf[:1])                 # materialize before timing
        t0 = time.perf_counter()
        np.asarray(buf)
        rates.append(nbytes / (time.perf_counter() - t0) / 1e6)
    return rates


def probe_dispatch(trials: int):
    """Relay round-trip floor: dispatch + pull of a scalar (ms)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    _sync(f(x))
    out = []
    for _ in range(trials):
        t0 = time.perf_counter()
        _sync(f(x))
        out.append((time.perf_counter() - t0) * 1e3)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="gumbel_64")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--seconds-per-trial", type=float, default=4.0,
                    help="target wall time per end-to-end trial; sets n")
    ap.add_argument("--out", default="artifacts/bench_export.json")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from levelgan import api
    from levelgan.config import preset
    from tools.bench_all import _enable_compile_cache
    _enable_compile_cache()

    cfg = preset(args.preset)
    m = cfg.model
    bpl = api.packed_bytes(m)          # packed wire bytes per level
    print(f"[bench_export] preset={args.preset} level={m.level_size} "
          f"n_tiles={m.n_tiles} packed {bpl} B/level "
          f"backend={jax.default_backend()}")

    # --- relay probes ----------------------------------------------------
    disp_ms = probe_dispatch(max(args.trials, 3))
    d2h = probe_d2h(8 << 20, max(args.trials, 3))
    bw = float(np.median(d2h))
    print(f"[bench_export] dispatch round-trip {np.median(disp_ms):.1f} ms; "
          f"D2H {bw:.1f} MB/s (trials: {[f'{r:.1f}' for r in d2h]})")

    # --- params (ckpt load excluded by protocol) -------------------------
    from levelgan.train.state import eval_generator_params
    state = jax.jit(lambda k: api.make_state(cfg, k))(rng.key(cfg, 0))
    params_g = eval_generator_params(state)

    # Conditional presets need a condition vector; throughput does not
    # depend on its value, so bench with a fixed mid-range one.
    cond_vec = ([0.3] * m.cond_dim) if m.cond_dim else None

    # --- compute+pack-only: same program, on-device sink -----------------
    nb_sink = 8
    gen_fn = api.make_generate_fn(cfg, args.batch, pack=True)

    @jax.jit
    def many_sink(pg, key):
        keys = jax.random.split(key, nb_sink)

        def body(i, acc):
            ids = gen_fn(pg, keys[i], cond_dev)
            return acc + jnp.sum(ids.astype(jnp.int32))

        return jax.lax.fori_loop(0, nb_sink, body, jnp.int32(0))

    cond_dev = (jnp.broadcast_to(jnp.asarray(cond_vec, jnp.float32),
                                 (args.batch, m.cond_dim))
                if cond_vec else None)
    _sync(many_sink(params_g, rng.key(cfg, 1)))    # compile + warm
    comp_rates = []
    for t in range(args.trials):
        t0 = time.perf_counter()
        _sync(many_sink(params_g, rng.key(cfg, 2 + t)))
        dt = time.perf_counter() - t0
        comp_rates.append(nb_sink * args.batch / dt)
    comp_rate = float(np.median(comp_rates))
    print(f"[bench_export] compute+pack only: {comp_rate:,.0f} levels/s")

    # --- end-to-end api.generate -----------------------------------------
    # Size each trial for ~seconds_per_trial of wall time under today's
    # relay (bandwidth-dominated when bw*1e6/bpl < comp_rate).
    pred = min(comp_rate, bw * 1e6 / bpl)
    n = int(max(args.batch, min(131072, pred * args.seconds_per_trial)))
    n -= n % args.batch
    n = max(n, args.batch)
    api.generate(cfg, params_g, args.batch, seed=9, cond=cond_vec,
                 batch_size=args.batch)               # warm the jit cache
    e2e_rates = []
    for t in range(args.trials):
        t0 = time.perf_counter()
        levels = api.generate(cfg, params_g, n, seed=10 + t, cond=cond_vec,
                              batch_size=args.batch)
        dt = time.perf_counter() - t0
        assert levels.shape == (n, m.level_size, m.level_size)
        e2e_rates.append(n / dt)
    e2e = float(np.median(e2e_rates))
    print(f"[bench_export] end-to-end: {e2e:,.0f} levels/s "
          f"(n={n}/trial, trials: {[f'{r:,.0f}' for r in e2e_rates]})")

    ceiling = bw * 1e6 / bpl
    target = 10_000
    reachable = ceiling >= target
    verdict = (
        f"target {target:,} levels/s needs {target * bpl / 1e6:.1f} MB/s "
        f"D2H at {bpl} B/level; today's relay gives {bw:.1f} MB/s -> "
        f"ceiling {ceiling:,.0f} levels/s "
        f"({'reachable' if reachable else 'NOT reachable through the relay'}"
        f"); compute-only rate {comp_rate:,.0f} levels/s "
        f"({'above' if comp_rate >= target else 'below'} target)")
    print(f"[bench_export] {verdict}")

    out = {
        "preset": args.preset,
        "batch": args.batch,
        "bytes_per_level_packed": bpl,
        "dispatch_ms": [round(v, 2) for v in disp_ms],
        "d2h_MBps": [round(v, 2) for v in d2h],
        "levels_per_sec_compute_pack_only": round(comp_rate),
        "levels_per_sec_compute_trials": [round(v) for v in comp_rates],
        "levels_per_sec_end_to_end": round(e2e),
        "levels_per_sec_e2e_trials": [round(v) for v in e2e_rates],
        "n_per_trial": n,
        "relay_ceiling_levels_per_sec": round(ceiling),
        "target": target,
        "target_reachable_through_relay": bool(reachable),
        "verdict": verdict,
        "backend": jax.default_backend(),
    }
    if args.out:
        import os
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"[bench_export] wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
