"""Per-stage K1 microbenchmark: Pallas vs XLA twin, fwd and fwd+bwd, real TPU.

Protocol (BASELINE.md): K iterations chained in ONE jit program via
lax.scan (the axon relay adds ~28 ms per dispatch and per-step
block_until_ready is unreliable), hard host sync via float(np.asarray(..)),
median over trials.  A tiny grad-feedback into the carry defeats DCE and
mirrors the training data flow.

Usage:  python tools/bench_kernels.py [--k 30] [--trials 5] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from levelgan.config import ModelConfig
from levelgan.models.generator import generator_stages
from levelgan.ops.blocks import upsample_block_xla


def stage_shapes(level_size: int, batch: int):
    """(b, h, ci, co) per generator upsample stage of a preset."""
    cfg = ModelConfig(level_size=level_size)
    chans = generator_stages(cfg)
    out_chans = chans[1:] + [max(cfg.base_channels // 2, cfg.n_tiles * 2)]
    shapes, h = [], 4
    for i, co in enumerate(out_chans):
        shapes.append((batch, h, chans[0] if i == 0 else out_chans[i - 1], co))
        h *= 2
    return shapes


def make_inputs(b, h, ci, co, dtype):
    k = jax.random.key(0)
    ks = jax.random.split(k, 4)
    x = jax.random.normal(ks[0], (b, h, h, ci), jnp.float32).astype(dtype)
    w = (jax.random.normal(ks[1], (4, 4, ci, co), jnp.float32) * 0.05)
    gamma = jnp.ones((co,), jnp.float32)
    beta = jnp.zeros((co,), jnp.float32)
    return x, w, gamma, beta


def bench(fn, args, k, trials):
    """Median seconds per iteration of fn, K chained in one dispatch."""
    def loss(x, w, gamma, beta):
        y = fn(x, w, gamma, beta)
        return (y.astype(jnp.float32) ** 2).mean()

    def body(carry, _):
        x, w, gamma, beta = carry
        l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
            x, w, gamma, beta)
        dx, dw, dg, db = grads
        # tiny feedback defeats DCE; mirrors an SGD update's data flow
        x = x - (1e-6 * dx).astype(x.dtype)
        w = w - 1e-6 * dw
        gamma = gamma - 1e-6 * dg
        beta = beta - 1e-6 * db
        return (x, w, gamma, beta), l

    def body_fwd(carry, _):
        x, w, gamma, beta = carry
        l = loss(x, w, gamma, beta)
        x = x + (1e-20 * l).astype(x.dtype)
        return (x, w, gamma, beta), l

    out = {}
    for mode, bd in (("fwd", body_fwd), ("fwd+bwd", body)):
        run = jax.jit(lambda c: jax.lax.scan(bd, c, None, length=k))
        carry = run(args)  # compile + warm
        float(np.asarray(carry[1][-1]))
        times = []
        for _ in range(trials):
            t0 = time.perf_counter()
            c2 = run(args)
            float(np.asarray(c2[1][-1]))
            times.append((time.perf_counter() - t0) / k)
        out[mode] = float(np.median(times))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    from levelgan.kernels.upsample_block import upsample_block_pallas
    dtype = jnp.dtype(args.dtype)
    impls = {
        "xla": lambda x, w, g, b: upsample_block_xla(
            x, w, g, b, compute_dtype=dtype),
        "pallas": lambda x, w, g, b: upsample_block_pallas(
            x, w, g, b, compute_dtype=dtype),
    }

    from levelgan.kernels.upsample_block import pallas_fits
    from levelgan.kernels.upsample_rows import rows_fits

    def which_kernel(b, h, ci, co):
        """Which implementation upsample_block_sm dispatches to."""
        if pallas_fits(b, h, h, ci, co, dtype):
            return "mono"
        if rows_fits(b, h, h, ci, co, dtype):
            return "rows"
        return "xla-fallback"

    print(f"[bench_kernels] backend={jax.default_backend()} "
          f"devices={jax.devices()} dtype={args.dtype} K={args.k}")
    rows = []
    for level in (32, 64):
        for (b, h, ci, co) in stage_shapes(level, args.batch):
            row = {"level": level, "b": b, "h": h, "ci": ci, "co": co,
                   "kernel": which_kernel(b, h, ci, co)}
            for name, fn in impls.items():
                ins = make_inputs(b, h, ci, co, dtype)
                r = bench(fn, ins, args.k, args.trials)
                row[f"{name}_fwd_ms"] = r["fwd"] * 1e3
                row[f"{name}_train_ms"] = r["fwd+bwd"] * 1e3
            row["speedup_fwd"] = row["xla_fwd_ms"] / row["pallas_fwd_ms"]
            row["speedup_train"] = row["xla_train_ms"] / row["pallas_train_ms"]
            rows.append(row)
            print(f"  L{level} stage {h}x{h} {ci}->{co} [{row['kernel']}]: "
                  f"fwd xla {row['xla_fwd_ms']:.3f} / pallas "
                  f"{row['pallas_fwd_ms']:.3f} ms ({row['speedup_fwd']:.2f}x)"
                  f" | train xla {row['xla_train_ms']:.3f} / pallas "
                  f"{row['pallas_train_ms']:.3f} ms "
                  f"({row['speedup_train']:.2f}x)")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"[bench_kernels] wrote {args.json}")


if __name__ == "__main__":
    main()
