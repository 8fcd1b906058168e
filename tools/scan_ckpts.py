"""Sweep every kept checkpoint of one or more runs through the four
presence done-bar metrics (VERDICT r4 item 1): tile-marginal KL,
structural per-position chi2/dof, solvable fraction, exactly-one
START/GOAL fractions — all on the RAW sample path (repair off).

The round-5 fine-tune arms keep 6 checkpoints at 2k-step spacing
precisely so the transient can be ridden: an arm whose 20k endpoint has
re-diverged may still hold all four properties at an interior step.
One process, one compile (every arm shares the wgan_gp_32 shapes), so a
24-checkpoint sweep costs one generate-compile plus per-ckpt sampling.

Usage:
  python -m tools.scan_ckpts --runs runs/r5ft_E runs/r5ft_F \
      [--n 512] [--seed 0] [--out artifacts/scan_r5ft.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", nargs="+", required=True)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--kl-threshold", type=float, default=0.05)
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    from tools.bench_all import _enable_compile_cache
    _enable_compile_cache()

    from levelgan.api import generate, make_dataset
    from levelgan.cli.export import load_generator
    from levelgan.config import GOAL, START
    from levelgan.lio.checkpoint import all_checkpoints
    from levelgan.lio.quality import solvable_fraction
    from levelgan.lio.stats import kl_gate, per_position_chi2
    from levelgan.train.state import eval_generator_params

    corpus_cache = {}
    rows = []
    for run in args.runs:
        steps = all_checkpoints(run) or all_checkpoints(
            os.path.join(run, "ckpt"))
        if not steps:
            print(f"[scan] {run}: no checkpoints, skipping", file=sys.stderr)
            continue
        for path in steps:
            cfg, state = load_generator(path)
            key = (cfg.data, cfg.model)
            if key not in corpus_cache:
                corpus_cache[key] = make_dataset(cfg)
            ds = corpus_cache[key]
            levels = generate(cfg, eval_generator_params(state), args.n,
                              seed=args.seed, repair=False)
            gate = kl_gate(levels, ds.tile_histogram(cfg.model.n_tiles),
                           cfg.model.n_tiles, args.kl_threshold)
            chi2 = per_position_chi2(
                levels, ds.levels, cfg.model.n_tiles,
                channels={"structural": (START, GOAL)})
            sol = solvable_fraction(np.asarray(levels))
            row = {"run": run, "ckpt": path,
                   "step": int(os.path.basename(path).split("_")[-1]),
                   "kl": gate["kl"],
                   "chi2_per_dof_structural": chi2["chi2_per_dof_structural"],
                   **{k: sol[k] for k in ("solvable_frac", "one_start_frac",
                                          "one_goal_frac")}}
            row["done_bar"] = bool(
                row["kl"] <= args.kl_threshold
                and row["chi2_per_dof_structural"] <= 50
                and row["solvable_frac"] >= 0.9
                and row["one_start_frac"] >= 0.9
                and row["one_goal_frac"] >= 0.9)
            rows.append(row)
            print(f"[scan] {run} step {row['step']}: "
                  f"kl={row['kl']:.4f} chi2s={row['chi2_per_dof_structural']:.1f} "
                  f"solv={row['solvable_frac']:.3f} "
                  f"1S={row['one_start_frac']:.3f} 1G={row['one_goal_frac']:.3f}"
                  f"{'  <-- DONE-BAR' if row['done_bar'] else ''}",
                  flush=True)

    report = {"n": args.n, "seed": args.seed,
              "kl_threshold": args.kl_threshold, "rows": rows,
              "done_bar_hits": [r["ckpt"] for r in rows if r["done_bar"]]}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    print(f"[scan] {len(rows)} checkpoints, "
          f"{len(report['done_bar_hits'])} done-bar hits")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
