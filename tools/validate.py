"""Statistical-identity validation of a trained checkpoint (BASELINE.md gate).

Generates >=100k tiles from the checkpoint, rebuilds the training corpus
from the checkpoint's own config, and reports the tile-marginal KL gate +
per-position chi-square (SURVEY.md §6 protocol).

Usage: python -m tools.validate --ckpt <dir> [--n 2048] [--kl-threshold 0.05]
Exit code 0 iff the KL gate passes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

# Support both `python -m tools.validate` and `python tools/validate.py`
# (the latter lacks the repo root on sys.path, so `tools.` imports fail).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--kl-threshold", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--repair", action="store_true",
                    help="gate the repaired export path (tile: START/GOAL "
                         "placement; track: heading-closure projection)")
    ap.add_argument("--repair-placement", default="confidence",
                    choices=("confidence", "uniform"))
    args = ap.parse_args(argv)

    from tools.bench_all import _enable_compile_cache
    _enable_compile_cache()

    from levelgan.api import generate, make_dataset
    from levelgan.cli.export import load_generator
    from levelgan.lio.metrics import kl_divergence
    from levelgan.lio.stats import kl_gate, per_position_chi2

    cfg, state = load_generator(args.ckpt)
    from levelgan.train.state import eval_generator_params
    eval_params = eval_generator_params(state)
    ds = make_dataset(cfg)
    cond = None
    if cfg.model.cond_dim:
        # Condition at the CORPUS MEAN feature vector, not a fixed 0.25:
        # 0.25 requests hazard/coin fractions ~10x the corpus mean, and an
        # OBEDIENT conditional model (round-4 projection: response r 0.98)
        # complies and rightly shifts its tile distribution — the fixed
        # vector made the identity gate punish conditioning causality
        # (measured: projection KL 0.10 under cond=0.25 vs in-band KL at
        # the corpus mean; the round-3 concat model only passed because it
        # attenuates those dims).  The identity contract is "corpus-like
        # levels at a corpus-like request".
        from levelgan.data.features import corpus_mean_cond
        cond = corpus_mean_cond(cfg, ds)

    if cfg.model.family == "track":
        from levelgan.track.data import TrackDataset, curvature_histogram
        n = max(args.n, -(-100_000 // cfg.model.n_segments))
        tracks = generate(cfg, eval_params, n, seed=args.seed, cond=cond,
                          repair=args.repair)
        kl = float(kl_divergence(
            curvature_histogram(tracks, TrackDataset.N_BINS),
            ds.tile_histogram()))
        report = {"preset": cfg.preset, "repair": bool(args.repair),
                  "n_tracks": int(n), "kl": kl,
                  "threshold": args.kl_threshold,
                  "passed": kl <= args.kl_threshold,
                  "segments_sampled": int(n * cfg.model.n_segments)}
        print(json.dumps(report, indent=2))
        return 0 if report["passed"] else 1

    n = max(args.n, -(-100_000 // cfg.model.level_size ** 2))  # >=100k tiles
    levels = generate(cfg, eval_params, n, seed=args.seed, cond=cond,
                      repair=args.repair,
                      repair_placement=args.repair_placement)
    gate = kl_gate(levels, ds.tile_histogram(cfg.model.n_tiles),
                   cfg.model.n_tiles, args.kl_threshold)
    from levelgan.config import GOAL, START
    chi2 = per_position_chi2(levels, ds.levels, cfg.model.n_tiles,
                             channels={"structural": (START, GOAL)})

    report = {"preset": cfg.preset, "repair": bool(args.repair),
              "n_levels": int(n), **gate, **chi2}
    print(json.dumps(report, indent=2))
    return 0 if gate["passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
