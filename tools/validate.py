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

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--kl-threshold", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from levelgan.api import generate
    from levelgan.cli.export import load_generator
    from levelgan.data.dataset import LevelDataset
    from levelgan.lio.stats import kl_gate, per_position_chi2

    cfg, state = load_generator(args.ckpt)
    n = max(args.n, -(-100_000 // cfg.model.level_size ** 2))  # >=100k tiles
    cond = (np.full(cfg.model.cond_dim, 0.25, np.float32)
            if cfg.model.cond_dim else None)
    levels = generate(cfg, state.generator, n, seed=args.seed, cond=cond)

    ds = LevelDataset.from_config(cfg.data, cfg.model, seed=cfg.train.seed)
    gate = kl_gate(levels, ds.tile_histogram(cfg.model.n_tiles),
                   cfg.model.n_tiles, args.kl_threshold)
    chi2 = per_position_chi2(levels, ds.levels, cfg.model.n_tiles)

    report = {"preset": cfg.preset, "n_levels": int(n), **gate, **chi2}
    print(json.dumps(report, indent=2))
    return 0 if gate["passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
