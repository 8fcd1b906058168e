"""Sample-quality evaluation of a trained checkpoint vs its training corpus.

Beyond the statistical-identity gates (tools/validate), this scores what the
reference cared about qualitatively (SURVEY.md R7-R9, R12): are the generated
levels PLAYABLE (on-device flood-fill solver, env/solver.py) and DIVERSE
(unique fraction, pairwise Hamming, tile entropy), reported side by side with
the same metrics on the training corpus so "good" has a measured baseline.

Usage: python -m tools.eval_quality --ckpt <dir> [--n 1024] [--out report.json]
Exit 0 always (reporting tool, not a gate). Track family: drivability via
the deterministic scripted-driver lap test + geometry well-formedness
(track/quality.py) instead of the tile solver.

Curriculum checkpoints additionally get a ``skill_gap`` section
(lio/skillgap.py): the checkpoint's own trained strong/weak agents roll
on generated AND corpus levels, reporting whether the trained generator's
levels separate agent skill better than corpus levels (the reference's
signature claim, SURVEY.md R9).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

# Support both `python -m tools.eval_quality` and `python tools/eval_quality.py`
# (the latter lacks the repo root on sys.path, so `tools.` imports fail).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--n", type=int, default=1024,
                    help="levels to generate for the report")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sample", type=int, default=256,
                    help="subsample size for pairwise Hamming")
    ap.add_argument("--out", default="", help="optional JSON output path")
    ap.add_argument("--repair", action="store_true",
                    help="score the repaired export path (ops/repair.py)")
    args = ap.parse_args(argv)

    from tools.bench_all import _enable_compile_cache
    _enable_compile_cache()

    from levelgan.api import generate, make_dataset
    from levelgan.cli.export import load_generator
    from levelgan.lio.quality import quality_report
    from levelgan.train.state import eval_generator_params

    cfg, state = load_generator(args.ckpt)
    ds = make_dataset(cfg)
    cond = None
    if cfg.model.cond_dim:
        # corpus-mean condition, not a fixed 0.25 — see tools/validate.py
        # (an obedient conditional model complies with an off-corpus
        # request and the report would score that compliance as a defect)
        from levelgan.data.features import corpus_mean_cond
        cond = corpus_mean_cond(cfg, ds)

    if cfg.model.family == "track":
        # track quality is dynamic: the scripted-driver lap test +
        # geometry well-formedness (track/quality.py).  --repair applies
        # the exact heading-closure projection (track/ops.closure_project).
        from levelgan.track.quality import track_quality_report
        tracks = generate(cfg, eval_generator_params(state), args.n,
                          seed=args.seed, cond=cond, repair=args.repair)
        corpus_tracks = np.asarray(ds.tracks[:max(args.n, 1)])
        report = {
            "preset": cfg.preset,
            "repair": bool(args.repair),
            "generated": track_quality_report(tracks),
            "corpus": track_quality_report(corpus_tracks),
        }
        report["lap_gap"] = (report["corpus"]["lap_frac"]
                             - report["generated"]["lap_frac"])
        if cfg.train.loss == "curriculum":
            from levelgan.lio.skillgap import skill_gap_report
            report["skill_gap"] = skill_gap_report(
                cfg, state, tracks, corpus_tracks, seed=args.seed)
    else:
        levels = generate(cfg, eval_generator_params(state), args.n,
                          seed=args.seed, cond=cond, repair=args.repair)
        corpus = ds.levels[:max(args.n, 1)]
        report = {
            "preset": cfg.preset,
            "repair": bool(args.repair),
            "generated": quality_report(levels, cfg.model.n_tiles,
                                        sample=args.sample, seed=args.seed),
            "corpus": quality_report(np.asarray(corpus), cfg.model.n_tiles,
                                     sample=args.sample, seed=args.seed),
        }
        report["solvable_gap"] = (report["corpus"]["solvable_frac"]
                                  - report["generated"]["solvable_frac"])
        if cfg.train.loss == "curriculum":
            # the curriculum's defining objective, measured post-training:
            # do the trained G's levels separate the checkpoint's own
            # strong/weak agents more than corpus levels do?
            from levelgan.lio.skillgap import skill_gap_report
            report["skill_gap"] = skill_gap_report(
                cfg, state, levels, np.asarray(corpus), seed=args.seed)
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
