"""Conditioning-causality evaluation for the conditional family (config 4).

The statistical-identity gates (tools/validate) can pass even if the
generator learned to IGNORE its condition input — they evaluate one fixed
cond vector.  This tool measures whether conditioning is causal
(SURVEY.md §4.2 statistical tier, "chi-square on per-position
distributions for the conditional model"; BASELINE.json config 4):

1. **Response sweep** — for each of the 4 condition dims
   (data/features.py: wall_frac, hazard_frac, coin_frac, goal_dist),
   sweep the requested value across the corpus's own q10..q90 range
   (other dims held at the corpus mean), generate levels at each sweep
   point, measure the realized features of the *outputs* with the same
   ``level_features`` extractor the train step uses, and report
   requested-vs-realized Pearson r / slope / MAE per dim
   (lio/stats.response_stats).
2. **Bucketed per-position chi-square** — split the corpus into quantile
   buckets of each feature, condition generation on each bucket's mean
   feature vector, and compare the generations' per-position tile
   distributions against that bucket's corpus levels
   (lio/stats.per_position_chi2) — the conditional analogue of the
   unconditional positional gate.

Gate: min-over-dims Pearson r >= --threshold (default 0.5).  Exit 0 iff
the gate passes.  Usage:
  python -m tools.eval_cond --ckpt <dir> [--n 256] [--points 5]
                            [--buckets 3] [--threshold 0.5] [--out r.json]

Round 4 — response-magnitude calibration (lio/calibration.py):
  --fit-calibration   sweep the INTERNAL cond over a widened range
                      (--cal-span multiples of the corpus q10-q90
                      half-band, --cal-points points) per dim, fit the
                      monotone requested->internal inverse map, and write
                      cond_calibration.json next to the checkpoint.
  --calibrated        load that file and route every requested cond
                      through it; the reported slope then measures the
                      USER-space response (target ~1.0 within each dim's
                      achievable band) instead of the raw internal
                      response (measured 0.027-0.30 on three of four dims,
                      artifacts/eval_cond_32_cm4_repair.json).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

# Support both `python -m tools.eval_cond` and `python tools/eval_cond.py`.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def corpus_features(levels: np.ndarray, batch: int = 4096) -> np.ndarray:
    """level_features over a host corpus, batched through one jit program."""
    import jax
    from levelgan.data.features import level_features

    feat = jax.jit(level_features)
    out = [np.asarray(feat(levels[i:i + batch]))
           for i in range(0, len(levels), batch)]
    return np.concatenate(out, axis=0)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--n", type=int, default=256,
                    help="levels generated per sweep point / bucket")
    ap.add_argument("--points", type=int, default=5,
                    help="sweep points per condition dim")
    ap.add_argument("--buckets", type=int, default=3,
                    help="corpus quantile buckets for the conditional chi2")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="min per-dim requested-vs-realized Pearson r")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--repair", action="store_true",
                    help="evaluate the repaired export path; with "
                         "--repair-placement uniform on a conditional "
                         "model, repair honors the requested goal_dist "
                         "by construction (ops/repair.py)")
    ap.add_argument("--repair-placement", default="confidence",
                    choices=("confidence", "uniform"))
    ap.add_argument("--fit-calibration", action="store_true",
                    help="fit the requested->internal response calibration "
                         "from a widened internal sweep and write "
                         "cond_calibration.json next to the checkpoint")
    ap.add_argument("--cal-span", type=float, default=4.0,
                    help="calibration sweep half-width in multiples of the "
                         "corpus q10-q90 half-band")
    ap.add_argument("--cal-points", type=int, default=9,
                    help="internal sweep points per dim for the fit")
    ap.add_argument("--calibrated", action="store_true",
                    help="apply the checkpoint's cond_calibration.json to "
                         "every requested cond (user-space evaluation)")
    ap.add_argument("--out", default="", help="optional JSON output path")
    args = ap.parse_args(argv)
    if args.fit_calibration and args.calibrated:
        raise SystemExit("--fit-calibration must run on the RAW internal "
                         "response; drop --calibrated for the fit")

    from tools.bench_all import _enable_compile_cache
    _enable_compile_cache()

    from levelgan.api import generate, make_dataset
    from levelgan.cli.export import load_generator
    from levelgan.data.features import FEATURE_NAMES
    from levelgan.lio.stats import (per_position_chi2, quantile_buckets,
                                    response_stats)
    from levelgan.train.state import eval_generator_params

    cfg, state = load_generator(args.ckpt)
    if cfg.model.family != "tile":
        raise SystemExit("eval_cond is tile-family only (the 4 condition "
                         "dims are tile-level features, data/features.py)")
    if not cfg.model.cond_dim:
        raise SystemExit(f"checkpoint preset '{cfg.preset}' is unconditional "
                         "(model.cond_dim=0); nothing to evaluate")
    params = eval_generator_params(state)
    ds = make_dataset(cfg)
    corpus = np.asarray(ds.levels)
    feats = corpus_features(corpus)          # [N, 4]
    mean_feat = feats.mean(axis=0)

    calibration = None
    if args.calibrated:
        from levelgan.lio.calibration import (apply_calibration,
                                              load_calibration)
        calibration = load_calibration(args.ckpt)

    def realized(cond_vec, seed):
        cond_vec = np.asarray(cond_vec, np.float32)
        if calibration is not None:
            cond_vec = apply_calibration(calibration, cond_vec)
        levels = generate(cfg, params, args.n, seed=seed,
                          cond=cond_vec,
                          repair=args.repair,
                          repair_placement=args.repair_placement)
        return levels, corpus_features(levels)

    from levelgan.config import GOAL, START

    def measure_dim(d, name, levels, f):
        """Mean realized feature for dim d, with the goal_dist valid mask
        (distance is only defined when both endpoints exist; the extractor
        falls back to cell (0,0) for absent tiles, which would score a
        tile-dropping generator on garbage)."""
        valid_frac = None
        if name == "goal_dist":
            valid = ((levels == START).any(axis=(1, 2))
                     & (levels == GOAL).any(axis=(1, 2)))
            valid_frac = float(valid.mean())
            f = f[valid] if valid.any() else f[:0]
        return (float(f[:, d].mean()) if len(f) else float("nan")), valid_frac

    report = {"preset": cfg.preset, "n_per_point": args.n,
              "repair": bool(args.repair),
              "repair_placement": args.repair_placement,
              "calibrated": bool(calibration is not None),
              "threshold": args.threshold, "corpus_feature_mean":
              mean_feat.tolist(), "dims": {}}

    # ---- 1. response sweep per condition dim -------------------------------
    for d, name in enumerate(FEATURE_NAMES):
        lo, hi = np.quantile(feats[:, d], [0.10, 0.90])
        if hi <= lo:  # degenerate feature (constant corpus) — report, skip
            report["dims"][name] = {"skipped": "constant corpus feature",
                                    "pearson_r": None}
            continue
        requested = np.linspace(lo, hi, args.points)
        realized_means, valid_fracs = [], []
        for j, v in enumerate(requested):
            cond = mean_feat.copy()
            cond[d] = v
            levels, f = realized(cond, seed=args.seed + 1000 * d + j)
            mean_r, vf = measure_dim(d, name, levels, f)
            realized_means.append(mean_r)
            if vf is not None:
                valid_fracs.append(vf)
        if any(np.isnan(realized_means)):
            report["dims"][name] = {
                "skipped": "no levels carry both START and GOAL at some "
                           "sweep points — dim unmeasurable (train with "
                           "w_presence to make it exist)",
                "valid_frac": valid_fracs, "pearson_r": None}
            continue
        row = response_stats(requested, np.asarray(realized_means))
        if valid_fracs:
            row["valid_frac"] = valid_fracs
        report["dims"][name] = row

    # ---- 1b. calibration fit: widened INTERNAL sweep per dim ---------------
    if args.fit_calibration:
        from levelgan.lio.calibration import fit_from_sweeps, save_calibration
        sweeps = {}
        for d, name in enumerate(FEATURE_NAMES):
            lo, hi = np.quantile(feats[:, d], [0.10, 0.90])
            if hi <= lo:
                continue
            center, half = (hi + lo) / 2.0, (hi - lo) / 2.0
            internal = center + half * np.linspace(
                -args.cal_span, args.cal_span, args.cal_points)
            realized_means = []
            for j, v in enumerate(internal):
                cond = mean_feat.copy()
                cond[d] = v
                levels, f = realized(cond, seed=args.seed + 5000 * (d + 1) + j)
                mean_r, _ = measure_dim(d, name, levels, f)
                realized_means.append(mean_r)
            sweeps[name] = {"internal": internal.tolist(),
                            "realized": realized_means}
        cal = fit_from_sweeps(
            FEATURE_NAMES, sweeps,
            meta={"preset": cfg.preset, "n_per_point": args.n,
                  "cal_span": args.cal_span, "repair": bool(args.repair),
                  "repair_placement": args.repair_placement,
                  "seed": args.seed})
        path = save_calibration(args.ckpt, cal)
        report["calibration_written"] = path
        print(f"[eval_cond] wrote {path}", file=sys.stderr)

    # ---- 2. bucketed per-position chi-square -------------------------------
    buckets_out = {}
    for d, name in enumerate(FEATURE_NAMES):
        rows = []
        for b, idx in enumerate(quantile_buckets(feats[:, d], args.buckets)):
            if len(idx) < 8:
                continue
            cond = feats[idx].mean(axis=0)
            levels, f = realized(cond, seed=args.seed + 7000 + 100 * d + b)
            chi2 = per_position_chi2(levels, corpus[idx], cfg.model.n_tiles)
            rows.append({
                "bucket": b, "n_corpus": int(len(idx)),
                "requested": float(cond[d]),
                "realized": float(f[:, d].mean()),
                "chi2_per_dof_mean": chi2["chi2_per_dof_mean"],
            })
        buckets_out[name] = rows
    report["bucketed_chi2"] = buckets_out

    rs = [v["pearson_r"] for v in report["dims"].values()
          if v.get("pearson_r") is not None]
    report["min_pearson_r"] = min(rs) if rs else None
    # an UNMEASURABLE dim (generator never emits the tiles the feature
    # needs) is a causality failure, not an exemption; only corpus-side
    # degeneracy is excusable
    unmeasurable = any("unmeasurable" in str(v.get("skipped", ""))
                       for v in report["dims"].values())
    report["passed"] = (bool(rs) and not unmeasurable
                        and report["min_pearson_r"] >= args.threshold)

    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    return 0 if report["passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
