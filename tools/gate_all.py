"""One command, every gate, one JSON (SURVEY.md §6 protocol; round-4 item).

Round 3 left five separate gate tools (`validate`, `eval_cond`,
`eval_quality`, `ref_band`, the training probe) with per-checkpoint
invocations scattered across README examples.  This driver runs every
APPLICABLE gate for each given checkpoint and emits one machine-readable
pass/fail rollup — the single command rounds 4+ (and any CI) run to check
regressions.

Per checkpoint:
  identity        tools.validate on the RAW sampling path (tile-marginal KL
                  gate + per-position chi2) — the statistical-identity
                  contract vs the training corpus.
  identity_shipped  the same gate on the SHIPPED export path (tile:
                  --repair --repair-placement uniform; track: --repair =
                  heading-closure projection — the defaults
                  levelgan-export uses for production).
  positional      chi2_per_dof_mean of the shipped path <= --chi2-threshold
                  (tile family; BASELINE.md uses 20 as the target band).
  causality       tools.eval_cond (conditional tile models only; shipped
                  repair-uniform path like the round-3 artifact); gate =
                  min per-dim Pearson r >= 0.5.  With a fitted
                  cond_calibration.json present, ALSO runs --calibrated
                  and gates slope in [0.5, 1.5] on every measurable dim.
  quality         tools.eval_quality on the shipped path; gate: tile
                  repaired solvable_frac >= --solvable-threshold AND
                  one_start/one_goal fractions >= --exactly-one-threshold
                  (the corpus's exactly-one invariant on what actually
                  ships; round 5 — previously reported but ungated);
                  track lap_frac >= corpus lap_frac - 0.1.
  structural_shipped  curriculum tile checkpoints: START/GOAL per-position
                  chi2/dof of the SHIPPED (repair-uniform) export <=
                  --chi2-threshold.  GATING — a curriculum may reshape the
                  raw distribution (see below), but its exported levels
                  must still place structural tiles corpus-lawfully.
  skillgap        curriculum checkpoints: separation >= 0 (the reference's
                  signature claim — generated levels separate the trained
                  strong/weak agents at least as well as corpus levels).

INFORMATIVE gates (recorded, NOT rolled into pass/fail): on curriculum
checkpoints the identity/identity_shipped/positional gates are marked
``"informative": true`` — the curriculum objective INTENTIONALLY reshapes
the output distribution toward playable/skill-separating levels
(SURVEY.md R9; that is config 5's contract), so distribution-shift
"failures" there are expected and would otherwise poison the rollup.
Every informative FAILURE is still surfaced loudly: each checkpoint row
and the top-level rollup carry an ``informative_failures`` list + count,
so a CI consumer reading ``passed: true`` also sees exactly which
recorded-but-non-gating checks are red (round 5 — previously the rollup
buried them; see BASELINE.md round-5 gate-semantics note).

Usage:
  python -m tools.gate_all --runs runs/wgan_base runs/wgan_gp_32_structural ...
                           [--out artifacts/gates_all.json] [--n 1024]
Exit 0 iff every NON-informative gate of every checkpoint passes; the
rollup records every gate result, informative or not, either way.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys

# Support both `python -m tools.gate_all` and `python tools/gate_all.py`.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _capture_tool(main_fn, argv) -> tuple[int, dict]:
    """Run a tool main() capturing its printed JSON report."""
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            code = main_fn(argv)
    except SystemExit as e:  # tools raise SystemExit(str) on misuse
        return 2, {"error": str(e)}
    text = buf.getvalue().strip()
    try:
        report = json.loads(text[text.index("{"):])
    except (ValueError, json.JSONDecodeError):
        report = {"raw_output": text[-2000:]}
    return int(code or 0), report


def _manifest_config(ckpt_dir: str) -> dict:
    """Newest step manifest's config without loading the full state."""
    from levelgan.lio.checkpoint import all_checkpoints, load_manifest
    if os.path.exists(os.path.join(ckpt_dir, "manifest.json")):
        return load_manifest(ckpt_dir)["config"]
    steps = (all_checkpoints(ckpt_dir)
             or all_checkpoints(os.path.join(ckpt_dir, "ckpt")))
    if not steps:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir!r}")
    return load_manifest(steps[-1])["config"]


def gate_checkpoint(ckpt: str, *, n: int, seed: int, chi2_threshold: float,
                    solvable_threshold: float,
                    exactly_one_threshold: float = 0.9) -> dict:
    from tools import eval_cond, eval_quality, validate

    cfg = _manifest_config(ckpt)
    family = cfg["model"]["family"]
    cond_dim = cfg["model"]["cond_dim"]
    is_curriculum = cfg["train"]["loss"] == "curriculum"
    out = {"ckpt": ckpt, "preset": cfg.get("preset", "custom"),
           "family": family, "gates": {}}
    gates = out["gates"]

    def record(name, passed, detail, informative=False):
        gates[name] = {"passed": bool(passed), **detail}
        if informative:
            # recorded but non-gating: curriculum checkpoints' identity.
            # The curriculum objective INTENTIONALLY reshapes the output
            # distribution toward playable / skill-separating levels
            # (SURVEY.md R9 — that is config 5's contract); the
            # statistical-identity contract binds the generative configs.
            # Measured: the reward-shaped race curriculum sits at
            # curvature KL 0.42 while its quality/skill gates pass.
            gates[name]["informative"] = True

    # per-family identity threshold (BASELINE.md): tile 0.05, track 0.1
    # (curvature-histogram KL over 16 bins has a coarser floor)
    kl_thr = 0.1 if family == "track" else 0.05
    nv = [f"--n={n}", f"--seed={seed}", f"--kl-threshold={kl_thr}"]

    # ---- identity: raw + shipped export path -------------------------------
    code, rep = _capture_tool(validate.main, ["--ckpt", ckpt] + nv)
    record("identity", code == 0,
           {k: rep.get(k) for k in ("kl", "threshold", "chi2_per_dof_mean",
                                    "chi2_per_dof_structural", "error")
            if k in rep}, informative=is_curriculum)
    shipped_args = (["--repair", "--repair-placement", "uniform"]
                    if family == "tile" else ["--repair"])
    code, rep = _capture_tool(validate.main, ["--ckpt", ckpt] + nv
                              + shipped_args)
    record("identity_shipped", code == 0,
           {k: rep.get(k) for k in ("kl", "threshold", "chi2_per_dof_mean",
                                    "chi2_per_dof_structural", "error")
            if k in rep}, informative=is_curriculum)
    if family == "tile" and "chi2_per_dof_mean" in rep:
        record("positional", rep["chi2_per_dof_mean"] <= chi2_threshold,
               {"chi2_per_dof_mean": rep["chi2_per_dof_mean"],
                "threshold": chi2_threshold}, informative=is_curriculum)
    if (family == "tile" and is_curriculum
            and "chi2_per_dof_structural" in rep):
        # GATING even on curriculum checkpoints (round 5): the curriculum
        # may reshape the raw distribution, but what it SHIPS (the
        # repair-uniform export above) must still place START/GOAL
        # corpus-lawfully — this is the structural gate the informative
        # identity rows do not provide (VERDICT r4 missing 2).
        record("structural_shipped",
               rep["chi2_per_dof_structural"] <= chi2_threshold,
               {"chi2_per_dof_structural": rep["chi2_per_dof_structural"],
                "threshold": chi2_threshold})

    # ---- causality (conditional tile models) -------------------------------
    if family == "tile" and cond_dim:
        code, rep = _capture_tool(eval_cond.main, [
            "--ckpt", ckpt, f"--n={max(n // 4, 128)}", f"--seed={seed}",
            "--repair", "--repair-placement", "uniform"])
        record("causality", code == 0,
               {"min_pearson_r": rep.get("min_pearson_r"),
                "slopes": {k: v.get("slope") for k, v in
                           rep.get("dims", {}).items() if isinstance(v, dict)},
                **({"error": rep["error"]} if "error" in rep else {})})
        from levelgan.lio.calibration import calibration_path, load_calibration
        if os.path.exists(calibration_path(ckpt)):
            code, rep = _capture_tool(eval_cond.main, [
                "--ckpt", ckpt, f"--n={max(n // 4, 128)}", f"--seed={seed}",
                "--repair", "--repair-placement", "uniform", "--calibrated"])
            slopes = {k: v.get("slope") for k, v in rep.get("dims", {}).items()
                      if isinstance(v, dict) and v.get("slope") is not None}
            # Gate the slope band only over dims the calibration actually
            # fitted (advisor r4: a dim whose sweep was degenerate passes
            # through UNcalibrated, so its raw attenuated slope would fail
            # a band the calibration file never claimed); the rest are
            # reported alongside, non-gating.
            cal_dims = set(load_calibration(ckpt).get("dims", {}))
            gated = {k: s for k, s in slopes.items() if k in cal_dims}
            ungated = {k: s for k, s in slopes.items() if k not in cal_dims}
            record("causality_calibrated",
                   code == 0 and gated
                   and all(0.5 <= s <= 1.5 for s in gated.values()),
                   {"min_pearson_r": rep.get("min_pearson_r"),
                    "slopes": gated, "slope_band": [0.5, 1.5],
                    **({"uncalibrated_dim_slopes": ungated}
                       if ungated else {})})

    # ---- quality (+ skill gap on curriculum checkpoints) -------------------
    qargs = ["--ckpt", ckpt, f"--n={n}", f"--seed={seed}", "--repair"]
    code, rep = _capture_tool(eval_quality.main, qargs)
    gen, corpus = rep.get("generated", {}), rep.get("corpus", {})
    if family == "tile":
        sf = gen.get("solvable_frac")
        one_s, one_g = gen.get("one_start_frac"), gen.get("one_goal_frac")
        # one_start/one_goal are GATED on the shipped path (round 5 —
        # previously reported-only, so a regression to round-2's
        # "START on the same 9 cells"-era multi/zero-START output would
        # have rolled up green as long as repair kept levels solvable).
        # The exactly-one repair tier makes 1.0 the by-construction norm.
        record("quality",
               sf is not None and sf >= solvable_threshold
               and one_s is not None and one_s >= exactly_one_threshold
               and one_g is not None and one_g >= exactly_one_threshold,
               {"solvable_frac": sf, "threshold": solvable_threshold,
                "one_start_frac": one_s, "one_goal_frac": one_g,
                "exactly_one_threshold": exactly_one_threshold,
                "unique_frac": gen.get("unique_frac"),
                "mean_pairwise_hamming": gen.get("mean_pairwise_hamming")})
    else:
        lf, clf = gen.get("lap_frac"), corpus.get("lap_frac")
        record("quality", lf is not None and clf is not None
               and lf >= clf - 0.1,
               {"lap_frac": lf, "corpus_lap_frac": clf,
                "closure_ok_frac": gen.get("closure_ok_frac")})
    if is_curriculum:
        sep = rep.get("skill_gap", {}).get("separation")
        record("skillgap", sep is not None and sep >= 0.0,
               {"separation": sep,
                "playable_separation":
                    rep.get("skill_gap", {}).get("playable_separation")})

    out["passed"] = all(g["passed"] for g in gates.values()
                        if not g.get("informative"))
    # Surface every recorded-but-non-gating red loudly (round 5): a CI
    # consumer reading `passed` must also see which informative checks
    # failed, not discover them by diffing gate dicts.
    out["informative_failures"] = sorted(
        k for k, g in gates.items()
        if g.get("informative") and not g["passed"])
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", nargs="+", required=True,
                    help="checkpoint run dirs (each a step dir, a ckpt/ "
                         "parent, or a run dir containing ckpt/)")
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chi2-threshold", type=float, default=20.0)
    ap.add_argument("--solvable-threshold", type=float, default=0.9)
    ap.add_argument("--exactly-one-threshold", type=float, default=0.9,
                    help="min one_start/one_goal fraction on the shipped "
                         "tile export (quality gate)")
    ap.add_argument("--out", default="", help="JSON rollup output path")
    args = ap.parse_args(argv)

    from tools.bench_all import _enable_compile_cache
    _enable_compile_cache()

    rollup = {"n": args.n, "seed": args.seed, "checkpoints": []}
    for ckpt in args.runs:
        try:
            row = gate_checkpoint(
                ckpt, n=args.n, seed=args.seed,
                chi2_threshold=args.chi2_threshold,
                solvable_threshold=args.solvable_threshold,
                exactly_one_threshold=args.exactly_one_threshold)
        except Exception as e:  # a broken run dir must not hide the rest
            row = {"ckpt": ckpt, "error": f"{type(e).__name__}: {e}",
                   "passed": False, "gates": {},
                   "informative_failures": []}
        status = "PASS" if row["passed"] else "FAIL"
        fails = [k for k, g in row["gates"].items()
                 if not g["passed"] and not g.get("informative")]
        info_fails = row["informative_failures"]
        print(f"[gate_all] {status} {ckpt}"
              + (f" (failed: {', '.join(fails)})" if fails else "")
              + (f" [informative failures: {', '.join(info_fails)}]"
                 if info_fails else ""),
              file=sys.stderr)
        rollup["checkpoints"].append(row)
    rollup["passed"] = all(r["passed"] for r in rollup["checkpoints"])
    rollup["informative_failures"] = sorted(
        f"{r['ckpt']}:{k}" for r in rollup["checkpoints"]
        for k in r.get("informative_failures", ()))
    rollup["informative_failure_count"] = len(rollup["informative_failures"])
    text = json.dumps(rollup, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    return 0 if rollup["passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
