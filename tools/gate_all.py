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
                  repaired solvable_frac >= --solvable-threshold; track
                  lap_frac >= corpus lap_frac - 0.1.
  skillgap        curriculum checkpoints: separation >= 0 (the reference's
                  signature claim — generated levels separate the trained
                  strong/weak agents at least as well as corpus levels).

Usage:
  python -m tools.gate_all --runs runs/wgan_base runs/conditional_cm4 ...
                           [--out artifacts/gates_all.json] [--n 1024]
Exit 0 iff every gate of every checkpoint passes (the rollup records
per-gate results either way).
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
                    solvable_threshold: float) -> dict:
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
        from levelgan.lio.calibration import calibration_path
        if os.path.exists(calibration_path(ckpt)):
            code, rep = _capture_tool(eval_cond.main, [
                "--ckpt", ckpt, f"--n={max(n // 4, 128)}", f"--seed={seed}",
                "--repair", "--repair-placement", "uniform", "--calibrated"])
            slopes = {k: v.get("slope") for k, v in rep.get("dims", {}).items()
                      if isinstance(v, dict) and v.get("slope") is not None}
            record("causality_calibrated",
                   code == 0 and slopes
                   and all(0.5 <= s <= 1.5 for s in slopes.values()),
                   {"min_pearson_r": rep.get("min_pearson_r"),
                    "slopes": slopes, "slope_band": [0.5, 1.5]})

    # ---- quality (+ skill gap on curriculum checkpoints) -------------------
    qargs = ["--ckpt", ckpt, f"--n={n}", f"--seed={seed}", "--repair"]
    code, rep = _capture_tool(eval_quality.main, qargs)
    gen, corpus = rep.get("generated", {}), rep.get("corpus", {})
    if family == "tile":
        sf = gen.get("solvable_frac")
        record("quality", sf is not None and sf >= solvable_threshold,
               {"solvable_frac": sf, "threshold": solvable_threshold,
                "one_start_frac": gen.get("one_start_frac"),
                "one_goal_frac": gen.get("one_goal_frac"),
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
                solvable_threshold=args.solvable_threshold)
        except Exception as e:  # a broken run dir must not hide the rest
            row = {"ckpt": ckpt, "error": f"{type(e).__name__}: {e}",
                   "passed": False, "gates": {}}
        status = "PASS" if row["passed"] else "FAIL"
        fails = [k for k, g in row["gates"].items()
                 if not g["passed"] and not g.get("informative")]
        print(f"[gate_all] {status} {ckpt}"
              + (f" (failed: {', '.join(fails)})" if fails else ""),
              file=sys.stderr)
        rollup["checkpoints"].append(row)
    rollup["passed"] = all(r["passed"] for r in rollup["checkpoints"])
    text = json.dumps(rollup, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    return 0 if rollup["passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
