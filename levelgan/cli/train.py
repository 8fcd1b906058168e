"""Train CLI: ``python -m levelgan.cli.train`` (SURVEY.md N16, matched API [NS]).

Reference equivalent: ``python <train-script>.py --flags`` with argparse
(SURVEY.md R1/R14).  Surface: preset or config file selection + dotted
``--set key=value`` overrides + resume; runs ``levelgan.api.train``.
"""

from __future__ import annotations

import argparse

from levelgan.api import train
from levelgan.config import PRESET_NAMES, load_config


def parse_overrides(pairs: list[str]) -> dict:
    out = {}
    for p in pairs:
        if "=" not in p:
            raise SystemExit(f"--set expects key=value, got '{p}'")
        k, v = p.split("=", 1)
        out[k.strip()] = v.strip()
    return out


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="levelgan-train",
        description="Train a tile-level GAN (TPU-native, jit-compiled).")
    ap.add_argument("--preset", choices=PRESET_NAMES, default=None,
                    help="named config preset (BASELINE.json configs)")
    ap.add_argument("--config", default=None, help="YAML/JSON config file")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                    help="dotted config override, e.g. --set train.steps=500")
    ap.add_argument("--resume", default=None,
                    help="'auto' or a checkpoint directory")
    ap.add_argument("--out", default=None, help="shortcut for io.out_dir")
    ap.add_argument("--print-config", action="store_true",
                    help="print the fully-resolved config as JSON and exit "
                         "(pipe to a file, edit, re-run with --config)")
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)
    overrides = parse_overrides(args.set)
    if args.resume is not None:
        overrides["io.resume"] = args.resume
    if args.out is not None:
        overrides["io.out_dir"] = args.out
    cfg = load_config(args.config, args.preset or
                      (None if args.config else "toy_dcgan_16"), overrides)
    if args.print_config:
        print(cfg.to_json())
        return 0
    result = train(cfg)
    print(f"[levelgan] done: checkpoint={result['checkpoint']} "
          f"kl={result['kl']:.5f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
