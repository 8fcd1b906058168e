"""Sample-level export CLI: ``python -m levelgan.cli.export`` (SURVEY.md N15 [NS]).

Reference equivalent: the sample-dump helper that produced the README's
level images (SURVEY.md R12).  Batched jit generation, on-device argmax
decode, single host transfer; writes ``.npz`` (uint8 levels), ``.txt``
(ascii render), or ``.png`` (tile-color grid).  Prints levels/sec — the
BASELINE.md export-throughput metric.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import numpy as np

from levelgan import rng

from levelgan.api import generate
from levelgan.config import Config
from levelgan.lio.checkpoint import load_checkpoint, load_manifest

ASCII_TILES = ".#SGXo~*"
# RGB palette per tile id (empty, wall, start, goal, hazard, coin, sand, ice)
PALETTE = np.array([
    [236, 236, 228], [60, 56, 54], [69, 133, 66], [214, 93, 14],
    [204, 36, 29], [215, 153, 33], [189, 174, 147], [131, 165, 152],
], dtype=np.uint8)


def load_generator(ckpt: str):
    # Accept either a step directory (.../ckpt/step_00001000) or the ckpt
    # parent; for the parent, walk candidates newest-to-oldest past
    # unreadable ones (a truncated arrays.npz from a mid-writeback crash
    # must not make the whole run unloadable — mirrors api.train's
    # resume='auto' corrupt-skip; a bare run directory with an
    # out_dir/ckpt tree also resolves, one level down).
    if os.path.exists(os.path.join(ckpt, "manifest.json")):
        candidates = [ckpt]
    else:
        from levelgan.lio.checkpoint import all_checkpoints
        candidates = (all_checkpoints(ckpt)
                      or all_checkpoints(os.path.join(ckpt, "ckpt")))
        if not candidates:
            raise FileNotFoundError(
                f"no checkpoint found under {ckpt!r} (expected a step dir "
                "with manifest.json, or a parent containing step_* dirs)")
    errors = []
    for path in reversed(candidates):
        try:
            cfg = Config.from_dict(load_manifest(path)["config"])
            from levelgan.api import make_state
            # jit the example-state init: eager init is hundreds of small
            # dispatches (minutes through the dev relay at ~28ms each);
            # jitted it is one
            example = jax.device_get(
                jax.jit(lambda k: make_state(cfg, k))(rng.key(cfg, 0)))
            state, cfg = load_checkpoint(path, example)
            return cfg, state
        except Exception as e:  # corrupt/truncated step: try the previous one
            errors.append(f"{path}: {e}")
            # loud fallback: a silently-loaded OLDER checkpoint would export
            # a stale model with no user-visible indication (advisor r3)
            print(f"[levelgan] WARNING: skipping unreadable checkpoint "
                  f"{path}: {e}", file=sys.stderr)
    raise FileNotFoundError(
        "no readable checkpoint under {!r}; tried newest-to-oldest:\n  {}"
        .format(ckpt, "\n  ".join(errors)))


def write_txt(path: str, levels: np.ndarray):
    with open(path, "w") as f:
        for lv in levels:
            for row in lv:
                f.write("".join(ASCII_TILES[min(t, len(ASCII_TILES) - 1)]
                                for t in row) + "\n")
            f.write("\n")


def render_levels_rgb(levels: np.ndarray, scale: int = 8,
                      cols: int = 8) -> np.ndarray:
    """Tile a batch of uint8 level grids into one RGB image array."""
    n, h, w = levels.shape
    cols = min(cols, n)
    rows = (n + cols - 1) // cols
    grid = np.zeros((rows * h, cols * w), dtype=np.uint8)
    for i, lv in enumerate(levels):
        r, c = divmod(i, cols)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = lv
    rgb = PALETTE[np.minimum(grid, len(PALETTE) - 1)]
    return np.repeat(np.repeat(rgb, scale, 0), scale, 1)


def write_png(path: str, levels: np.ndarray, scale: int = 8, cols: int = 8):
    rgb = render_levels_rgb(levels, scale, cols)
    try:
        from PIL import Image
        Image.fromarray(rgb).save(path)
    except ImportError:
        np.savez(path + ".npz", rgb=rgb)
        print(f"[levelgan] PIL unavailable; wrote raw RGB to {path}.npz")


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="levelgan-export",
        description="Export generated levels from a checkpoint.")
    ap.add_argument("--ckpt", required=True, help="checkpoint directory")
    ap.add_argument("--n", type=int, default=64, help="number of levels")
    ap.add_argument("--out", required=True, help=".npz / .txt / .png output")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cond", default=None,
                    help="comma-separated feature vector (conditional models)")
    ap.add_argument("--repair-placement", default=None,
                    choices=("confidence", "uniform"),
                    help="tile-family repair cell choice: the generator's "
                         "most-confident valid cell, or a uniform sample "
                         "over the valid mask (corpus placement law — "
                         "matches the positional gate by construction). "
                         "Default: cfg.io.export_repair_placement.")
    ap.add_argument("--repair", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="family-specific exact output repair "
                         "(ops/repair.py / track/ops.py closure "
                         "projection). Default: cfg.io.export_repair "
                         "('auto' = tile off, track on); --no-repair "
                         "exports the raw model output.")
    ap.add_argument("--exactly-one", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="with tile repair: also demote DUPLICATE "
                         "START/GOAL tiles so each level carries exactly "
                         "one of each (the corpus invariant). Default: "
                         "cfg.io.export_exactly_one ('auto' = on when "
                         "repairing).")
    ap.add_argument("--calibrated", action="store_true",
                    help="map --cond through the checkpoint's "
                         "cond_calibration.json (requested->internal "
                         "response calibration, lio/calibration.py; fit "
                         "one with tools.eval_cond --fit-calibration) so "
                         "the requested features are realized at ~unit "
                         "slope within the achievable band")
    args = ap.parse_args(argv)

    from levelgan.xla_cache import enable as enable_xla_cache
    enable_xla_cache()
    cfg, state = load_generator(args.ckpt)
    cond = None
    if args.cond is not None:
        cond = np.array([float(x) for x in args.cond.split(",")], np.float32)
        if cond.size != cfg.model.cond_dim:
            raise SystemExit(f"--cond needs {cfg.model.cond_dim} values, "
                             f"got {cond.size}")
    elif cfg.model.cond_dim:
        # default request = the corpus-mean feature vector ("a typical
        # level"), not a fixed 0.25 — 0.25 asks for ~10x the corpus hazard/
        # coin rates and an obedient model complies (tools/validate.py)
        # FULL-corpus mean (advisor r4: a first-4096 prefix mean let the
        # shipped default operating point drift from the one the identity
        # gate certifies — tools/validate and the gates share this helper)
        from levelgan.api import make_dataset
        from levelgan.data.features import corpus_mean_cond
        ds = make_dataset(cfg)
        cond = corpus_mean_cond(cfg, ds)
    if args.calibrated:
        if cond is None:
            raise SystemExit("--calibrated requires a conditional model")
        from levelgan.lio.calibration import (apply_calibration,
                                              load_calibration)
        cond = apply_calibration(load_calibration(args.ckpt), cond)

    t0 = time.perf_counter()
    from levelgan.train.state import eval_generator_params
    levels = generate(cfg, eval_generator_params(state), args.n, seed=args.seed,
                      batch_size=args.batch, cond=cond, repair=args.repair,
                      repair_placement=args.repair_placement,
                      exactly_one=args.exactly_one)
    dt = time.perf_counter() - t0

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    if cfg.model.family == "track":
        if args.out.endswith(".npz"):
            np.savez_compressed(args.out, tracks=levels)
        elif args.out.endswith(".png"):
            from levelgan.track.render import write_track_png
            write_track_png(args.out, levels)
        else:
            raise SystemExit("track export supports .npz or .png")
    elif args.out.endswith(".npz"):
        np.savez_compressed(args.out, levels=levels)
    elif args.out.endswith(".txt"):
        write_txt(args.out, levels)
    elif args.out.endswith(".png"):
        write_png(args.out, levels)
    else:
        raise SystemExit("--out must end in .npz, .txt, or .png")
    print(f"[levelgan] exported {len(levels)} levels to {args.out} "
          f"({len(levels) / dt:,.0f} levels/sec incl. compile)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
