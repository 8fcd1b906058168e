"""Training-progress GIF: one frame per checkpoint, fixed latent seed.

Reference parity (SURVEY.md R12): the reference repo's README animations
were produced by periodically dumping samples from the in-training
generator.  This tool replays that from a levelgan run directory — every
checkpoint under ``<run>/ckpt`` is sampled with the SAME seed (so the GIF
shows the generator's evolution on fixed latents, not sampling noise) and
rendered with the export CLI's tile palette (or the track rasterizer for
the track family).

Usage:
  python -m levelgan.cli.progress_gif runs/toy_long --out progress.gif
                                      [--n 16] [--seed 0] [--fps 4] [--scale 8]

Requires >=1 checkpoint; with one checkpoint you get a 1-frame GIF.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(prog="levelgan-progress-gif")
    ap.add_argument("run", help="run directory (containing ckpt/) "
                               "or a ckpt/ directory itself")
    ap.add_argument("--out", default=None,
                    help="output .gif path (default <run>/progress.gif)")
    ap.add_argument("--n", type=int, default=16, help="levels per frame")
    ap.add_argument("--seed", type=int, default=0,
                    help="latent seed, shared by every frame")
    ap.add_argument("--fps", type=float, default=4.0)
    ap.add_argument("--scale", type=int, default=8,
                    help="pixels per tile (tile family)")
    ap.add_argument("--cols", type=int, default=4)
    ap.add_argument("--cond", default=None,
                    help="comma-separated feature vector (conditional models)")
    args = ap.parse_args(argv)

    ckpt_dir = args.run
    if os.path.isdir(os.path.join(args.run, "ckpt")):
        ckpt_dir = os.path.join(args.run, "ckpt")
    out = args.out or os.path.join(
        args.run if ckpt_dir != args.run else os.path.dirname(ckpt_dir) or ".",
        "progress.gif")

    from levelgan.api import generate
    from levelgan.cli.export import load_generator, render_levels_rgb
    from levelgan.lio.checkpoint import all_checkpoints
    from levelgan.track.render import render_tracks_gray
    from levelgan.train.state import eval_generator_params

    ckpts = all_checkpoints(ckpt_dir)
    if not ckpts:
        raise SystemExit(f"no checkpoints under {ckpt_dir}")

    frames = []
    for path in ckpts:
        cfg, state = load_generator(path)
        cond = None
        if args.cond is not None:
            cond = np.array([float(x) for x in args.cond.split(",")],
                            np.float32)
        elif cfg.model.cond_dim:
            cond = np.full(cfg.model.cond_dim, 0.25, np.float32)
        levels = np.asarray(generate(cfg, eval_generator_params(state),
                                     args.n, seed=args.seed, cond=cond))
        if cfg.model.family == "track":
            img = render_tracks_gray(levels, cols=args.cols)
            img = np.stack([img] * 3, -1)
        else:
            img = render_levels_rgb(levels, scale=args.scale, cols=args.cols)
        frames.append(img)
        print(f"[progress_gif] frame {len(frames)}/{len(ckpts)}: {path}",
              flush=True)

    try:
        from PIL import Image
    except ImportError:
        npz = out + ".npz"
        np.savez_compressed(npz, frames=np.stack(frames))
        print(f"[progress_gif] PIL unavailable; wrote frames to {npz}")
        return 0
    ims = [Image.fromarray(f) for f in frames]
    ims[0].save(out, save_all=True, append_images=ims[1:],
                duration=int(1000 / args.fps), loop=0)
    print(f"[progress_gif] wrote {len(ims)} frames to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
