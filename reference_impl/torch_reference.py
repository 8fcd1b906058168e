"""Faithful CPU reimplementation of the reference's config-1 run (torch).

The reference repo publishes no benchmark numbers and the mount is empty
(SURVEY.md §0/§6), so BASELINE.md mandates measuring the reference
configuration ourselves: a PyTorch DCGAN on 16x16 one-hot tile grids,
batch 64, eager on CPU, with HOST-side NumPy preprocessing each step
(one-hot encode + D4 augmentation) — the exact pipeline shape the north star
calls out as the bottleneck to eliminate.

Architecture mirrors SURVEY.md §3.5's reconstruction of the reference:
z -> Linear -> reshape 4x4 -> [ConvTranspose2d(4,2) -> BatchNorm2d -> ReLU]
x2 -> Conv -> softmax over tile channels; mirror-image discriminator; BCE
losses; Adam(2e-4, 0.5/0.999).  This is new code written for measurement —
nothing is copied from the (empty) reference mount.

Run:  python -m reference_impl.torch_reference [--steps 60] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import torch
import torch.nn as nn

from levelgan.data.dataset import synthetic_corpus


class RefGenerator(nn.Module):
    def __init__(self, latent=64, base=64, n_tiles=8):
        super().__init__()
        ch0 = base * 2
        self.fc = nn.Linear(latent, 4 * 4 * ch0)
        self.net = nn.Sequential(
            nn.BatchNorm2d(ch0), nn.ReLU(True),
            nn.ConvTranspose2d(ch0, base, 4, 2, 1),
            nn.BatchNorm2d(base), nn.ReLU(True),
            nn.ConvTranspose2d(base, base // 2, 4, 2, 1),
            nn.BatchNorm2d(base // 2), nn.ReLU(True),
            nn.Conv2d(base // 2, n_tiles, 3, 1, 1),
        )
        self.ch0 = ch0

    def forward(self, z):
        x = self.fc(z).view(-1, self.ch0, 4, 4)
        return torch.softmax(self.net(x), dim=1)


class RefDiscriminator(nn.Module):
    def __init__(self, base=64, n_tiles=8):
        super().__init__()
        self.net = nn.Sequential(
            nn.Conv2d(n_tiles, base, 4, 2, 1), nn.LeakyReLU(0.2, True),
            nn.Conv2d(base, base * 2, 4, 2, 1),
            nn.BatchNorm2d(base * 2), nn.LeakyReLU(0.2, True),
            nn.Flatten(), nn.Linear(base * 2 * 4 * 4, 1),
        )

    def forward(self, x):
        return self.net(x).squeeze(1)


def host_preprocess(batch_ids: np.ndarray, n_tiles: int,
                    rng: np.random.Generator) -> np.ndarray:
    """Host NumPy augmentation + one-hot encode, per step (reference style)."""
    out = np.empty((len(batch_ids), n_tiles) + batch_ids.shape[1:], np.float32)
    for i, lv in enumerate(batch_ids):
        e = rng.integers(0, 8)
        if e >= 4:
            lv = lv[:, ::-1]
        lv = np.rot90(lv, k=e % 4)
        out[i] = np.eye(n_tiles, dtype=np.float32)[lv].transpose(2, 0, 1)
    return out


def _run_training(steps: int, batch: int, level: int, n_tiles: int,
                  latent: int, seed: int, corpus: np.ndarray | None,
                  warmup: int = 0):
    """The ONE config-1 training loop (shared by measure/train_reference so
    the timed baseline and the statistical-gate runs cannot drift apart).

    Returns (g, per_step_times, final_d_loss, final_g_loss)."""
    torch.manual_seed(seed)
    rng = np.random.default_rng(seed)
    if corpus is None:
        corpus = synthetic_corpus(4096, level, seed=1234)

    g, d = RefGenerator(latent, 64, n_tiles), RefDiscriminator(64, n_tiles)
    opt_g = torch.optim.Adam(g.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(d.parameters(), lr=2e-4, betas=(0.5, 0.999))
    bce = nn.BCEWithLogitsLoss()

    times = []
    for _ in range(warmup + steps):
        t0 = time.perf_counter()
        idx = rng.integers(0, len(corpus), batch)
        real = torch.from_numpy(host_preprocess(corpus[idx], n_tiles, rng))

        z = torch.randn(batch, latent)
        fake = g(z).detach()
        opt_d.zero_grad()
        d_loss = bce(d(real), torch.full((batch,), 0.9)) + \
            bce(d(fake), torch.zeros(batch))
        d_loss.backward()
        opt_d.step()

        z = torch.randn(batch, latent)
        opt_g.zero_grad()
        g_loss = bce(d(g(z)), torch.ones(batch))
        g_loss.backward()
        opt_g.step()
        times.append(time.perf_counter() - t0)
    return g, times[warmup:], float(d_loss.detach()), float(g_loss.detach())


def measure(steps: int = 60, batch: int = 64, level: int = 16,
            n_tiles: int = 8, latent: int = 64, warmup: int = 10,
            seed: int = 0) -> dict:
    _, times, d_loss, g_loss = _run_training(
        steps, batch, level, n_tiles, latent, seed, None, warmup=warmup)
    med_ms = float(np.median(times) * 1e3)
    return {
        "metric": "toy_dcgan16_train_step_time",
        "value": med_ms, "unit": "ms",
        "hardware": "cpu (torch eager, host-numpy preprocessing)",
        "steps_measured": steps, "batch": batch, "level_size": level,
        "torch": torch.__version__, "threads": torch.get_num_threads(),
        "final_d_loss": d_loss, "final_g_loss": g_loss,
    }


def train_reference(steps: int = 100, batch: int = 64, level: int = 16,
                    n_tiles: int = 8, latent: int = 64, seed: int = 0,
                    corpus: np.ndarray | None = None) -> RefGenerator:
    """Train the reference configuration (no timing) and return the G net.

    Same loop as ``measure`` (literally — shared ``_run_training``); used by
    tools/ref_band.py to establish the reference-run tile-distribution band
    the BASELINE 'statistically identical' gate compares against.  Pass
    ``corpus`` to train on the exact corpus the gate's target histogram is
    built from."""
    g, _, _, _ = _run_training(steps, batch, level, n_tiles, latent, seed,
                               corpus)
    return g


@torch.no_grad()
def sample_levels(g: RefGenerator, n: int, latent: int = 64,
                  batch: int = 256, seed: int = 0) -> np.ndarray:
    """Sample ``n`` uint8 tile-id levels from a trained reference G.

    ``g.eval()`` matters: in train mode the BatchNorm layers would
    normalize by each sampling batch's own statistics, making the sampled
    tile distribution depend on the sampling batch size/composition —
    eval mode uses the running stats, so the distribution is a property
    of the trained model only."""
    was_training = g.training
    g.eval()
    torch.manual_seed(seed + 1)
    out = []
    for i in range(0, n, batch):
        z = torch.randn(min(batch, n - i), latent)
        probs = g(z)                       # [b, n_tiles, H, W] softmax
        out.append(probs.argmax(dim=1).to(torch.uint8).numpy())
    if was_training:
        g.train()
    return np.concatenate(out)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    result = measure(steps=args.steps)
    print(json.dumps(result, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=2)
