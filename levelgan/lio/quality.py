"""Sample-quality metrics beyond the tile-marginal gates: playability and
diversity of a generated (or corpus) level batch.

Reference equivalent: the reference judges generated levels by playability
(agents play them, SURVEY.md R7-R9) and by eyeballing sample grids for
mode collapse.  This module makes both judgments quantitative and batch
jit-compiled where they are compute-shaped:

- ``solvable_fraction`` — on-device flood-fill solver (env/solver.py).
- ``mean_pairwise_hamming`` — MXU-friendly diversity: one-hot agreement
  matmul over a level subsample; 0.0 = total mode collapse.
- ``unique_fraction`` — exact duplicate rate (host, byte-row unique —
  the data is tiny uint8 once on host).
- ``tile_entropy`` — marginal tile-distribution entropy in nats.

``quality_report`` bundles them; ``tools/eval_quality`` compares a
checkpoint's samples against the training corpus baseline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from levelgan.env.solver import solvable, well_formed


def solvable_fraction(levels: np.ndarray) -> dict[str, float]:
    """Playability stats of a uint8 [B, H, W] level batch (one jit call)."""
    ids = jnp.asarray(levels)
    sol, wf = jax.jit(lambda x: (solvable(x), well_formed(x)))(ids)
    out = {"solvable_frac": float(jnp.mean(sol))}
    out.update({f"{k}_frac": float(jnp.mean(v)) for k, v in wf.items()})
    return out


def unique_fraction(levels: np.ndarray) -> float:
    """Fraction of exactly-unique levels in the batch (duplicate detector)."""
    flat = np.ascontiguousarray(levels).reshape(len(levels), -1)
    return len(np.unique(flat, axis=0)) / max(len(flat), 1)


def mean_pairwise_hamming(levels: np.ndarray, n_tiles: int,
                          sample: int = 256, seed: int = 0) -> float:
    """Mean fraction of positions that differ between two distinct levels,
    over a ``sample``-sized subsample (full pairwise is O(B^2)).

    One-hot agreement via einsum: [k, HW, T] x [k, HW, T] -> [k, k] match
    counts — a batched matmul the MXU eats, instead of k^2 * HW host
    compares."""
    k = min(sample, len(levels))
    if k < 2:
        return 0.0
    idx = np.random.default_rng(seed).choice(len(levels), k, replace=False)
    x = jnp.asarray(levels[idx].reshape(k, -1))

    def pairwise(x):
        oh = jax.nn.one_hot(x, n_tiles, dtype=jnp.float32)
        agree = jnp.einsum("aht,bht->ab", oh, oh)
        ham = 1.0 - agree / x.shape[1]
        return (ham.sum() - jnp.trace(ham)) / (k * (k - 1))

    return float(jax.jit(pairwise)(x))


def tile_entropy(levels: np.ndarray, n_tiles: int) -> float:
    """Entropy (nats) of the marginal tile distribution; 0 = single tile."""
    counts = np.bincount(np.asarray(levels, np.int64).ravel(),
                         minlength=n_tiles).astype(np.float64)
    p = counts / counts.sum()
    nz = p[p > 0]
    return float(-(nz * np.log(nz)).sum())


def quality_report(levels: np.ndarray, n_tiles: int, *,
                   sample: int = 256, seed: int = 0) -> dict[str, float]:
    """All quality metrics for a uint8 [B, H, W] level batch."""
    report = {"n_levels": int(len(levels))}
    report.update(solvable_fraction(levels))
    report["unique_frac"] = unique_fraction(levels)
    report["mean_pairwise_hamming"] = mean_pairwise_hamming(
        levels, n_tiles, sample=sample, seed=seed)
    report["tile_entropy_nats"] = tile_entropy(levels, n_tiles)
    return report
