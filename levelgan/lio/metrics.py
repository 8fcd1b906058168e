"""Metrics: the tile-histogram KL harness + structured JSONL logging.

Reference equivalent: visdom/tensorboard scalars (SURVEY.md R13 [TK-M]).
The KL harness implements BASELINE.md's normative protocol: KL(P_gen || P_ref)
over tile-type marginal frequencies with add-one smoothing.  It is the gating
statistical metric for every config (SURVEY.md §6), so it lands in M1 and is
computed on-device (only the n_tiles-sized histogram crosses to host).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def tile_histogram(ids: jax.Array, n_tiles: int) -> jax.Array:
    """Tile-type counts [n_tiles] of an id grid batch. On-device, jittable."""
    one_hot = jax.nn.one_hot(ids.reshape(-1), n_tiles, dtype=jnp.float32)
    return one_hot.sum(axis=0)


def kl_divergence(p_counts, q_counts) -> jax.Array:
    """KL(P || Q) from raw counts with add-one smoothing (BASELINE.md)."""
    p_counts = jnp.asarray(p_counts, dtype=jnp.float64 if jax.config.jax_enable_x64
                           else jnp.float32) + 1.0
    q_counts = jnp.asarray(q_counts, dtype=p_counts.dtype) + 1.0
    p = p_counts / p_counts.sum()
    q = q_counts / q_counts.sum()
    return jnp.sum(p * (jnp.log(p) - jnp.log(q)))


def histogram_kl(gen_ids, ref_counts, n_tiles: int) -> jax.Array:
    """KL(P_gen || P_ref) of generated id grids vs reference counts."""
    return kl_divergence(tile_histogram(gen_ids, n_tiles), ref_counts)


class MetricsLogger:
    """Structured JSONL metrics writer (SURVEY.md §5.5).

    One JSON object per line: {"step": ..., "wall_time": ..., **scalars}.
    Device arrays are pulled to host floats only here, at log points.
    """

    def __init__(self, out_dir: str, filename: str = "metrics.jsonl",
                 echo: bool = True):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, filename)
        self._f = open(self.path, "a", buffering=1)
        self._echo = echo
        self._t0 = time.monotonic()

    def log(self, step: int, **scalars):
        rec = {"step": int(step), "wall_time": round(time.monotonic() - self._t0, 4)}
        for k, v in scalars.items():
            if isinstance(v, (jax.Array, np.ndarray)):
                v = np.asarray(v)
                v = v.item() if v.ndim == 0 else v.tolist()
            rec[k] = round(v, 6) if isinstance(v, float) else v
        self._f.write(json.dumps(rec) + "\n")
        if self._echo:
            parts = " ".join(f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                             for k, v in rec.items() if k != "wall_time")
            print(f"[levelgan] {parts}", flush=True)
        return rec

    def close(self):
        self._f.close()
