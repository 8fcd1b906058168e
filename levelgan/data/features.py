"""On-device difficulty / feature-vector extraction for conditioning.

Reference equivalent: the conditional path feeds a difficulty/feature vector
into G (SURVEY.md R10 [NS],[TK-L]).  Here the condition of a *real* level is
computed from the level itself, fully in XLA, inside the train step: fake
samples are conditioned on the real batch's features (standard cGAN pairing),
and at export time users pass explicit feature vectors.

Features (cond_dim=4): [wall fraction, hazard fraction, coin fraction,
normalized start->goal L1 distance] — each in [0, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from levelgan.config import COIN, GOAL, HAZARD, START, WALL

FEATURE_NAMES = ("wall_frac", "hazard_frac", "coin_frac", "goal_dist")
N_FEATURES = 4


def level_features(ids: jax.Array) -> jax.Array:
    """uint8 tile ids [B, H, W] -> features [B, 4], float32, on-device."""
    ids = ids.astype(jnp.int32)
    b, h, w = ids.shape
    area = h * w

    def frac(tile):
        return (ids == tile).sum(axis=(1, 2)).astype(jnp.float32) / area

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def pos_of(tile):
        mask = (ids == tile)
        flat = mask.reshape(b, -1)
        idx = jnp.argmax(flat, axis=-1)  # first occurrence (0 if absent)
        return rows.reshape(-1)[idx], cols.reshape(-1)[idx]

    sr, sc = pos_of(START)
    gr, gc = pos_of(GOAL)
    dist = (jnp.abs(sr - gr) + jnp.abs(sc - gc)).astype(jnp.float32) / (h + w)

    return jnp.stack([frac(WALL), frac(HAZARD), frac(COIN), dist], axis=-1)


def soft_level_features(sample: jax.Array) -> jax.Array:
    """Differentiable twin of :func:`level_features` on a relaxed/ST
    one-hot sample [B, H, W, n_tiles] -> [B, 4].

    Exists for the ``train.w_cond_match`` feature-matching loss: the
    round-3 conditioning-causality eval (tools/eval_cond) measured that
    the adversarial pairing signal alone teaches G to obey only the
    DOMINANT feature (wall_frac r ~1.0) while hazard/coin/goal_dist are
    nearly ignored (slopes 0.003-0.08) — the critic barely discriminates
    the subtle features, so G gets no gradient to track them.  This twin
    gives a direct pathwise path from each requested feature to the
    sample.  Fractions are exact soft expectations.  The start->goal
    distance uses STRAIGHT-THROUGH positions: hard argmax cell forward
    (what the decode actually realizes), probability-weighted mean
    position backward.  The all-soft expectation form was measured to
    mis-train goal_dist (eval_cond_32_cm3.json: mae 0.57 — a diffuse
    channel's mean position sits near the grid center, so matching the
    soft distance inflates channel spread instead of moving the sampled
    cells).  On corpus-shaped one-hot inputs the ST form equals
    level_features exactly."""
    b, h, w, _ = sample.shape
    area = h * w
    sample = sample.astype(jnp.float32)

    def frac(tile):
        return sample[..., tile].sum(axis=(1, 2)) / area

    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    def st_pos(tile):
        p = sample[..., tile]
        z = p.sum(axis=(1, 2)) + 1e-6
        soft_r = (p * rows).sum(axis=(1, 2)) / z
        soft_c = (p * cols).sum(axis=(1, 2)) / z
        idx = jnp.argmax(p.reshape(b, -1), axis=-1)
        hard_r = (idx // w).astype(jnp.float32)
        hard_c = (idx % w).astype(jnp.float32)
        return (hard_r + soft_r - jax.lax.stop_gradient(soft_r),
                hard_c + soft_c - jax.lax.stop_gradient(soft_c))

    sr, sc = st_pos(START)
    gr, gc = st_pos(GOAL)
    dist = (jnp.abs(sr - gr) + jnp.abs(sc - gc)) / (h + w)
    return jnp.stack([frac(WALL), frac(HAZARD), frac(COIN), dist], axis=-1)


def batched_features(feature_fn, data, batch: int = 4096):
    """Apply a jit'd per-batch feature extractor over a whole host corpus.

    One jit program reused across fixed-size batches (the tail batch gets
    its own cached compile); returns a host float array [N, F].  Exists so
    every corpus-mean consumer (gates, export default cond, cond-match
    scale) shares one full-corpus, bounded-device-memory code path instead
    of each slicing its own prefix (advisor r4 items 1-3).
    """
    import numpy as np

    feat = jax.jit(feature_fn)
    out = [np.asarray(feat(data[i:i + batch]))
           for i in range(0, len(data), batch)]
    return np.concatenate(out, axis=0)


def corpus_mean_cond(cfg, ds):
    """FULL-corpus mean feature vector — the default export/gate condition.

    The one operating point every conditional gate and the export default
    share ("corpus-like levels at a corpus-like request" — BASELINE.md
    round-4 identity-gate correction).  Family-branched: tile corpora use
    :func:`level_features` over ``ds.levels``, track corpora use
    ``track/ops.track_features`` over ``ds.tracks`` (advisor r4: the
    tile-only form crashed on conditional track checkpoints).
    """
    import numpy as np

    if cfg.model.family == "track":
        from levelgan.track.ops import track_features
        feats = batched_features(track_features, np.asarray(ds.tracks))
    else:
        feats = batched_features(level_features, np.asarray(ds.levels))
    return feats.mean(axis=0)
