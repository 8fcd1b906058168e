"""On-device track transforms: symmetry augmentation + curvature histogram.

Track-family twins of the tile family's D4 augmentation and tile histogram.
A closed track's symmetries: cyclic start-point shift (roll the segment
sequence) and mirroring (reverse the sequence and negate curvature) — both
preserve the curvature-magnitude distribution and drivability, like D4
preserves tile histograms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from levelgan.track.data import KAPPA_MAX


def track_augment(key: jax.Array, tracks: jax.Array) -> jax.Array:
    """Random per-sample cyclic shift + mirror. tracks [B, T, 2]."""
    b, t, _ = tracks.shape
    k_shift, k_flip = jax.random.split(key)
    shifts = jax.random.randint(k_shift, (b,), 0, t)
    flips = jax.random.bernoulli(k_flip, 0.5, (b,))

    def one(tr, shift, flip):
        tr = jnp.roll(tr, shift, axis=0)
        mirrored = jnp.flip(tr, axis=0).at[:, 0].multiply(-1.0)
        return jnp.where(flip, mirrored, tr)

    return jax.vmap(one)(tracks, shifts, flips)


def curvature_hist_device(tracks: jax.Array, n_bins: int) -> jax.Array:
    """On-device curvature-bin counts [n_bins] (matches
    track.data.curvature_histogram's binning)."""
    kappa = tracks[..., 0].reshape(-1)
    edges = jnp.linspace(-KAPPA_MAX, KAPPA_MAX, n_bins - 1)
    idx = jnp.searchsorted(edges, kappa, side="right")  # == np.digitize
    return jax.nn.one_hot(idx, n_bins, dtype=jnp.float32).sum(axis=0)


def track_features(tracks: jax.Array) -> jax.Array:
    """Conditioning features [B, 4] from tracks [B, T, 2] — the track-family
    twin of data.features.level_features (SURVEY.md N6).

    Invariant under track_augment's symmetry group (cyclic shift; mirror =
    reversal + curvature negation): all terms use |kappa| / even statistics
    or order-insensitive aggregates.  Each feature is normalized to O(1).
    """
    from levelgan.track.data import WIDTH_MAX, WIDTH_MIN

    kappa = tracks[..., 0].astype(jnp.float32)
    width = tracks[..., 1].astype(jnp.float32)
    mean_abs_k = jnp.abs(kappa).mean(-1) / KAPPA_MAX
    rms_k = jnp.sqrt((kappa * kappa).mean(-1)) / KAPPA_MAX
    mean_w = (width.mean(-1) - WIDTH_MIN) / (WIDTH_MAX - WIDTH_MIN)
    # fraction of sign changes between consecutive segments (cyclic)
    sgn = jnp.sign(kappa)
    flips = (sgn * jnp.roll(sgn, 1, axis=-1) < 0).astype(jnp.float32)
    return jnp.stack([mean_abs_k, rms_k, mean_w, flips.mean(-1)], axis=-1)


def closure_project(tracks: jax.Array, iters: int = 2) -> jax.Array:
    """Exact heading closure by decode-time projection (track ``--repair``).

    The track-family twin of the tile family's ops/repair.py: instead of
    shaping the training objective (``train.w_closure`` — measured to
    distort the curvature distribution the identity gate checks, see
    BASELINE.md), fix the constraint at decode.  Each track's curvature is
    shifted so ``sum_t kappa == +-2*pi`` (toward the loop orientation the
    track already leans, ``sign(sum kappa)``; zero-sum tracks close
    positively).  The correction is distributed across segments in
    proportion to each segment's remaining headroom to ``+-KAPPA_MAX`` in
    the needed direction — one pass is then exact whenever the residual
    fits inside the total headroom (increment_t = resid * room_t / sum
    room <= room_t), and the per-segment bound is preserved by
    construction, so ``kappa_violation_frac`` stays 0.  Width untouched.
    Typical corrections are tiny (mean closure error ~0.8 rad over 32
    segments = ~4% of KAPPA_MAX per segment), so the curvature marginals
    the identity gate measures move negligibly.  tracks: [B, T, 2].
    """
    kappa = tracks[..., 0].astype(jnp.float32)
    target = jnp.where(kappa.sum(-1) >= 0, 1.0, -1.0) * (2.0 * jnp.pi)
    for _ in range(iters):  # 2nd pass mops up any clipped residual
        resid = target - kappa.sum(-1)                       # [B]
        room = jnp.where(resid[:, None] >= 0,
                         KAPPA_MAX - kappa, kappa + KAPPA_MAX)
        kappa = kappa + resid[:, None] * room / jnp.maximum(
            room.sum(-1, keepdims=True), 1e-6)
        kappa = jnp.clip(kappa, -KAPPA_MAX, KAPPA_MAX)
    return jnp.stack([kappa, tracks[..., 1]], axis=-1).astype(tracks.dtype)


def closure_penalty(tracks: jax.Array) -> jax.Array:
    """Mean squared heading-closure error over a batch (``train.w_closure``).

    A closed circuit turns by exactly +-2*pi, i.e. with unit segment length
    ``|sum_t kappa| == 2*pi`` — the corpus invariant (track/data.py builds
    tracks by normalizing heading turns to one full loop), and exactly the
    statistic the quality eval gates on (track/quality.py closure_error).
    The penalty ``mean_b (|sum_t kappa_b| - 2*pi)^2`` is zero on every
    corpus track and differentiable pathwise through the generator's
    tanh-bounded curvature channel (no score-function estimator needed),
    so it re-injects loop closure without touching the curvature
    *distribution* the identity gate measures.  Invariant under
    track_augment (cyclic shift preserves the sum; mirror negates it and
    |.| absorbs the sign).  tracks: [B, T, 2], channel 0 = curvature.
    """
    turn = jnp.abs(tracks[..., 0].astype(jnp.float32).sum(-1))
    return jnp.square(turn - 2.0 * jnp.pi).mean()
