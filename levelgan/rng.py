"""PRNG key construction honoring ``train.prng_impl``.

Every key the framework creates goes through :func:`key` so one config
field selects the PRNG implementation end to end (state init, the
device-feed index stream, sampling heads, export). 'threefry2x32' is the
default for its layout-invariant streams (the DP bit-match guarantee);
'rbg' is the measured-faster TPU option (BASELINE.md round-2 notes).
Reference equivalent: none — the reference (SURVEY.md R15) uses torch's
global seed; explicit impl-tagged keys are the JAX-native replacement.
"""

from __future__ import annotations

import jax

from levelgan.config import Config


def key(cfg: Config, seed: int | None = None) -> jax.Array:
    """A typed PRNG key with the config's impl; defaults to train.seed."""
    return jax.random.key(cfg.train.seed if seed is None else seed,
                          impl=cfg.train.prng_impl)
