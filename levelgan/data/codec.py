"""On-device tile codec: uint8 tile-id grids <-> one-hot float tensors.

Reference equivalent: host-side NumPy encode/decode (SURVEY.md R6 [NS]).
Here both directions are pure XLA so they live *inside* the jit-compiled train
step — the host only ever touches raw uint8 tile ids (BASELINE.json north_star:
"moves from host NumPy to on-device XLA transforms").

Layout is NHWC (batch, height, width, tile-channel) — the TPU-native layout:
the tile channel is the minor (lane) dimension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def encode(ids: jax.Array, n_tiles: int, dtype=jnp.float32) -> jax.Array:
    """uint8/int tile ids [..., H, W] -> one-hot [..., H, W, n_tiles]."""
    return jax.nn.one_hot(ids, n_tiles, dtype=dtype)


def decode(onehot: jax.Array) -> jax.Array:
    """one-hot / logits / soft samples [..., H, W, C] -> uint8 ids [..., H, W].

    Works for hard one-hot, soft (e.g. Gumbel-softmax) samples, and raw
    logits alike: the decoded tile is the argmax over the channel axis.
    Runs on-device; call *before* any host transfer (BASELINE.md protocol).
    """
    return jnp.argmax(onehot, axis=-1).astype(jnp.uint8)
