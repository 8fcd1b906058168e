"""On-device D4 (dihedral) augmentation for square tile grids.

Reference equivalent: host NumPy flip/rotate (SURVEY.md R6 [NS]).  Here each
sample draws a uniform element of the D4 symmetry group (8 elements: 4
rotations x optional horizontal flip) and applies it with static-shape XLA
ops under ``vmap`` — no host round-trip, no dynamic shapes, so the whole
thing fuses into the surrounding train-step program.

Works on both id grids [..., H, W] and one-hot tensors [..., H, W, C]
(spatial axes are identified positionally from the right).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def d4_apply(x: jax.Array, element: jax.Array, spatial_offset: int = 0) -> jax.Array:
    """Apply D4 group element ``element`` in [0, 8) to one sample.

    element % 4   -> number of 90-degree rotations
    element // 4  -> horizontal flip first (yes/no)

    ``spatial_offset`` counts trailing non-spatial axes (0 for [H, W],
    1 for [H, W, C]).  H must equal W (square grids only).
    """
    h_axis = x.ndim - 2 - spatial_offset
    w_axis = x.ndim - 1 - spatial_offset
    if x.shape[h_axis] != x.shape[w_axis]:
        raise ValueError(f"d4_apply needs square grids, got {x.shape}")

    flipped = jnp.flip(x, axis=w_axis)
    base = jax.lax.select_n(element // 4, x, flipped)
    rots = [base]
    for _ in range(3):
        rots.append(jnp.rot90(rots[-1], k=1, axes=(h_axis, w_axis)))
    return jax.lax.select_n(element % 4, *rots)


def augment(key: jax.Array, batch: jax.Array, spatial_offset: int = 0) -> jax.Array:
    """Random independent D4 transform per sample in ``batch`` [B, ...]."""
    elems = jax.random.randint(key, (batch.shape[0],), 0, 8)
    return jax.vmap(d4_apply, in_axes=(0, 0, None))(batch, elems, spatial_offset)
