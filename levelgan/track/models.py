"""Track-family models: recurrent segment emitter + 1-D conv critic.

Reference equivalent: the race-track experiment's recurrent segment-emitter
generator and its discriminator (SURVEY.md R2 [TK-M]).  TPU-native: the
emitter is a GRU unrolled with ``flax.linen.scan`` (compiles to one fused
lax.scan, no Python loop); the critic is a strided 1-D conv stack — both
bf16 activations / f32 params like the tile family.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from levelgan.config import ModelConfig
from levelgan.ops.blocks import group_norm, leaky_relu
from levelgan.track.data import KAPPA_MAX, WIDTH_MAX, WIDTH_MIN


def normalize_tracks(tracks: jax.Array) -> jax.Array:
    """(kappa, width) -> roughly [-1, 1] channels for the critic."""
    kappa = tracks[..., 0] / KAPPA_MAX
    width = (tracks[..., 1] - WIDTH_MIN) / (WIDTH_MAX - WIDTH_MIN) * 2.0 - 1.0
    return jnp.stack([kappa, width], axis=-1)


class TrackGenerator(nn.Module):
    """z [B, latent] (+cond) -> tracks [B, n_segments, 2] = (kappa, width).

    GRU decoder: hidden state initialized from z, inputs are learned
    per-step position embeddings (non-autoregressive recurrent decoder —
    every step's emission is differentiable and the whole unroll is one
    lax.scan).  Outputs squashed into the corpus's physical ranges.
    """
    cfg: ModelConfig

    @nn.compact
    def __call__(self, z, cond=None):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        if cfg.cond_dim:
            if cond is None:
                raise ValueError("conditional track generator needs cond")
            emb = leaky_relu(nn.Dense(
                cfg.cond_embed_dim, dtype=dtype, param_dtype=jnp.float32,
                name="cond_embed")(cond.astype(dtype)), cfg.leaky_slope)
            z = jnp.concatenate([z, emb], axis=-1)

        b = z.shape[0]
        h0 = nn.tanh(nn.Dense(cfg.rnn_hidden, dtype=dtype,
                              param_dtype=jnp.float32, name="init")(
                                  z.astype(dtype)))
        pos = self.param("pos_emb", nn.initializers.normal(0.02),
                         (cfg.n_segments, 32), jnp.float32)
        inputs = jnp.broadcast_to(pos.astype(dtype)[None],
                                  (b, cfg.n_segments, 32))

        ScanGRU = nn.scan(
            nn.GRUCell, variable_broadcast="params",
            split_rngs={"params": False}, in_axes=1, out_axes=1)
        _, hs = ScanGRU(features=cfg.rnn_hidden, dtype=dtype,
                        param_dtype=jnp.float32, name="gru")(h0, inputs)

        raw = nn.Dense(2, dtype=jnp.float32, param_dtype=jnp.float32,
                       kernel_init=nn.initializers.normal(0.02),
                       name="emit")(hs.astype(jnp.float32))
        kappa = KAPPA_MAX * jnp.tanh(raw[..., 0])
        width = WIDTH_MIN + (WIDTH_MAX - WIDTH_MIN) * \
            jax.nn.sigmoid(raw[..., 1])
        out = jnp.stack([kappa, width], axis=-1)
        if cfg.closure_in_model:
            # round-4 knob: exact heading-closure projection INSIDE the
            # forward (differentiable — arithmetic + clip), so the critic
            # and curriculum train on the closed-loop distribution the
            # export path ships (track/ops.closure_project; raw-emitter
            # closure_ok is 0.29-0.43 without it, BASELINE.md).  Export's
            # default repair re-projection is then an exact no-op.
            from levelgan.track.ops import closure_project
            out = closure_project(out)
        return out


class TrackCritic(nn.Module):
    """tracks [B, T, 2] -> [B] score (1-D conv mirror, GroupNorm)."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, tracks, cond=None):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        x = normalize_tracks(tracks).astype(dtype)
        if cfg.cond_dim:
            if cond is None:
                raise ValueError("conditional track critic needs cond")
            emb = leaky_relu(nn.Dense(
                cfg.cond_embed_dim, dtype=dtype, param_dtype=jnp.float32,
                name="cond_embed")(cond.astype(dtype)), cfg.leaky_slope)
            emb = jnp.broadcast_to(emb[:, None, :],
                                   x.shape[:2] + (emb.shape[-1],))
            x = jnp.concatenate([x, emb], axis=-1)

        ch, t = cfg.critic_base_channels, cfg.n_segments
        i = 0
        while t > 4:
            x = nn.Conv(min(ch, cfg.max_channels), (5,), strides=(2,),
                        padding="SAME", dtype=dtype, param_dtype=jnp.float32,
                        kernel_init=nn.initializers.normal(0.02),
                        name=f"down{i}")(x)
            if i > 0 and cfg.norm != "none":
                gamma = self.param(f"scale{i}", nn.initializers.ones,
                                   (x.shape[-1],), jnp.float32)
                beta = self.param(f"bias{i}", nn.initializers.zeros,
                                  (x.shape[-1],), jnp.float32)
                x = _group_norm_1d(x, gamma, beta, cfg.group_size)
            x = leaky_relu(x, cfg.leaky_slope).astype(dtype)
            t = -(-t // 2)
            ch *= 2
            i += 1
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(1, dtype=jnp.float32, param_dtype=jnp.float32,
                        name="head")(x.astype(jnp.float32)).squeeze(-1)


def _group_norm_1d(x, gamma, beta, group_size):
    """GroupNorm over [B, T, C] (blocks.group_norm expects [..,H,W,C])."""
    return group_norm(x[:, None], gamma, beta, group_size)[:, 0]
