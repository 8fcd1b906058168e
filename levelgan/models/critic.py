"""Critic / Discriminator (Flax linen) — conv downsampling mirror of G.

Reference equivalent: torch ``Discriminator(nn.Module)`` (SURVEY.md R3).
One module serves both roles: raw score output; vanilla GAN treats it as a
logit (BCE), WGAN-GP as a critic value.  GroupNorm (never BatchNorm) so the
WGAN gradient penalty stays per-sample valid, skipped on the first layer per
standard WGAN-GP practice.  Conditioning (``cond_mode``): 'concat' broadcasts
the condition embedding as extra input channels (reference-shaped);
'projection' adds <W_p emb(c), sum_hw phi(x)> at the head (Miyato & Koyama
2018, arXiv:1802.05637) — same information path, no extra trunk channels.
"""

from __future__ import annotations

import numpy as np
import flax.linen as nn
import jax.numpy as jnp

from levelgan.config import ModelConfig
from levelgan.ops.blocks import group_norm, leaky_relu


class Critic(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, cond=None, mbstd_scale=None):
        """x [B,H,W,n_tiles] (one-hot or soft), cond [B,cond_dim] -> [B] score.

        ``mbstd_scale`` (round 5, train.mbstd_anneal_*): optional scalar
        multiplier on the minibatch-stddev channel (input or trunk mode) —
        1.0/None leaves it intact, 0.0 silences it; the fine-tune
        scheduler fades it so the excess-presence phase can move
        structural placement without re-triggering the mbstd critic's
        high-wdist response (BASELINE.md round-4 presence conclusion).
        """
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        x = x.astype(dtype)
        n = int(np.log2(cfg.level_size // 4))
        if 4 * 2 ** n != cfg.level_size:
            # same validation as generator_stages: silently flooring n would
            # build a mismatched downsampling trunk for e.g. level_size=48
            raise ValueError(f"level_size must be 4*2^k, got {cfg.level_size}")
        chans = [min(cfg.critic_base_channels * 2 ** i, cfg.max_channels)
                 for i in range(n)]

        if cfg.critic_mbstd == "input":
            # spatial minibatch stddev: per-POSITION across-batch stddev
            # (mean over tile channels) as an input channel — position is
            # intact here, so cross-sample placement collapse ("START on
            # the same cells in every fake") is directly visible, unlike
            # the trunk-end scalar which pools position away (measured
            # negative, BASELINE.md round 3)
            y32 = x.astype(jnp.float32)
            mbmap = jnp.sqrt(y32.var(axis=0) + 1e-8).mean(-1)  # [H, W]
            if mbstd_scale is not None:
                mbmap = mbmap * mbstd_scale
            x = jnp.concatenate(
                [x, jnp.broadcast_to(mbmap[None, :, :, None].astype(dtype),
                                     x.shape[:3] + (1,))], axis=-1)

        emb = None
        if cfg.cond_dim:
            if cond is None:
                raise ValueError("conditional critic called without cond")
            emb = leaky_relu(nn.Dense(
                cfg.cond_embed_dim, dtype=dtype, param_dtype=jnp.float32,
                kernel_init=nn.initializers.normal(0.02), name="cond_embed")(
                    cond.astype(dtype)), cfg.leaky_slope)
            if cfg.cond_mode == "concat":
                embc = jnp.broadcast_to(emb[:, None, None, :],
                                        x.shape[:3] + (emb.shape[-1],))
                x = jnp.concatenate([x, embc], axis=-1)

        for i, ch in enumerate(chans):
            x = nn.Conv(ch, (4, 4), strides=(2, 2), padding="SAME",
                        dtype=dtype, param_dtype=jnp.float32,
                        kernel_init=nn.initializers.normal(0.02),
                        name=f"down{i}")(x)
            if i > 0 and cfg.norm != "none":
                gamma = self.param(f"scale{i}", nn.initializers.ones,
                                   (ch,), jnp.float32)
                beta = self.param(f"bias{i}", nn.initializers.zeros,
                                  (ch,), jnp.float32)
                x = group_norm(x, gamma, beta, cfg.group_size).astype(dtype)
            x = leaky_relu(x, cfg.leaky_slope)

        phi = x  # final trunk features [B, 4, 4, chans[-1]]
        if cfg.critic_mbstd == "trunk":
            # ProGAN minibatch stddev: one scalar (mean over positions and
            # features of the across-batch stddev) tiled as an extra
            # channel.  Gives the critic a view of BATCH statistics, so
            # cross-sample collapse (e.g. every level placing START on the
            # same cell — measured, BASELINE.md round 3) becomes a feature
            # the real/fake boundary can use.  f32 for the variance; cast
            # back to the trunk dtype.
            y = x.astype(jnp.float32)
            mb = jnp.sqrt(y.var(axis=0) + 1e-8).mean()
            if mbstd_scale is not None:
                mb = mb * mbstd_scale
            x = jnp.concatenate(
                [x, jnp.broadcast_to(mb.astype(dtype),
                                     x.shape[:3] + (1,))], axis=-1)
        x = x.reshape(x.shape[0], -1)
        score = nn.Dense(1, dtype=jnp.float32, param_dtype=jnp.float32,
                         kernel_init=nn.initializers.normal(0.02),
                         name="head")(x.astype(jnp.float32))
        score = score.squeeze(-1)
        if cfg.cond_dim and cfg.cond_mode == "projection":
            # D(x,c) = psi(phi(x)) + <W_p emb(c), sum_hw phi(x)> — one
            # [B,ch] inner product instead of cond_embed_dim extra input
            # channels through the whole trunk (and its GP double-backward)
            pooled = phi.astype(jnp.float32).sum(axis=(1, 2))
            proj = nn.Dense(pooled.shape[-1], dtype=jnp.float32,
                            param_dtype=jnp.float32,
                            kernel_init=nn.initializers.normal(0.02),
                            name="cond_proj")(emb.astype(jnp.float32))
            score = score + jnp.sum(proj * pooled, axis=-1)
        return score
