"""DCGAN-style tile-level Generator (Flax linen).

Reference equivalent: torch ``Generator(nn.Module)`` — latent z (+ optional
condition) -> Linear -> reshape 4x4 -> [ConvTranspose -> norm -> act] x k ->
tile-channel logits (SURVEY.md R2/§3.5 [NS]).

TPU-first design:
  - NHWC, bf16 activations / f32 params.
  - Each upsample stage is a single composite op (ConvTranspose 4x4 s2 +
    GroupNorm + LeakyReLU) dispatched to either the XLA fallback
    (``ops.blocks.upsample_block_xla``) or the fused Pallas kernel K1
    (``kernels.upsample_block``) via ``cfg.use_pallas``.
  - Conditioning (config 4): the condition vector is embedded, concatenated
    to z, AND modulates each stage's output per-channel (FiLM).  NOTE: the
    FiLM affine is applied POST-activation (after the block's LeakyReLU),
    so it is NOT algebraically foldable into the fused kernel's
    pre-activation GroupNorm affine — XLA fuses it as an elementwise
    epilogue instead.
  - Output is raw logits [B, H, W, n_tiles]; sampling (softmax / Gumbel-ST /
    argmax) is applied by ``models.heads.sample_head`` so train/export paths
    choose their estimator explicitly.
"""

from __future__ import annotations

import numpy as np
import flax.linen as nn

import jax
import jax.numpy as jnp

from levelgan.config import ModelConfig
from levelgan.ops.blocks import leaky_relu, upsample_block_xla, group_norm

def generator_stages(cfg: ModelConfig) -> list[int]:
    """Per-stage output channels, 4x4 seed -> level_size. 16->2, 32->3, 64->4."""
    n = int(np.log2(cfg.level_size // 4))
    if 4 * 2 ** n != cfg.level_size:
        raise ValueError(f"level_size must be 4*2^k, got {cfg.level_size}")
    # widest at low res, halving upward: e.g. 64x64 -> [512, 256, 128, 64]
    return [min(cfg.base_channels * 2 ** (n - 1 - i), cfg.max_channels)
            for i in range(n)]

class UpsampleStage(nn.Module):
    """ConvTranspose(4x4,s2) + GroupNorm + LeakyReLU as one op, with an
    optional post-activation FiLM modulation of the stage output."""
    out_ch: int
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, film=None):
        c_in = x.shape[-1]
        w = self.param("kernel", nn.initializers.normal(0.02),
                       (4, 4, c_in, self.out_ch), jnp.float32)
        gamma = self.param("scale", nn.initializers.ones, (self.out_ch,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (self.out_ch,), jnp.float32)
        dtype = jnp.dtype(self.cfg.dtype)
        if self.cfg.use_pallas:
            from levelgan.kernels.upsample_block import upsample_block_pallas
            block, scope = upsample_block_pallas, "K1_upsample_pallas"
        else:
            block, scope = upsample_block_xla, "K1_upsample_xla"
        # named_scope -> XLA op metadata -> visible as a range in profiler
        # traces (SURVEY.md §5.1)
        with jax.named_scope(scope):
            y = block(x, w, gamma, beta, slope=self.cfg.leaky_slope,
                      group_size=self.cfg.group_size, compute_dtype=dtype)
        if film is not None:
            # FiLM: per-sample, per-channel modulation of the stage output.
            # Zero-init => identity at init; elementwise, fused by XLA into
            # the block epilogue.
            g_mod, b_mod = jnp.split(nn.Dense(
                2 * self.out_ch, dtype=dtype, param_dtype=jnp.float32,
                kernel_init=nn.initializers.zeros, name="film")(film), 2, axis=-1)
            y = y * (1.0 + g_mod[:, None, None, :]) + b_mod[:, None, None, :]
        return y.astype(dtype)

class Generator(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, z, cond=None):
        """z [B, latent_dim] (+ cond [B, cond_dim]) -> logits [B,H,W,n_tiles]."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        chans = generator_stages(cfg)

        film = None
        if cfg.cond_dim:
            if cond is None:
                raise ValueError("conditional generator called without cond")
            film = leaky_relu(nn.Dense(
                cfg.cond_embed_dim, dtype=dtype, param_dtype=jnp.float32,
                kernel_init=nn.initializers.normal(0.02), name="cond_embed")(
                    cond.astype(dtype)), cfg.leaky_slope)
            z = jnp.concatenate([z, film], axis=-1)

        x = nn.Dense(4 * 4 * chans[0], dtype=dtype, param_dtype=jnp.float32,
                     kernel_init=nn.initializers.normal(0.02), name="seed")(
                         z.astype(dtype))
        x = x.reshape(x.shape[0], 4, 4, chans[0])
        gamma0 = self.param("seed_scale", nn.initializers.ones, (chans[0],), jnp.float32)
        beta0 = self.param("seed_bias", nn.initializers.zeros, (chans[0],), jnp.float32)
        x = leaky_relu(group_norm(x, gamma0, beta0, cfg.group_size),
                       cfg.leaky_slope).astype(dtype)

        out_chans = chans[1:] + [max(cfg.base_channels // 2, cfg.n_tiles * 2)]
        for i, oc in enumerate(out_chans):
            x = UpsampleStage(oc, cfg, name=f"up{i}")(x, film)

        logits = nn.Conv(cfg.n_tiles, (3, 3), padding="SAME", dtype=dtype,
                         param_dtype=jnp.float32,
                         kernel_init=nn.initializers.normal(0.02),
                         name="to_tiles")(x)
        return logits.astype(jnp.float32)
