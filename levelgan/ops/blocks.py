"""Functional neural-net blocks: pure-XLA reference implementations.

These are the "XLA twin" implementations (SURVEY.md N19) of the Pallas
kernels in ``levelgan.kernels`` — same signatures, explicit parameters —
used as (a) the correctness oracle for kernel parity tests, (b) the CPU
fallback, and (c) the default compute path until the Pallas kernels are
enabled via ``ModelConfig.use_pallas``.

Reference equivalent: ``nn.ConvTranspose2d -> BatchNorm2d -> ReLU`` chains
inside the torch Generator (SURVEY.md R2/K1).  TPU-first deltas: NHWC layout,
bf16 matmul inputs with f32 accumulation, and stateless GroupNorm instead of
BatchNorm (fusable per-sample in VMEM; no running-stats mutable state to
thread through jit / the DP mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def leaky_relu(x, slope: float = 0.2):
    return jnp.where(x >= 0, x, slope * x)


def group_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array,
               group_size: int = 16, eps: float = 1e-5) -> jax.Array:
    """Per-sample GroupNorm over [..., H, W, C]; stats in f32."""
    c = x.shape[-1]
    groups = max(1, c // group_size)
    if c % groups:
        raise ValueError(f"channels {c} not divisible into groups of {group_size}")
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    shape = x.shape[:-1] + (groups, c // groups)
    xg = xf.reshape(shape)
    # reduce over spatial dims + within-group channels; keep batch + group
    red = tuple(i for i in range(1, xg.ndim) if i != xg.ndim - 2)
    mean = xg.mean(axis=red, keepdims=True)
    var = xg.var(axis=red, keepdims=True)
    xn = (xg - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(x.shape)
    out = xn * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return out.astype(orig_dtype)


def conv_transpose_2x(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
                      compute_dtype=jnp.bfloat16) -> jax.Array:
    """Stride-2 transposed conv, kernel 4x4, SAME: [B,H,W,Ci] -> [B,2H,2W,Co].

    w layout HWIO: [4, 4, Ci, Co].  bf16 inputs; the MXU accumulates bf16
    convs in f32 internally (XLA default), so no explicit
    preferred_element_type — it would force an f32 cotangent into the bf16
    transpose-conv VJP and trip a dtype mismatch.
    """
    out = jax.lax.conv_transpose(
        x.astype(compute_dtype), w.astype(compute_dtype),
        strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def upsample_block_xla(x: jax.Array, w: jax.Array, gamma: jax.Array,
                       beta: jax.Array, *, slope: float = 0.2,
                       group_size: int = 16,
                       compute_dtype=jnp.bfloat16) -> jax.Array:
    """Fused-op reference: ConvTranspose(4x4, s2, SAME) -> GroupNorm -> LeakyReLU.

    This exact composite is what Pallas kernel K1
    (levelgan.kernels.upsample_block) must match to tolerance, forward and
    backward (SURVEY.md §4.2 unit-kernel tier).
    """
    y = conv_transpose_2x(x, w, compute_dtype=compute_dtype)
    y = group_norm(y, gamma, beta, group_size=group_size)
    y = leaky_relu(y, slope)
    return y.astype(compute_dtype)
