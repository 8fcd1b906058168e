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


def conv_transpose_2x_parity(x: jax.Array, w: jax.Array,
                             compute_dtype=jnp.bfloat16) -> jax.Array:
    """Kernel-segregated transposed conv — zero-insertion-free decomposition.

    Identical result to ``conv_transpose_2x`` but computed as 4 dense
    2x2-tap contractions on the UN-upsampled input (one per output parity),
    then interleaved — no multiplies against inserted zeros (cf. PAPERS.md
    "Unified Kernel-Segregated Transpose Convolution", arXiv 2502.20493).
    Derived mapping (verified numerically against lax.conv_transpose):

        y[2i+a, 2j+b] = sum_{r,s in {0,1}} xp[i+a+r, j+b+s] * w[a+2r, b+2s]

    with xp = x padded by 1 on each spatial side.  This is the math the
    Pallas kernel K1 implements in VMEM.
    """
    b, h, ww, ci = x.shape
    co = w.shape[-1]
    xc = x.astype(compute_dtype)
    wc = w.astype(compute_dtype)
    xp = jnp.pad(xc, ((0, 0), (1, 1), (1, 1), (0, 0)))
    parities = []
    for a in (0, 1):
        row = []
        for bb in (0, 1):
            taps = jnp.concatenate(
                [xp[:, a + r:a + r + h, bb + s:bb + s + ww, :]
                 for r in (0, 1) for s in (0, 1)], axis=-1)  # [B,H,W,4Ci]
            wmat = jnp.concatenate(
                [wc[a + 2 * r, bb + 2 * s] for r in (0, 1) for s in (0, 1)],
                axis=0)  # [4Ci, Co]
            y_ab = jax.lax.dot_general(
                taps.reshape(b * h * ww, 4 * ci), wmat,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            row.append(y_ab.reshape(b, h, ww, co))
        parities.append(row)
    # interleave: [B,H,W,2,2,Co] -> [B,H,2,W,2,Co] -> [B,2H,2W,Co]
    y = jnp.stack([jnp.stack(r, axis=3) for r in parities], axis=3)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * ww, co)
    return y


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
