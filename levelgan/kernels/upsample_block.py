"""Pallas TPU kernel K1: fused ConvTranspose(4x4,s2) + GroupNorm + LeakyReLU.

Reference equivalent: the torch ``ConvTranspose2d -> BatchNorm2d -> ReLU``
chain — 3 kernel launches + 2 HBM round-trips per generator stage
(SURVEY.md K1 [NS]).  Here ONE kernel per stage computes:

  - the transposed conv via the zero-insertion-free kernel-segregated parity
    decomposition (mapping derived + verified in
    ops.blocks.conv_transpose_2x_parity; PAPERS.md arXiv 2502.20493):
    4 dense MXU contractions [Bt*H*W, 4Ci] x [4Ci, Co], one per output
    parity — no multiplies against inserted zeros (a naive lhs-dilated conv
    wastes ~4x MXU work at stride 2);
  - per-sample GroupNorm on the conv result while it is still in VMEM.
    Stats are computed with small group-membership matmuls (channel->group
    one-hot) instead of reshapes — Mosaic rejects minor-dim shape casts,
    and the matmul form stays on the MXU.  GroupNorm (not BatchNorm) was
    chosen exactly so the fused stats need no cross-program reduction;
  - LeakyReLU epilogue.

The kernel emits parity-blocked channels [B, H, W, 4*Co] (parity-major);
the final spatial interleave to [B, 2H, 2W, Co] is pure data movement done
by XLA outside the kernel (fused into the consumer's layout change).
GroupNorm/LeakyReLU commute with the interleave because both are
per-channel/elementwise and the stats span the whole sample either way.

Backward: ``jax.custom_vjp`` whose bwd re-materializes through the pure-XLA
twin ``ops.blocks.upsample_block_xla`` (the permanent correctness oracle,
SURVEY.md §7.3/N19) — exact gradients, zero extra residual memory.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from levelgan.ops.blocks import upsample_block_xla

_VMEM_BUDGET = 10 * 1024 * 1024
_PARITIES = ((0, 0), (0, 1), (1, 0), (1, 1))


def _pick_batch_tile(b: int, h: int, w: int, ci: int, co: int,
                     bytes_per_el: int) -> int:
    """Largest power-of-two divisor of b whose working set fits VMEM."""
    def usage(bt):
        xp = bt * (h + 2) * (w + 2) * ci * bytes_per_el
        taps = bt * h * w * 4 * ci * bytes_per_el
        out = bt * h * w * 4 * co * 4            # f32 accumulators
        return xp + taps + 3 * out
    bt = b
    while bt > 1 and (b % bt or usage(bt) > _VMEM_BUDGET):
        bt //= 2
    return max(bt, 1)


def _kernel(xp_ref, w_ref, gamma_ref, beta_ref, out_ref, *,
            h, w, ci, co, groups, slope, eps, out_dtype):
    bt = xp_ref.shape[0]
    c4 = 4 * co

    # --- parity contractions on the MXU, accumulated per tap -------------
    # (per-tap matmuls: Mosaic cannot concat/reshape offset-misaligned
    # slices, so each shifted tap contracts separately and accumulates
    # in f32 registers; same total FLOPs as the fused-K form)
    blocks = []
    for a, b in _PARITIES:
        acc = None
        for r in (0, 1):
            for s in (0, 1):
                tap = xp_ref[:, a + r:a + r + h, b + s:b + s + w, :]
                part = jax.lax.dot_general(
                    tap.reshape(bt * h * w, ci), w_ref[a + 2 * r, b + 2 * s],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
        blocks.append(acc)
    y = jnp.concatenate(blocks, axis=-1).reshape(bt, h, w, c4)

    # --- per-sample GroupNorm: stats via group-membership matmuls --------
    # channel d = parity*co + c belongs to group (d % co) // gs
    gs = co // groups
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (c4, groups), 0)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (c4, groups), 1)
    member = ((d_ids % co) // gs == g_ids).astype(jnp.float32)  # [4Co, G]

    s1 = y.mean(axis=(1, 2))                    # [Bt, 4Co]
    s2 = (y * y).mean(axis=(1, 2))
    cnt = 4.0 * gs
    gmean = jax.lax.dot_general(s1, member, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) / cnt
    gm2 = jax.lax.dot_general(s2, member, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) / cnt
    gvar = gm2 - gmean * gmean
    # broadcast group stats back to channels: [Bt,G] @ [G,4Co]
    mu = jax.lax.dot_general(gmean, member.T, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    rstd = jax.lax.dot_general(jax.lax.rsqrt(gvar + eps), member.T,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    yn = (y - mu[:, None, None, :]) * rstd[:, None, None, :]
    yn = yn * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)

    # --- LeakyReLU epilogue ---------------------------------------------
    out_ref[:] = jnp.where(yn >= 0, yn, slope * yn).astype(out_dtype)


def _forward(x, w, gamma, beta, *, slope, group_size, compute_dtype):
    b, h, ww, ci = x.shape
    co = w.shape[-1]
    groups = max(1, co // group_size)
    if co % groups:
        raise ValueError(f"channels {co} not divisible into groups of {group_size}")
    cdt = jnp.dtype(compute_dtype)
    xp = jnp.pad(x.astype(cdt), ((0, 0), (1, 1), (1, 1), (0, 0)))
    bt = _pick_batch_tile(b, h, ww, ci, co, cdt.itemsize)
    # parity-tiled affine params, [1,1,4Co] (2-D+ shapes for Mosaic)
    gamma4 = jnp.tile(gamma.astype(jnp.float32), 4)[None, None, :]
    beta4 = jnp.tile(beta.astype(jnp.float32), 4)[None, None, :]

    kern = functools.partial(
        _kernel, h=h, w=ww, ci=ci, co=co, groups=groups,
        slope=slope, eps=1e-5, out_dtype=cdt)
    y4 = pl.pallas_call(
        kern,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, h + 2, ww + 2, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 4, ci, co), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4 * co), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4 * co), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, h, ww, 4 * co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, ww, 4 * co), cdt),
        cost_estimate=pl.CostEstimate(
            flops=32 * b * h * ww * ci * co,
            bytes_accessed=(xp.size * cdt.itemsize + w.size * cdt.itemsize
                            + b * 4 * h * ww * co * cdt.itemsize),
            transcendentals=0),
        interpret=(jax.default_backend() == "cpu"),
    )(xp, w.astype(cdt), gamma4, beta4)

    # parity-major channels -> spatial interleave (XLA layout op)
    y = y4.reshape(b, h, ww, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * h, 2 * ww, co)


@functools.lru_cache(maxsize=None)
def _make_op(slope: float, group_size: int, dtype_name: str):
    compute_dtype = jnp.dtype(dtype_name)

    @jax.custom_vjp
    def op(x, w, gamma, beta):
        return _forward(x, w, gamma, beta, slope=slope,
                        group_size=group_size, compute_dtype=compute_dtype)

    def fwd(x, w, gamma, beta):
        return op(x, w, gamma, beta), (x, w, gamma, beta)

    def bwd(res, g):
        x, w, gamma, beta = res
        # exact gradients via the XLA oracle twin (rematerialized forward)
        _, vjp = jax.vjp(
            lambda x_, w_, g_, b_: upsample_block_xla(
                x_, w_, g_, b_, slope=slope, group_size=group_size,
                compute_dtype=compute_dtype),
            x, w, gamma, beta)
        return vjp(g.astype(compute_dtype))

    op.defvjp(fwd, bwd)
    return op


def upsample_block_pallas(x, w, gamma, beta, *, slope: float = 0.2,
                          group_size: int = 16,
                          compute_dtype=jnp.bfloat16):
    """Drop-in twin of ``ops.blocks.upsample_block_xla`` (same signature)."""
    op = _make_op(float(slope), int(group_size), jnp.dtype(compute_dtype).name)
    return op(x, w, gamma, beta)
