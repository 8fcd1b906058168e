"""Pallas TPU kernel K1L: row-tiled fused ConvTranspose(4x4,s2) stage for
the LATE (large-spatial, narrow-channel) generator stages.

Reference equivalent: the same torch ``ConvTranspose2d -> norm -> act``
chain as kernels/upsample_block.py (SURVEY.md K1 [NS]); this variant covers
the shapes whose monolithic-spatial working set cannot fit VMEM at any
Mosaic-legal batch tile (gumbel_64 stages 3-4: 16x16x128 -> 32x32x64 ->
64x64x32).

Why these stages need their own kernel: the round-2 microbench
(tools/bench_kernels, K=2000 chained) shows XLA's transposed conv runs at
~31-62 TF/s effective on them vs ~125-133 TF/s on the wide early stages —
at co=32 a [N, Ci] x [Ci, 32] contraction fills 32/128 MXU lanes.  The fix
is structural:

  FOLDED (parity-in-channels) EMIT.  The stage output y [2H, 2W, B, Co] is
  stored as yf [H, W, B, 4Co]: channel block p = 2a+b holds output parity
  (a, b), i.e. yf is precisely the lane-packed accumulator of the
  contraction plan — the kernel writes its matmul accumulator verbatim.

  - every contraction is [N, Ci] x [Ci, 4Co]: >=128 output lanes even at
    co=32 (vs 32 unpacked), using the tap identity (upsample_block.py
    docstring): 9 unit shifts (u, v) in {0,1,2}^2 of the zero-padded input
    against packed weights with structured zeros for invalid
    (shift, parity) pairs — 2.25x raw MACs at co=32 (9*4/16), 4x the MXU
    lane utilisation, a measured net win;
  - no parity merge/interleave in the kernel at all.  The depth-to-space
    unfold to [2H, 2W, B, Co] happens in XLA FUSED WITH the GroupNorm
    normalize + LeakyReLU epilogue (one elementwise+transpose HBM pass) —
    normalize commutes with the unfold because GN params are per-Co-channel
    and parity planes share them.

  ROW-TILED GRID.  grid = (B/bt, H/rt); each program computes rt output-
  fold rows of one batch tile.  The conv halo (input rows k*rt .. k*rt+rt+1
  of the zero-padded input) is assembled from three BlockSpecs onto the
  same padded array — an rt-row body plus two single-row specs whose
  block-unit index IS an element row index — so no manual DMA and no
  overlapping-block tricks are needed.  Per-sample GroupNorm statistics
  are accumulated across a sample's row programs into [B, Co] partial-sum
  outputs (the TPU grid is sequential, and the stats block index is
  constant along the row axis, so accumulate-into-output is exact).

Backward: the same structure transposed.  The LeakyReLU+GroupNorm backward
is a single fused XLA elementwise pass in FOLDED layout (producing the
pre-norm cotangent dyf [H, W, B, 4Co] + dgamma/dbeta), then the input
gradient is a second row-tiled Pallas kernel: 9 unit shifts of the padded
dyf against [4Co, Ci] packed transposed weights — K = 4Co >= 128 lanes of
contraction depth.  dw stays in XLA as 16 dense per-tap matmuls (K = N,
MXU roofline), consuming dyf's channel planes directly.

Oracle: ops.blocks.upsample_block_xla, parity-tested on CPU (interpret)
and on-chip (tests_tpu/).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from levelgan.kernels.upsample_block import (
    _PARITIES, _blk, _lane_pad, _membership, _sublane_pad)

_VMEM_BUDGET = 12 * 1024 * 1024
_SHIFTS = tuple((u, v) for u in (0, 1, 2) for v in (0, 1, 2))


def _plane(a: int, b: int) -> int:
    """Folded channel block of output parity (a, b)."""
    return 2 * a + b


def _pack_w_fwd(w, cdt):
    """w [4,4,Ci,Co] -> [9, Ci, 4Co]: matrix for shift (u, v) has column
    block _plane(a, b) = w[2u-a, 2v-b] when u-a and v-b are in {0,1}."""
    ci, co = w.shape[2], w.shape[3]
    wc = w.astype(cdt)
    zero = jnp.zeros((ci, co), cdt)
    mats = []
    for u, v in _SHIFTS:
        cols = [wc[2 * u - a, 2 * v - b]
                if 0 <= u - a <= 1 and 0 <= v - b <= 1 else zero
                for (a, b) in _PARITIES]
        mats.append(jnp.concatenate(cols, axis=1))
    return jnp.stack(mats, axis=0)


def _pack_w_bwd(w, cdt):
    """w [4,4,Ci,Co] -> [9, 4Co, Ci]: dx tap identity
    dx[i,j] = sum_{(a,b),r,s} dyp_(a,b)[i+2-a-r, j+2-b-s] @ w[a+2r,b+2s]^T,
    so the matrix for dyf shift (u, v) has ROW block _plane(a, b) =
    w[a+2(2-u-a), b+2(2-v-b)]^T when both tap indices land in {0,1}."""
    ci, co = w.shape[2], w.shape[3]
    wc = w.astype(cdt)
    zero = jnp.zeros((co, ci), cdt)
    mats = []
    for u, v in _SHIFTS:
        rows = []
        for a, b in _PARITIES:
            r, s = 2 - u - a, 2 - v - b
            rows.append(wc[a + 2 * r, b + 2 * s].T
                        if 0 <= r <= 1 and 0 <= s <= 1 else zero)
        mats.append(jnp.concatenate(rows, axis=0))
    return jnp.stack(mats, axis=0)


def _fold_membership(co: int):
    """[4Co, Co] one-hot folding parity planes onto shared channels."""
    c4 = jax.lax.broadcasted_iota(jnp.int32, (4 * co, co), 0)
    c1 = jax.lax.broadcasted_iota(jnp.int32, (4 * co, co), 1)
    return ((c4 % co) == c1).astype(jnp.float32)


def unfold(yf):
    """Depth-to-space: [H, W, B, 4Co] folded -> [2H, 2W, B, Co] merged."""
    h, w, b, c4 = yf.shape
    co = c4 // 4
    y = yf.reshape(h, w, b, 2, 2, co)
    return jnp.transpose(y, (0, 3, 1, 4, 2, 5)).reshape(2 * h, 2 * w, b, co)


def fold(y):
    """Space-to-depth: [2H, 2W, B, Co] merged -> [H, W, B, 4Co] folded."""
    h2, w2, b, co = y.shape
    y = y.reshape(h2 // 2, 2, w2 // 2, 2, b, co)
    return jnp.transpose(y, (0, 2, 4, 1, 3, 5)).reshape(
        h2 // 2, w2 // 2, b, 4 * co)


# --------------------------------------------------------------------------
# tile selection
# --------------------------------------------------------------------------

def _legal_bt(b: int):
    tiles = [bt for bt in (b >> k for k in range(b.bit_length()))
             if b % bt == 0 and bt % 8 == 0]
    if b not in tiles:
        tiles.insert(0, b)
    return tiles


def _pick_tiles(b: int, h: int, usage_fn):
    """(bt, rt) preferring the LARGEST row tile first, then the largest
    batch tile that fits beside it: the two halo rows are re-read once per
    row program, so input-read amplification is (rt + 2) / rt — rt
    dominates efficiency, batch splitting is nearly free."""
    rt = h
    while rt >= 1:
        for bt in _legal_bt(b):
            if usage_fn(bt, rt) <= _VMEM_BUDGET:
                return bt, rt
        rt //= 2
    return None, None


def _fwd_usage(bt, rt, w, ci, co, itemsize):
    body = _blk(rt, w + 2, bt, ci, itemsize)
    halo = 2 * _blk(1, w + 2, bt, ci, itemsize)
    wpk = 9 * _sublane_pad(ci, itemsize) * _lane_pad(4 * co) * itemsize
    out = _blk(rt, w, bt, 4 * co, itemsize)
    stats = 2 * _sublane_pad(bt) * _lane_pad(co) * 4
    # values: concat'd halo block, the f32 accumulator, cast output
    vals = (_blk(rt + 2, w + 2, bt, ci, itemsize)
            + _blk(rt, w, bt, 4 * co, 4)
            + _blk(rt, w, bt, 4 * co, itemsize))
    return 2 * (body + halo + out + stats) + wpk + vals


def _bwd_usage(bt, rt, w, ci, co, itemsize):
    body = _blk(rt, w + 2, bt, 4 * co, itemsize)
    halo = 2 * _blk(1, w + 2, bt, 4 * co, itemsize)
    wpk = 9 * _sublane_pad(4 * co, itemsize) * _lane_pad(ci) * itemsize
    out = _blk(rt, w, bt, ci, itemsize)
    vals = (_blk(rt + 2, w + 2, bt, 4 * co, itemsize)
            + _blk(rt, w, bt, ci, 4)
            + _blk(rt, w, bt, ci, itemsize))
    return 2 * (body + halo + out) + wpk + vals


def rows_fits(b, h, w_sp, ci, co, compute_dtype) -> bool:
    """Whether the row-tiled fwd AND bwd kernels fit at some legal tile."""
    itemsize = jnp.dtype(compute_dtype).itemsize
    fwd = _pick_tiles(b, h, lambda bt, rt: _fwd_usage(
        bt, rt, w_sp, ci, co, itemsize))
    bwd = _pick_tiles(b, h, lambda bt, rt: _bwd_usage(
        bt, rt, w_sp, ci, co, itemsize))
    return fwd[0] is not None and bwd[0] is not None


# --------------------------------------------------------------------------
# forward: conv -> folded emit + channel-sum stats
# --------------------------------------------------------------------------

def _fwd_kernel(body_ref, h1_ref, h2_ref, wpk_ref, yf_ref, s1_ref, s2_ref,
                *, rt, w, ci, co, out_dtype):
    bt = body_ref.shape[2]
    n = rt * w * bt

    xs = jnp.concatenate([body_ref[:], h1_ref[:], h2_ref[:]], axis=0)

    acc = None
    for k, (u, v) in enumerate(_SHIFTS):
        tap = xs[u:u + rt, v:v + w].reshape(n, ci)
        part = jax.lax.dot_general(
            tap, wpk_ref[k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part

    yf_ref[:] = acc.reshape(rt, w, bt, 4 * co).astype(out_dtype)

    # per-sample channel sums, folded planes collapsed onto shared channels
    # via a [4Co, Co] membership matmul; accumulated across row programs
    fm = _fold_membership(co)
    a3 = acc.reshape(rt * w, bt, 4 * co)
    s1 = jax.lax.dot_general(jnp.sum(a3, axis=0), fm,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s2 = jax.lax.dot_general(jnp.sum(a3 * a3, axis=0), fm,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(1) == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)
    s1_ref[:] += s1
    s2_ref[:] += s2


def _conv_fwd(xp, wpk, *, co, compute_dtype):
    """xp [H+2, W+2, B, Ci] zero-padded -> (yf [H, W, B, 4Co], s1, s2)."""
    hp, wp, b, ci = xp.shape
    h, w = hp - 2, wp - 2
    cdt = jnp.dtype(compute_dtype)
    bt, rt = _pick_tiles(b, h, lambda bt_, rt_: _fwd_usage(
        bt_, rt_, w, ci, co, cdt.itemsize))
    if bt is None:
        raise ValueError(
            f"K1L fwd exceeds VMEM at every legal tile (b={b}, h={h}, "
            f"ci={ci}, co={co}, {cdt.name})")
    nr = h // rt

    kern = functools.partial(_fwd_kernel, rt=rt, w=w, ci=ci, co=co,
                             out_dtype=cdt)
    row = lambda f: pl.BlockSpec(
        (1, wp, bt, ci), lambda i, k: (f(k), 0, i, 0),
        memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((bt, co), lambda i, k: (i, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(b // bt, nr),
        in_specs=[
            pl.BlockSpec((rt, wp, bt, ci),
                         lambda i, k: (k, 0, i, 0), memory_space=pltpu.VMEM),
            row(lambda k: k * rt + rt),
            row(lambda k: k * rt + rt + 1),
            pl.BlockSpec(wpk.shape, lambda i, k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rt, w, bt, 4 * co), lambda i, k: (k, 0, i, 0),
                         memory_space=pltpu.VMEM),
            stat_spec, stat_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, w, b, 4 * co), cdt),
            jax.ShapeDtypeStruct((b, co), jnp.float32),
            jax.ShapeDtypeStruct((b, co), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * b * h * w * ci * 4 * co,
            bytes_accessed=(xp.size + wpk.size + 4 * b * h * w * co)
            * cdt.itemsize,
            transcendentals=0),
        interpret=(jax.default_backend() == "cpu"),
    )(xp, xp, xp, wpk)   # body + two halo-row views of the same array


# --------------------------------------------------------------------------
# backward dx: 9 shifts of padded dyf against transposed packed weights
# --------------------------------------------------------------------------

def _bwd_kernel(body_ref, h1_ref, h2_ref, wpk_ref, dx_ref, *,
                rt, w, ci, co, out_dtype):
    bt = body_ref.shape[2]
    n = rt * w * bt

    ds = jnp.concatenate([body_ref[:], h1_ref[:], h2_ref[:]], axis=0)

    acc = None
    for k, (u, v) in enumerate(_SHIFTS):
        tap = ds[u:u + rt, v:v + w].reshape(n, 4 * co)
        part = jax.lax.dot_general(
            tap, wpk_ref[k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    dx_ref[:] = acc.reshape(rt, w, bt, ci).astype(out_dtype)


def _conv_bwd(dyfp, wpk_t, *, ci, compute_dtype):
    """dyfp [H+2, W+2, B, 4Co] zero-padded folded cotangent -> dx."""
    hp, wp, b, c4 = dyfp.shape
    h, w = hp - 2, wp - 2
    co = c4 // 4
    cdt = jnp.dtype(compute_dtype)
    bt, rt = _pick_tiles(b, h, lambda bt_, rt_: _bwd_usage(
        bt_, rt_, w, ci, co, cdt.itemsize))
    if bt is None:
        raise ValueError(
            f"K1L bwd exceeds VMEM at every legal tile (b={b}, h={h}, "
            f"ci={ci}, co={co}, {cdt.name})")
    nr = h // rt

    kern = functools.partial(_bwd_kernel, rt=rt, w=w, ci=ci, co=co,
                             out_dtype=cdt)
    row = lambda f: pl.BlockSpec(
        (1, wp, bt, c4), lambda i, k: (f(k), 0, i, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(b // bt, nr),
        in_specs=[
            pl.BlockSpec((rt, wp, bt, c4), lambda i, k: (k, 0, i, 0),
                         memory_space=pltpu.VMEM),
            row(lambda k: k * rt + rt),
            row(lambda k: k * rt + rt + 1),
            pl.BlockSpec(wpk_t.shape, lambda i, k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rt, w, bt, ci), lambda i, k: (k, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((h, w, b, ci), cdt)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * b * h * w * 4 * co * ci,
            bytes_accessed=(dyfp.size + wpk_t.size + b * h * w * ci)
            * cdt.itemsize,
            transcendentals=0),
        interpret=(jax.default_backend() == "cpu"),
    )(dyfp, dyfp, dyfp, wpk_t)[0]


# --------------------------------------------------------------------------
# the fused stage op: Pallas conv + XLA folded GN/act (+ its exact vjp)
# --------------------------------------------------------------------------

def _gn_stats(s1, s2, co, groups, eps):
    """Per-channel (mu, rstd) from per-channel sums over 4*H*W positions."""
    member = _membership(co, groups)          # [Co, G]
    gsum1 = s1 @ member                       # [B, G]
    gsum2 = s2 @ member
    return gsum1, gsum2, member


def _forward_rows(x, w, gamma, beta, *, slope, group_size, compute_dtype):
    h, ww, b, ci = x.shape
    co = w.shape[-1]
    groups = max(1, co // group_size)
    if co % groups:
        raise ValueError(
            f"channels {co} not divisible into groups of {group_size}")
    cdt = jnp.dtype(compute_dtype)
    eps = 1e-5

    xp = jnp.pad(x.astype(cdt), ((1, 1), (1, 1), (0, 0), (0, 0)))
    with jax.named_scope("K1L_conv_fwd"):
        yf, s1, s2 = _conv_fwd(xp, _pack_w_fwd(w, cdt), co=co,
                               compute_dtype=cdt)

    cnt = 4.0 * (co // groups) * h * ww
    gsum1, gsum2, member = _gn_stats(s1, s2, co, groups, eps)
    gmean = gsum1 / cnt
    grstd = jax.lax.rsqrt(gsum2 / cnt - gmean * gmean + eps)
    mu_c = gmean @ member.T                    # [B, Co]
    rstd_c = grstd @ member.T

    # normalize + affine + act in FOLDED layout, then unfold: XLA fuses the
    # elementwise epilogue into the depth-to-space transpose (one HBM pass)
    def finish(yf):
        gm = jnp.tile(gamma.astype(jnp.float32), 4)
        bt_ = jnp.tile(beta.astype(jnp.float32), 4)
        mu4 = jnp.tile(mu_c, (1, 4))[None, None]
        rs4 = jnp.tile(rstd_c, (1, 4))[None, None]
        yn = (yf.astype(jnp.float32) - mu4) * rs4 * gm + bt_
        y = jnp.where(yn >= 0, yn, slope * yn).astype(cdt)
        return unfold(y)

    with jax.named_scope("K1L_gn_act_unfold"):
        y = finish(yf)
    return y, yf, mu_c, rstd_c


def _weight_grad_folded(x, dyf, *, compute_dtype):
    """dw from 9 shifted-tap matmuls against the FULL folded cotangent.

    Naive per-(tap, parity) dw matmuls are [N, Ci]^T @ [N, Co]: at co=32
    the MXU runs 32/128 output lanes.  Contracting each of the 9 unit
    shifts against all 4Co folded planes at once ([N, Ci]^T @ [N, 4Co])
    fills the lanes; dw[2u-a, 2v-b] is then column block _plane(a, b) of
    shift (u, v) — each of the 16 taps is produced by exactly one valid
    (shift, parity) pair, the remaining blocks are discarded (2.25x MACs
    for 4x lane utilisation, same trade as the forward)."""
    h, ww, b, ci = x.shape
    co = dyf.shape[-1] // 4
    cdt = jnp.dtype(compute_dtype)
    xp = jnp.pad(x.astype(cdt), ((1, 1), (1, 1), (0, 0), (0, 0)))
    n = h * ww * b
    dyn = dyf.reshape(n, 4 * co)
    rows = {}
    for u, v in _SHIFTS:
        tap = xp[u:u + h, v:v + ww].reshape(n, ci)
        m = jax.lax.dot_general(tap, dyn, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        for a, bb in _PARITIES:
            if 0 <= u - a <= 1 and 0 <= v - bb <= 1:
                p = _plane(a, bb)
                rows[(2 * u - a, 2 * v - bb)] = m[:, p * co:(p + 1) * co]
    return jnp.stack([jnp.stack([rows[(kh, kw)] for kw in range(4)], axis=0)
                      for kh in range(4)], axis=0)


@functools.lru_cache(maxsize=None)
def _make_rows_op(slope: float, group_size: int, dtype_name: str):
    compute_dtype = jnp.dtype(dtype_name)

    @jax.custom_vjp
    def op(x, w, gamma, beta):
        y, _, _, _ = _forward_rows(
            x, w, gamma, beta, slope=slope, group_size=group_size,
            compute_dtype=compute_dtype)
        return y

    def fwd(x, w, gamma, beta):
        y, yf, mu_c, rstd_c = _forward_rows(
            x, w, gamma, beta, slope=slope, group_size=group_size,
            compute_dtype=compute_dtype)
        return y, (x, w, gamma, beta, yf, mu_c, rstd_c)

    def bwd(res, g):
        x, w, gamma, beta, yf, mu_c, rstd_c = res
        h, ww, b, ci = x.shape
        co = w.shape[-1]
        groups = max(1, co // group_size)
        gs = co // groups
        cdt = compute_dtype

        # ---- LeakyReLU + GroupNorm backward, folded, one XLA pass -------
        with jax.named_scope("K1L_gn_act_bwd"):
            gf = fold(g.astype(jnp.float32))              # [H, W, B, 4Co]
            gm = jnp.tile(gamma.astype(jnp.float32), 4)
            bt_ = jnp.tile(beta.astype(jnp.float32), 4)
            mu4 = jnp.tile(mu_c, (1, 4))[None, None]
            rs4 = jnp.tile(rstd_c, (1, 4))[None, None]
            xn = (yf.astype(jnp.float32) - mu4) * rs4
            outv = xn * gm + bt_
            dout = jnp.where(outv >= 0, gf, slope * gf)

            member = _membership(co, groups)
            cnt = 4.0 * gs * h * ww
            # per-channel sums with folded planes collapsed, as pure
            # reductions (XLA fuses the elementwise producers into the
            # reduce; a fold-membership matmul would materialize them)
            d5 = dout.reshape(h, ww, b, 4, co)
            x5 = xn.reshape(h, ww, b, 4, co)
            s1 = d5.sum(axis=(0, 1, 3))                   # [B, Co]
            s2 = (d5 * x5).sum(axis=(0, 1, 3))
            m1 = (((s1 * gamma) @ member) / cnt) @ member.T
            m2 = (((s2 * gamma) @ member) / cnt) @ member.T
            dyf = (rs4 * (dout * gm - jnp.tile(m1, (1, 4))[None, None]
                          - xn * jnp.tile(m2, (1, 4))[None, None]))
            dgamma = s2.sum(axis=0)
            dbeta = s1.sum(axis=0)
            dyf_c = dyf.astype(cdt)

        # ---- dx: row-tiled Pallas conv over the padded folded cotangent -
        with jax.named_scope("K1L_conv_bwd"):
            dyfp = jnp.pad(dyf_c, ((1, 1), (1, 1), (0, 0), (0, 0)))
            dx = _conv_bwd(dyfp, _pack_w_bwd(w, cdt), ci=ci,
                           compute_dtype=cdt)

        # ---- dw: dense XLA per-tap matmuls ------------------------------
        with jax.named_scope("K1L_dw"):
            dw = _weight_grad_folded(x, dyf_c, compute_dtype=cdt)

        return (dx.astype(x.dtype), dw.astype(w.dtype),
                dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype))

    op.defvjp(fwd, bwd)
    return op


def upsample_block_rows_sm(x, w, gamma, beta, *, slope: float = 0.2,
                           group_size: int = 16,
                           compute_dtype=jnp.bfloat16):
    """Row-tiled fused stage, spatial-major [H, W, B, Ci] -> [2H, 2W, B, Co].

    Same contract as kernels.upsample_block.upsample_block_sm; intended
    for shapes where the monolithic-spatial kernel cannot fit VMEM.
    Callers gate on ``rows_fits``."""
    op = _make_rows_op(float(slope), int(group_size),
                       jnp.dtype(compute_dtype).name)
    return op(x, w, gamma, beta)
