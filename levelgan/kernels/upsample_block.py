"""Pallas TPU kernel K1: fused ConvTranspose(4x4,s2) + GroupNorm + LeakyReLU.

Reference equivalent: the torch ``ConvTranspose2d -> BatchNorm2d -> ReLU``
chain — 3 kernel launches + 2 HBM round-trips per generator stage
(SURVEY.md K1 [NS]).  Here ONE kernel per stage computes the transposed
conv (zero-insertion-free parity decomposition, mapping derived + verified
in ops.blocks.conv_transpose_2x_parity; PAPERS.md arXiv 2502.20493), the
per-sample GroupNorm on the conv result while it is still in VMEM, and the
LeakyReLU epilogue.

SPATIAL-MAJOR layout (round-2 redesign).  Kernel activations are
``[H, W, B, C]``: the tiled (sublane, lane) dims are (batch, channels) and
both spatial dims are untiled outer dims.  The round-1 batch-major kernel
emitted 4 separate parity buffers precisely because Mosaic cannot slice or
concat at unaligned minor-dim offsets — and the trace-level profile
(artifacts/profile_wgan_gp_32_pallas.*) showed XLA then spent ~0.4 ms/step
re-interleaving them (pure layout copies) while the per-(parity, tap)
matmuls ran ~16x under MXU capacity at the narrow stages.  Spatial-major
fixes both structurally:

  - parity split / merge are OUTER-dim reshapes + indexing (free vreg
    addressing, no relayout) — the kernel emits the final interleaved
    [2H, 2W, B, C] directly, so the XLA-side copies vanish;
  - every conv tap is a unit-offset OUTER slice of the zero-padded input,
    so taps can be regrouped freely into MXU-shaped contractions.

Lane-packed contraction plan (``_plan``): output parities are concatenated
along the matmul N (lane) dim so each contraction fills >=128 lanes even at
the narrow co=32/64 stages:

  co >= 128 : 16 per-(parity, tap) matmuls  [N, Ci] x [Ci, Co]   (1.0x FLOPs)
  co ==  64 : 12 row-parity matmuls         [N, Ci] x [Ci, 2Co]  (1.5x FLOPs)
  co <=  32 :  9 shift matmuls              [N, Ci] x [Ci, 4Co]  (2.25x FLOPs)

using the identity (for parity (a, b), taps (r, s) in {0,1}^2, xp = pad(x)):

    y[2i+a, 2j+b] = sum_{r,s} xp[i+a+r, j+b+s] @ w[a+2r, b+2s]

so the shifted slice xp[u:u+H, v:v+W] contributes to parity (a, b) iff
u-a and v-b are in {0,1}, with weight w[2u-a, 2v-b].  The packed weight
matrices (structured zeros for the invalid (shift, parity) pairs) are
assembled once per call in XLA (``_pack_weights``); the extra FLOPs at the
narrow stages buy full MXU lanes, a strict win on the measured shapes.

Backward (SURVEY.md:133 — "hand-written backward, itself a strided conv"):
``jax.custom_vjp`` whose bwd is a second fused Pallas kernel.  Residuals
saved by fwd: the merged pre-norm conv output ``ypre`` (compute dtype) and
the per-channel GroupNorm stats (mu_c, rstd_c) — NO forward
rematerialization.  The bwd kernel fuses, per batch tile:

  LeakyReLU bwd -> GroupNorm bwd (rstd * (dxhat - mean_g(dxhat)
  - xn * mean_g(dxhat * xn)), group means via membership matmuls)
  -> the transposed-conv INPUT gradient dx as 16 per-tap MXU matmuls in
  gather form:

      dx[u, v] = sum_{(a,b),r,s} dyp_(a,b)[u+2-a-r, v+2-b-s] @ w[a+2r, b+2s]^T

  (dyp = parity-split of the GN-bwd cotangent, zero-padded by 1; the exact
  transpose of the forward mapping, parity-tested against jax.vjp of the
  XLA twin in tests/test_kernels.py.)  It also emits dgamma/dbeta
  (accumulated across batch-tile grid programs) and the merged pre-norm
  cotangent ``dy`` from which the weight gradient
  dw[a+2r, b+2s] = xp_tap^T @ dy_(a,b) is formed by XLA per-tap matmuls
  outside the kernel (dense contractions XLA runs at MXU roofline; a
  [4,4,Ci,Co] f32 VMEM accumulator would crowd the fused working set).

Oracle: ``ops.blocks.upsample_block_xla`` (the permanent correctness
reference, SURVEY.md §7.3/N19) — parity-tested fwd and bwd on CPU
(interpret) and on the real chip (tests_tpu/).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024   # of the 16 MB scoped-vmem hard limit
_PARITIES = ((0, 0), (0, 1), (1, 0), (1, 1))


def _sublane_pad(n: int, itemsize: int = 4) -> int:
    """Sublane (second-to-last dim) rounds up to the native tile: 8
    sublanes of 32 bits, i.e. 8 for f32 and 16 for packed bf16."""
    t = 8 * (4 // itemsize)
    return max(t, -(-n // t) * t)


def _lane_pad(n: int) -> int:
    """Lane (last dim) rounds up to 128 in VMEM tiles."""
    return -(-n // 128) * 128


def _blk(h: int, w: int, bt: int, c: int, itemsize: int) -> int:
    """VMEM bytes of one spatial-major [h, w, bt, c] block after tiling."""
    return h * w * _sublane_pad(bt, itemsize) * _lane_pad(c) * itemsize


def _legal_tiles(b: int):
    """Batch tiles Mosaic will accept, largest first.

    A block's sublane dim must be divisible by 8 OR equal the full array
    dim (the lowering rule the round-2 on-chip tier hit at bt<8): that is
    every multiple-of-8 power-of-two divisor of b, plus b itself."""
    tiles = [bt for bt in (b >> k for k in range(b.bit_length()))
             if b % bt == 0 and bt % 8 == 0]
    if b not in tiles:
        tiles.insert(0, b)
    return tiles


def _pick_batch_tile(b: int, usage_fn):
    """Largest legal batch tile whose working set fits VMEM, else None."""
    for bt in _legal_tiles(b):
        if usage_fn(bt) <= _VMEM_BUDGET:
            return bt
    return None


def _membership(co: int, groups: int):
    """[Co, G] one-hot: channel c belongs to group c // (co // groups)."""
    gs = co // groups
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (co, groups), 0)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (co, groups), 1)
    return ((c_ids // gs) == g_ids).astype(jnp.float32)


# --------------------------------------------------------------------------
# lane-packing plan + weight packing
# --------------------------------------------------------------------------

def _plan(co: int):
    """Group output parities into lane-concatenated accumulators.

    Returns a tuple of groups; each group is (parities, shifts) with
    ``parities`` the output parities whose columns are concatenated in that
    accumulator and ``shifts`` the (u, v) offsets into the padded input that
    feed it.  Smallest packing whose lane width reaches 128 (FLOPs overhead
    only where it buys MXU lanes)."""
    if co >= 128:        # per-(parity, tap): 16 matmuls, minimal FLOPs
        return tuple(
            (((a, b),), tuple((a + r, b + s) for r in (0, 1) for s in (0, 1)))
            for a, b in _PARITIES)
    if co >= 64:         # pack column parity b: 12 matmuls at 2Co lanes
        return tuple(
            (((a, 0), (a, 1)),
             tuple((a + r, v) for r in (0, 1) for v in (0, 1, 2)))
            for a in (0, 1))
    # pack both parities: 9 matmuls at 4Co lanes
    return ((_PARITIES,
             tuple((u, v) for u in (0, 1, 2) for v in (0, 1, 2))),)


def _mm_index(plan):
    """Static (group, u, v) list, one entry per packed matmul."""
    return tuple((g, u, v) for g, (_pars, shifts) in enumerate(plan)
                 for (u, v) in shifts)


def _pack_weights(w, plan, cdt):
    """w [4,4,Ci,Co] -> stacked packed matrices [n_mm, Ci, L*Co] (XLA-side).

    Column group (a, b) of the matrix for shift (u, v) is w[2u-a, 2v-b]
    when 0 <= u-a <= 1 and 0 <= v-b <= 1, else zeros — the forward tap
    identity in the module docstring."""
    ci, co = w.shape[2], w.shape[3]
    wc = w.astype(cdt)
    zero = jnp.zeros((ci, co), cdt)
    mats = []
    for pars, shifts in plan:
        for u, v in shifts:
            cols = [wc[2 * u - a, 2 * v - b]
                    if 0 <= u - a <= 1 and 0 <= v - b <= 1 else zero
                    for (a, b) in pars]
            mats.append(cols[0] if len(cols) == 1
                        else jnp.concatenate(cols, axis=1))
    return jnp.stack(mats, axis=0)


def _merge(ys):
    """{parity: [h, w, bt, c]} -> [2h, 2w, bt, c] (outer stack + reshape)."""
    rows = [jnp.stack([ys[(a, 0)], ys[(a, 1)]], axis=2) for a in (0, 1)]
    y = jnp.stack(rows, axis=1)                  # [h, 2, w, 2, bt, c]
    h, _, w, _, bt, c = y.shape
    return y.reshape(2 * h, 2 * w, bt, c)


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------

def _fwd_kernel(x_ref, wpk_ref, gamma_ref, beta_ref, *out_refs,
                h, w, ci, co, groups, slope, eps, out_dtype, plan,
                residuals):
    bt = x_ref.shape[2]
    n = h * w * bt
    gs = co // groups

    xp = jnp.pad(x_ref[:], ((1, 1), (1, 1), (0, 0), (0, 0)))

    # --- packed MXU contractions (see module docstring) -------------------
    accs = [None] * len(plan)
    for k, (g, u, v) in enumerate(_mm_index(plan)):
        tap = xp[u:u + h, v:v + w].reshape(n, ci)
        part = jax.lax.dot_general(
            tap, wpk_ref[k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        accs[g] = part if accs[g] is None else accs[g] + part

    # lane-unpack each accumulator back into per-parity f32 planes
    ys = {}
    for g, (pars, _shifts) in enumerate(plan):
        for j, p in enumerate(pars):
            ys[p] = jax.lax.slice_in_dim(
                accs[g], j * co, (j + 1) * co, axis=1).reshape(h, w, bt, co)

    # --- per-sample GroupNorm: stats span (spatial x 4 parities x group) --
    member = _membership(co, groups)             # [Co, G]
    s1 = sum(jnp.sum(ys[p], axis=(0, 1)) for p in _PARITIES)   # [Bt, Co]
    s2 = sum(jnp.sum(ys[p] * ys[p], axis=(0, 1)) for p in _PARITIES)
    cnt = 4.0 * gs * h * w
    gmean = jax.lax.dot_general(s1, member, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) / cnt
    gm2 = jax.lax.dot_general(s2, member, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) / cnt
    grstd = jax.lax.rsqrt(gm2 - gmean * gmean + eps)           # [Bt, G]
    mu_c = jax.lax.dot_general(gmean, member.T, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    rstd_c = jax.lax.dot_general(grstd, member.T, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)

    gamma = gamma_ref[:].astype(jnp.float32)     # [1, Co] broadcasts
    beta = beta_ref[:].astype(jnp.float32)
    outs = {}
    for p in _PARITIES:
        yn = (ys[p] - mu_c[None, None]) * rstd_c[None, None]
        yn = yn * gamma + beta
        outs[p] = jnp.where(yn >= 0, yn, slope * yn).astype(out_dtype)
    out_refs[0][:] = _merge(outs)
    if residuals:
        out_refs[1][:] = _merge({p: ys[p].astype(out_dtype)
                                 for p in _PARITIES})
        out_refs[2][:] = mu_c
        out_refs[3][:] = rstd_c


def _fwd_usage(bt, h, w, ci, co, itemsize):
    """Scoped-VMEM estimate for one fwd grid program at batch tile ``bt``.

    Mosaic double-buffers grid-varying in/out blocks (x2); the constant
    packed-weight block is resident once; internal values live once."""
    plan = _plan(co)
    n_mm = len(_mm_index(plan))
    wpk_lanes = _lane_pad(len(plan[0][0]) * co)
    acc_lanes = sum(_lane_pad(len(pars) * co) for pars, _ in plan)
    x = _blk(h, w, bt, ci, itemsize)
    wpk = n_mm * _sublane_pad(ci, itemsize) * wpk_lanes * itemsize
    outs = 2 * _blk(2 * h, 2 * w, bt, co, itemsize) \
        + 2 * _sublane_pad(bt) * _lane_pad(co) * 4
    # values: padded input + the f32 accumulators + per-parity f32 planes
    # (ys, normalized) + the merged cdt staging values
    vals = (_blk(h + 2, w + 2, bt, ci, itemsize)
            + h * w * _sublane_pad(bt) * acc_lanes * 4
            + 6 * _blk(h, w, bt, co, 4)
            + 2 * _blk(2 * h, 2 * w, bt, co, itemsize))
    return 2 * (x + outs) + wpk + vals


def _forward(x, w, gamma, beta, *, slope, group_size, compute_dtype,
             residuals):
    h, ww, b, ci = x.shape
    co = w.shape[-1]
    groups = max(1, co // group_size)
    if co % groups:
        raise ValueError(
            f"channels {co} not divisible into groups of {group_size}")
    cdt = jnp.dtype(compute_dtype)
    plan = _plan(co)
    wpk = _pack_weights(w, plan, cdt)
    bt = _pick_batch_tile(
        b, lambda t: _fwd_usage(t, h, ww, ci, co, cdt.itemsize))
    if bt is None:   # callers gate on pallas_fits; keep the error loud
        raise ValueError(
            f"K1 fwd working set exceeds VMEM at every legal batch tile "
            f"(b={b}, h={h}, ci={ci}, co={co}, {cdt.name})")

    kern = functools.partial(
        _fwd_kernel, h=h, w=ww, ci=ci, co=co, groups=groups, slope=slope,
        eps=1e-5, out_dtype=cdt, plan=plan, residuals=residuals)
    y_spec = pl.BlockSpec((2 * h, 2 * ww, bt, co), lambda i: (0, 0, i, 0),
                          memory_space=pltpu.VMEM)
    y_shape = jax.ShapeDtypeStruct((2 * h, 2 * ww, b, co), cdt)
    stat_spec = pl.BlockSpec((bt, co), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_specs, out_shape = [y_spec], [y_shape]
    if residuals:
        out_specs += [y_spec, stat_spec, stat_spec]
        out_shape += [y_shape,
                      jax.ShapeDtypeStruct((b, co), jnp.float32),
                      jax.ShapeDtypeStruct((b, co), jnp.float32)]
    outs = pl.pallas_call(
        kern,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((h, ww, bt, ci), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wpk.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * wpk.shape[0] * b * h * ww * ci * wpk.shape[-1],
            bytes_accessed=(x.size * cdt.itemsize + wpk.size * cdt.itemsize
                            + (2 if residuals else 1)
                            * 4 * b * h * ww * co * cdt.itemsize),
            transcendentals=0),
        interpret=(jax.default_backend() == "cpu"),
    )(x.astype(cdt), wpk, gamma.astype(jnp.float32)[None, :],
      beta.astype(jnp.float32)[None, :])

    if residuals:
        return outs[0], outs[1], outs[2], outs[3]
    return outs[0]


# --------------------------------------------------------------------------
# backward kernel: fused LeakyReLU bwd + GroupNorm bwd + conv-transpose dx
# --------------------------------------------------------------------------

def _bwd_kernel(w_ref, gamma_ref, beta_ref, mu_ref, rstd_ref, g_ref,
                ypre_ref, dx_ref, dy_ref, dgamma_ref, dbeta_ref, *,
                h, w, ci, co, groups, slope, out_dtype):
    bt = g_ref.shape[2]
    gs = co // groups
    n = h * w * bt

    member = _membership(co, groups)             # [Co, G]
    gamma = gamma_ref[:].astype(jnp.float32)     # [1, Co]
    beta = beta_ref[:].astype(jnp.float32)
    mu_b = mu_ref[:][None, None]                 # [1, 1, Bt, Co]
    rstd_b = rstd_ref[:][None, None]

    # parity views of the merged blocks: outer-dim reshape + index (free)
    g_r = g_ref[:].reshape(h, 2, w, 2, bt, co)
    y_r = ypre_ref[:].reshape(h, 2, w, 2, bt, co)

    def relu_gn_locals(a, b):
        # Recomputed per phase instead of kept live for all 4 parities:
        # the working set stays ~1 parity plane of f32 temporaries (the
        # round-2 scoped-vmem lesson from the real-TPU tier).
        y = y_r[:, a, :, b].astype(jnp.float32)
        xn = (y - mu_b) * rstd_b
        outv = xn * gamma + beta
        gp = g_r[:, a, :, b].astype(jnp.float32)
        dout = jnp.where(outv >= 0, gp, slope * gp)
        return xn, dout

    # --- LeakyReLU bwd + stat sums, per parity ---------------------------
    s1 = jnp.zeros((bt, co), jnp.float32)
    s2 = jnp.zeros((bt, co), jnp.float32)
    for a, b in _PARITIES:
        xn, dout = relu_gn_locals(a, b)
        s1 = s1 + jnp.sum(dout, axis=(0, 1))
        s2 = s2 + jnp.sum(dout * xn, axis=(0, 1))

    # --- affine grads, accumulated across batch-tile grid programs -------
    @pl.when(pl.program_id(0) == 0)
    def _():
        dgamma_ref[:] = jnp.zeros((1, co), jnp.float32)
        dbeta_ref[:] = jnp.zeros((1, co), jnp.float32)
    # batch reduction as a ones-row matmul: a keepdims jnp.sum lands in a
    # sublane-replicated layout Mosaic cannot relayout for the
    # accumulate-store; the MXU contraction lands in a standard layout
    ones_row = jnp.ones((1, bt), jnp.float32)
    dgamma_ref[:] += jax.lax.dot_general(
        ones_row, s2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbeta_ref[:] += jax.lax.dot_general(
        ones_row, s1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # --- GroupNorm bwd means: m = mean_g(dxhat), mean_g(dxhat * xn) -------
    # dxhat = dout * gamma; gamma varies inside a group so it folds into the
    # summed stats before the group reduction.
    cnt = 4.0 * gs * h * w

    def gmean_c(s):
        gm = jax.lax.dot_general(s, member, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) / cnt
        return jax.lax.dot_general(gm, member.T, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    m1c = gmean_c(s1 * gamma)[None, None]        # [1, 1, Bt, Co]
    m2c = gmean_c(s2 * gamma)[None, None]

    # --- GN bwd + conv-transpose dx, one parity at a time -----------------
    # dx[u,v] = sum_{(a,b),r,s} dyp_(a,b)[u+2-a-r, v+2-b-s] @ w[a+2r,b+2s]^T
    acc = None
    dys = {}
    for a, b in _PARITIES:
        xn, dout = relu_gn_locals(a, b)
        dy = rstd_b * (dout * gamma - m1c - xn * m2c)
        dyc = dy.astype(out_dtype)
        dys[(a, b)] = dyc
        dyp = jnp.pad(dyc, ((1, 1), (1, 1), (0, 0), (0, 0)))
        for r in (0, 1):
            for s in (0, 1):
                ro, cofs = 2 - a - r, 2 - b - s
                tap = dyp[ro:ro + h, cofs:cofs + w].reshape(n, co)
                part = jax.lax.dot_general(
                    tap, w_ref[a + 2 * r, b + 2 * s],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)        # [N, Ci]
                acc = part if acc is None else acc + part
    dy_ref[:] = _merge(dys)
    dx_ref[:] = acc.reshape(h, w, bt, ci).astype(out_dtype)


def _bwd_usage(bt, h, w, ci, co, itemsize):
    """Scoped-VMEM estimate for one bwd grid program (same model as fwd)."""
    wgt = 16 * _sublane_pad(ci, itemsize) * _lane_pad(co) * itemsize
    ins = 2 * _blk(2 * h, 2 * w, bt, co, itemsize) \
        + 2 * _sublane_pad(bt) * _lane_pad(co) * 4
    outs = _blk(h, w, bt, ci, itemsize) + _blk(2 * h, 2 * w, bt, co, itemsize)
    # phase-local f32 temporaries (xn/dout/dy of ONE parity), the 4 kept cdt
    # dy parities + merged staging, the padded tap value, and the f32 dx
    # accumulator
    vals = (4 * _blk(h, w, bt, co, 4)
            + 2 * _blk(2 * h, 2 * w, bt, co, itemsize)
            + _blk(h + 2, w + 2, bt, co, itemsize)
            + _blk(h, w, bt, ci, 4))
    return 2 * (ins + outs) + wgt + vals


def _backward(w, gamma, beta, mu_c, rstd_c, g, ypre, *,
              slope, groups, compute_dtype):
    h2, w2, b, co = g.shape
    h, ww = h2 // 2, w2 // 2
    ci = w.shape[2]
    cdt = jnp.dtype(compute_dtype)
    bt = _pick_batch_tile(
        b, lambda t: _bwd_usage(t, h, ww, ci, co, cdt.itemsize))
    if bt is None:
        raise ValueError(
            f"K1 bwd working set exceeds VMEM at every legal batch tile "
            f"(b={b}, h={h}, ci={ci}, co={co}, {cdt.name})")

    kern = functools.partial(
        _bwd_kernel, h=h, w=ww, ci=ci, co=co, groups=groups, slope=slope,
        out_dtype=cdt)
    y_spec = pl.BlockSpec((h2, w2, bt, co), lambda i: (0, 0, i, 0),
                          memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((bt, co), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    aff_spec = pl.BlockSpec((1, co), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((4, 4, ci, co), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            aff_spec, aff_spec, stat_spec, stat_spec, y_spec, y_spec,
        ],
        out_specs=[
            pl.BlockSpec((h, ww, bt, ci), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            y_spec, aff_spec, aff_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, ww, b, ci), cdt),
            jax.ShapeDtypeStruct((h2, w2, b, co), cdt),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=32 * b * h * ww * ci * co,
            bytes_accessed=(9 * b * h * ww * co * cdt.itemsize
                            + b * h * ww * ci * cdt.itemsize
                            + w.size * cdt.itemsize),
            transcendentals=0),
        interpret=(jax.default_backend() == "cpu"),
    )(w.astype(cdt), gamma.astype(jnp.float32)[None, :],
      beta.astype(jnp.float32)[None, :], mu_c, rstd_c, g, ypre)
    dx, dy, dgamma, dbeta = outs
    return dx, dy, dgamma[0], dbeta[0]


def _weight_grad(x, dy, *, compute_dtype):
    """dw[a+2r, b+2s] = xp_tap^T @ dy_(a,b): 16 dense XLA matmuls at MXU
    roofline (kept outside the Pallas bwd: a [4,4,Ci,Co] f32 accumulator
    would crowd the fused working set at the widest stage)."""
    h, ww, b, ci = x.shape
    co = dy.shape[-1]
    cdt = jnp.dtype(compute_dtype)
    xp = jnp.pad(x.astype(cdt), ((1, 1), (1, 1), (0, 0), (0, 0)))
    n = b * h * ww
    dy_r = dy.reshape(h, 2, ww, 2, b, co)
    rows = {}
    for a, bb in _PARITIES:
        dyp = dy_r[:, a, :, bb].reshape(n, co)
        for r in (0, 1):
            for s in (0, 1):
                tap = xp[a + r:a + r + h, bb + s:bb + s + ww].reshape(n, ci)
                rows[(a + 2 * r, bb + 2 * s)] = jax.lax.dot_general(
                    tap, dyp, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)        # [Ci, Co]
    return jnp.stack([jnp.stack([rows[(kh, kw)] for kw in range(4)], axis=0)
                      for kh in range(4)], axis=0)             # [4,4,Ci,Co]


@functools.lru_cache(maxsize=None)
def _make_op(slope: float, group_size: int, dtype_name: str):
    compute_dtype = jnp.dtype(dtype_name)

    @jax.custom_vjp
    def op(x, w, gamma, beta):
        return _forward(x, w, gamma, beta, slope=slope,
                        group_size=group_size, compute_dtype=compute_dtype,
                        residuals=False)

    def fwd(x, w, gamma, beta):
        y, ypre, mu_c, rstd_c = _forward(
            x, w, gamma, beta, slope=slope, group_size=group_size,
            compute_dtype=compute_dtype, residuals=True)
        return y, (x, w, gamma, beta, ypre, mu_c, rstd_c)

    def bwd(res, g):
        x, w, gamma, beta, ypre, mu_c, rstd_c = res
        co = w.shape[-1]
        groups = max(1, co // group_size)
        dx, dy, dgamma, dbeta = _backward(
            w, gamma, beta, mu_c, rstd_c, g.astype(compute_dtype), ypre,
            slope=slope, groups=groups, compute_dtype=compute_dtype)
        dw = _weight_grad(x, dy, compute_dtype=compute_dtype)
        return (dx.astype(x.dtype), dw.astype(w.dtype),
                dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype))

    op.defvjp(fwd, bwd)
    return op


def pallas_fits(b, h, w_sp, ci, co, compute_dtype) -> bool:
    """Whether the fused fwd AND bwd kernels fit scoped VMEM at some LEGAL
    batch tile for this shape — the same decision ``_forward``/``_backward``
    make, so the gate and the dispatch can never disagree."""
    itemsize = jnp.dtype(compute_dtype).itemsize
    return (
        _pick_batch_tile(
            b, lambda t: _fwd_usage(t, h, w_sp, ci, co, itemsize)) is not None
        and _pick_batch_tile(
            b, lambda t: _bwd_usage(t, h, w_sp, ci, co, itemsize)) is not None)


def upsample_block_sm(x, w, gamma, beta, *, slope: float = 0.2,
                      group_size: int = 16, compute_dtype=jnp.bfloat16):
    """Spatial-major fused stage: x [H, W, B, Ci] -> [2H, 2W, B, Co].

    This is the layout the Pallas generator trunk runs in end-to-end
    (models/generator.py); ``upsample_block_pallas`` is the batch-major
    compatibility wrapper.  Dispatch: the monolithic-spatial kernel for
    shapes whose whole sample fits VMEM (wide early stages — fully fused
    GN, zero HBM round-trips), the row-tiled folded-emit kernel
    (kernels.upsample_rows) for the large-spatial narrow-channel late
    stages, and the XLA twin as the guarantee-run for anything else."""
    h, ww, b, ci = x.shape
    co = w.shape[-1]
    if pallas_fits(b, h, ww, ci, co, compute_dtype):
        op = _make_op(float(slope), int(group_size),
                      jnp.dtype(compute_dtype).name)
        return op(x, w, gamma, beta)
    from levelgan.kernels.upsample_rows import rows_fits, upsample_block_rows_sm
    if rows_fits(b, h, ww, ci, co, compute_dtype):
        return upsample_block_rows_sm(
            x, w, gamma, beta, slope=slope, group_size=group_size,
            compute_dtype=compute_dtype)
    from levelgan.ops.blocks import upsample_block_xla
    y = upsample_block_xla(
        jnp.transpose(x, (2, 0, 1, 3)), w, gamma, beta, slope=slope,
        group_size=group_size, compute_dtype=compute_dtype)
    return jnp.transpose(y, (1, 2, 0, 3))


def upsample_block_pallas(x, w, gamma, beta, *, slope: float = 0.2,
                          group_size: int = 16,
                          compute_dtype=jnp.bfloat16):
    """Drop-in twin of ``ops.blocks.upsample_block_xla`` (same signature,
    batch-major [B, H, W, C] in/out) around the spatial-major kernel."""
    y = upsample_block_sm(
        jnp.transpose(x, (1, 2, 0, 3)), w, gamma, beta, slope=slope,
        group_size=group_size, compute_dtype=compute_dtype)
    return jnp.transpose(y, (2, 0, 1, 3))
