"""Pallas TPU kernel K1: fused ConvTranspose(4x4,s2) + GroupNorm + LeakyReLU.

Reference equivalent: the torch ``ConvTranspose2d -> BatchNorm2d -> ReLU``
chain — 3 kernel launches + 2 HBM round-trips per generator stage
(SURVEY.md K1 [NS]).  Here ONE kernel per stage computes:

  - the transposed conv via the zero-insertion-free kernel-segregated parity
    decomposition (mapping derived + verified in
    ops.blocks.conv_transpose_2x_parity; PAPERS.md arXiv 2502.20493):
    16 dense MXU contractions [Bt*H*W, Ci] x [Ci, Co], one per
    (parity, tap) — no multiplies against inserted zeros (a naive
    lhs-dilated conv wastes ~4x MXU work at stride 2);
  - per-sample GroupNorm on the conv result while it is still in VMEM.
    Group stats are reduced with small channel->group membership matmuls
    (Mosaic rejects minor-dim shape casts; the matmul form stays on the
    MXU).  GroupNorm (not BatchNorm) was chosen exactly so the fused stats
    need no cross-program reduction;
  - LeakyReLU epilogue.

Wire format: the kernel reads/writes each output PARITY as its own
[B, H, W, Co] array (4 of them) — parity-separate buffers avoid the
unaligned minor-dim slicing a packed [B, H, W, 4Co] layout would force on
the backward's per-parity matmuls.  The final spatial interleave to
[B, 2H, 2W, Co] is pure data movement done by XLA outside the kernel.
GroupNorm/LeakyReLU commute with the interleave because both are
per-channel/elementwise and the stats span the whole sample either way.

Backward (SURVEY.md:133 — "hand-written backward, itself a strided conv"):
``jax.custom_vjp`` whose bwd is a SECOND fused Pallas kernel.  Residuals
saved by fwd: the pre-norm conv parities y_p, the per-group stats
(gmean, grstd) — NO forward rematerialization.  The bwd kernel fuses, in
one VMEM pass per batch tile:

  LeakyReLU bwd -> GroupNorm bwd (classic rstd*(dxhat - mean_g(dxhat)
  - xn*mean_g(dxhat*xn)) with the group means via membership matmuls)
  -> the transposed-conv INPUT gradient dx as 16 per-tap MXU matmuls in
  gather form:

      dx[u,v] = sum_{p=(a,b), r,s} dyp_p[u + 2-a-r, v + 2-b-s] @ w[a+2r, b+2s]^T

  (dyp_p = dy_p zero-padded by 1; the offset algebra is the exact
  transpose of the forward mapping y[2i+a,2j+b] = sum xp[i+a+r, j+b+s]
  w[a+2r,b+2s], verified against jax.vjp of the XLA twin in
  tests/test_kernels.py.)

It also emits dgamma/dbeta (accumulated across batch-tile grid programs)
and the per-parity dy_p cotangents, from which the WEIGHT gradient
dw[a+2r,b+2s] = xp_tap^T @ dy_p is formed by XLA per-tap matmuls outside
the kernel (a 4*4*Ci*Co f32 VMEM accumulator would not fit beside the
working set at the widest stage; XLA runs these dense contractions at MXU
roofline anyway).

Oracle: ``ops.blocks.upsample_block_xla`` (the permanent correctness
reference, SURVEY.md §7.3/N19) — parity-tested fwd and bwd.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024   # of the 16 MB scoped-vmem hard limit
_PARITIES = ((0, 0), (0, 1), (1, 0), (1, 1))


def _sublane_pad(n: int) -> int:
    """Sublane (second-to-last dim) rounds up to 8 in VMEM tiles."""
    return max(8, -(-n // 8) * 8)


def _lane_pad(n: int) -> int:
    """Lane (last dim) rounds up to 128 in VMEM tiles."""
    return -(-n // 128) * 128


def _blk(bt, h, w, c, itemsize):
    """VMEM bytes of one [bt, h, w, c] block after (8, 128) tile padding."""
    return bt * h * _sublane_pad(w) * _lane_pad(c) * itemsize


def _pick_batch_tile(b: int, usage_fn) -> int:
    """Largest power-of-two divisor of b whose working set fits VMEM."""
    bt = b
    while bt > 1 and (b % bt or usage_fn(bt) > _VMEM_BUDGET):
        bt //= 2
    return max(bt, 1)


def _membership(co: int, groups: int):
    """[Co, G] one-hot: channel c belongs to group c // (co // groups)."""
    gs = co // groups
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (co, groups), 0)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (co, groups), 1)
    return ((c_ids // gs) == g_ids).astype(jnp.float32)


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------

def _fwd_kernel(xp_ref, w_ref, gamma_ref, beta_ref, *out_refs,
                h, w, ci, co, groups, slope, eps, out_dtype, residuals):
    bt = xp_ref.shape[0]
    gs = co // groups

    # --- per-(parity, tap) contractions on the MXU ------------------------
    # (Mosaic cannot concat/reshape offset-misaligned slices, so each
    # shifted tap contracts separately and accumulates in f32; same total
    # FLOPs as the fused-K form)
    ys = []
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
        ys.append(acc.reshape(bt, h, w, co))

    # --- per-sample GroupNorm: stats span (spatial x 4 parities x group) --
    member = _membership(co, groups)            # [Co, G]
    s1 = sum(jnp.sum(y, axis=(1, 2)) for y in ys)          # [Bt, Co]
    s2 = sum(jnp.sum(y * y, axis=(1, 2)) for y in ys)
    cnt = 4.0 * gs * h * w
    gmean = jax.lax.dot_general(s1, member, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) / cnt
    gm2 = jax.lax.dot_general(s2, member, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) / cnt
    grstd = jax.lax.rsqrt(gm2 - gmean * gmean + eps)       # [Bt, G]
    mu_c = jax.lax.dot_general(gmean, member.T, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    rstd_c = jax.lax.dot_general(grstd, member.T, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)

    gamma = gamma_ref[:].astype(jnp.float32)    # [1, Co] broadcasts
    beta = beta_ref[:].astype(jnp.float32)
    for p in range(4):
        yn = (ys[p] - mu_c[:, None, None, :]) * rstd_c[:, None, None, :]
        yn = yn * gamma + beta
        out_refs[p][:] = jnp.where(yn >= 0, yn, slope * yn).astype(out_dtype)
    if residuals:
        for p in range(4):
            out_refs[4 + p][:] = ys[p].astype(out_dtype)
        # per-CHANNEL stats as [Bt, 1, Co]: the (1, Co) tiled dims are always
        # full-block, so any bt divides cleanly (a [Bt, G] block with bt < 8
        # violates the (8, 128) tiling — the round-2 block-spec rejection)
        out_refs[8][:] = mu_c[:, None, :]
        out_refs[9][:] = rstd_c[:, None, :]


def _fwd_usage(bt, h, w, ci, co, itemsize):
    """Scoped-VMEM estimate for one fwd grid program at batch tile ``bt``.

    Mosaic double-buffers the in/out blocks across grid iterations (x2);
    internal values live once.  Lane padding to 128 matters at small co
    (co=32 blocks occupy 4x their logical bytes — the round-2 OOM)."""
    xp = _blk(bt, h + 2, w + 2, ci, itemsize)
    wgt = 4 * 4 * _sublane_pad(ci) * _lane_pad(co) * itemsize
    # 4 act + 4 residual parity blocks, plus two [Bt, 1, Co] f32 stat blocks
    outs = (8 * _blk(bt, h, w, co, itemsize)
            + 2 * bt * _sublane_pad(1) * _lane_pad(co) * 4)
    ins_outs = 2 * (xp + wgt + outs)               # double-buffered
    vals = 6 * _blk(bt, h, w, co, 4)               # 4x f32 ys + temporaries
    return ins_outs + vals


def _forward(x, w, gamma, beta, *, slope, group_size, compute_dtype,
             residuals):
    b, h, ww, ci = x.shape
    co = w.shape[-1]
    groups = max(1, co // group_size)
    if co % groups:
        raise ValueError(f"channels {co} not divisible into groups of {group_size}")
    cdt = jnp.dtype(compute_dtype)
    xp = jnp.pad(x.astype(cdt), ((0, 0), (1, 1), (1, 1), (0, 0)))
    bt = _pick_batch_tile(
        b, lambda t: _fwd_usage(t, h, ww, ci, co, cdt.itemsize))
    gamma2 = gamma.astype(jnp.float32)[None, :]
    beta2 = beta.astype(jnp.float32)[None, :]

    kern = functools.partial(
        _fwd_kernel, h=h, w=ww, ci=ci, co=co, groups=groups,
        slope=slope, eps=1e-5, out_dtype=cdt, residuals=residuals)
    par_spec = pl.BlockSpec((bt, h, ww, co), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    par_shape = jax.ShapeDtypeStruct((b, h, ww, co), cdt)
    out_shape = [par_shape] * 4
    out_specs = [par_spec] * 4
    if residuals:
        out_shape += [par_shape] * 4 + [
            jax.ShapeDtypeStruct((b, 1, co), jnp.float32)] * 2
        out_specs += [par_spec] * 4 + [
            pl.BlockSpec((bt, 1, co), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)] * 2
    outs = pl.pallas_call(
        kern,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, h + 2, ww + 2, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 4, ci, co), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=32 * b * h * ww * ci * co,
            bytes_accessed=(xp.size * cdt.itemsize + w.size * cdt.itemsize
                            + (8 if residuals else 4) * b * h * ww * co
                            * cdt.itemsize),
            transcendentals=0),
        interpret=(jax.default_backend() == "cpu"),
    )(xp, w.astype(cdt), gamma2, beta2)

    acts = outs[:4]
    y = _interleave(acts)
    if residuals:
        return y, tuple(outs[4:8]), outs[8], outs[9]
    return y


def _interleave(parities):
    """4x [B,H,W,Co] parity blocks (order (a,b) row-major) -> [B,2H,2W,Co]."""
    a0 = jnp.stack(parities[:2], axis=3)        # [B,H,W,2(b),Co]
    a1 = jnp.stack(parities[2:], axis=3)
    y = jnp.stack([a0, a1], axis=2)             # [B,H,2(a),W,2(b),Co]
    b, h, _, w, _, co = y.shape
    return y.reshape(b, 2 * h, 2 * w, co)


def _deinterleave(g):
    """[B,2H,2W,Co] -> 4x [B,H,W,Co] parity blocks (order (a,b) row-major)."""
    b, h2, w2, co = g.shape
    g = g.reshape(b, h2 // 2, 2, w2 // 2, 2, co)
    return [g[:, :, a, :, bb, :] for a, bb in _PARITIES]


# --------------------------------------------------------------------------
# backward kernel: fused LeakyReLU bwd + GroupNorm bwd + conv-transpose dx
# --------------------------------------------------------------------------

def _bwd_kernel(w_ref, gamma_ref, beta_ref, mu_ref, rstd_ref,
                g0, g1, g2, g3, y0, y1, y2, y3,
                dx_ref, dy0, dy1, dy2, dy3, dgamma_ref, dbeta_ref,
                pad_ref, *,
                h, w, ci, co, groups, slope, out_dtype):
    g_refs = (g0, g1, g2, g3)
    y_refs = (y0, y1, y2, y3)
    dy_refs = (dy0, dy1, dy2, dy3)
    bt = g0.shape[0]
    gs = co // groups

    member = _membership(co, groups)            # [Co, G]
    # residual stats arrive per-channel [Bt, 1, Co] -> broadcastable 4-D
    mu_b = mu_ref[:][:, None, :, :]             # [Bt, 1, 1, Co]
    rstd_b = rstd_ref[:][:, None, :, :]
    gamma = gamma_ref[:].astype(jnp.float32)    # [1, Co]
    beta = beta_ref[:].astype(jnp.float32)

    def relu_gn_locals(p):
        # Recomputed in each phase rather than kept alive across phases:
        # holding xn/dout for all 4 parities costs 8 f32 blocks of VMEM —
        # the scoped-vmem OOM the real-TPU tier caught at the widest f32
        # stage (h=32, 17.9M > the 16M hard limit).  Recompute is a few
        # VPU ops against MXU-dominated phases.
        y = y_refs[p][:].astype(jnp.float32)
        xn = (y - mu_b) * rstd_b
        outv = xn * gamma + beta
        gp = g_refs[p][:].astype(jnp.float32)
        dout = jnp.where(outv >= 0, gp, slope * gp)
        return xn, dout

    # --- LeakyReLU bwd + stats sums, per parity ---------------------------
    s1 = jnp.zeros((bt, co), jnp.float32)
    s2 = jnp.zeros((bt, co), jnp.float32)
    for p in range(4):
        xn, dout = relu_gn_locals(p)
        s1 = s1 + jnp.sum(dout, axis=(1, 2))
        s2 = s2 + jnp.sum(dout * xn, axis=(1, 2))

    # --- affine grads, accumulated across batch-tile grid programs -------
    @pl.when(pl.program_id(0) == 0)
    def _():
        dgamma_ref[:] = jnp.zeros((1, co), jnp.float32)
        dbeta_ref[:] = jnp.zeros((1, co), jnp.float32)
    # batch reduction as a ones-row matmul: jnp.sum(axis=0, keepdims=True)
    # yields a sublane-replicated layout Mosaic cannot relayout for the
    # accumulate-store ("Invalid relayout ... replicated in destination"),
    # while an MXU contraction lands in a standard layout
    ones_row = jnp.ones((1, bt), jnp.float32)
    dgamma_ref[:] += jax.lax.dot_general(
        ones_row, s2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbeta_ref[:] += jax.lax.dot_general(
        ones_row, s1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # --- GroupNorm bwd: dy = rstd * (dxhat - m1 - xn * m2) ----------------
    # with m1 = mean_g(dxhat), m2 = mean_g(dxhat * xn), dxhat = dout*gamma;
    # group means via membership matmuls (gamma varies inside a group, so
    # fold it in before the group-sum).
    cnt = 4.0 * gs * h * w
    m1c = jax.lax.dot_general(
        jax.lax.dot_general(s1 * gamma, member, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) / cnt,
        member.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)     # [Bt, Co]
    m2c = jax.lax.dot_general(
        jax.lax.dot_general(s2 * gamma, member, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) / cnt,
        member.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # --- GN bwd + conv-transpose dx, one parity at a time -----------------
    # dx[u,v] = sum_{(a,b),r,s} dyp_(a,b)[u + 2-a-r, v + 2-b-s] @ w[a+2r,b+2s]^T
    acc = None
    for p, (a, b) in enumerate(_PARITIES):
        xn, dout = relu_gn_locals(p)
        dy = rstd_b * (
            dout * gamma - m1c[:, None, None, :]
            - xn * m2c[:, None, None, :])
        dyc = dy.astype(out_dtype)
        dy_refs[p][:] = dyc
        # stage the zero-padded cotangent in a VMEM scratch REF: the dx
        # taps below then read ref slices at sublane offsets 0..2 — the
        # exact access pattern the fwd kernel uses on xp_ref (Mosaic
        # handles offset ref reads; offset VALUE slices it does not).
        # ONE scratch buffer reused across parities: the 4 taps of parity p
        # are consumed before parity p+1 overwrites it (3 fewer padded
        # blocks resident).
        pad_ref[:] = jnp.pad(dyc, ((0, 0), (1, 1), (1, 1), (0, 0)))
        for r in (0, 1):
            for s in (0, 1):
                ro, cofs = 2 - a - r, 2 - b - s
                tap = pad_ref[:, ro:ro + h, cofs:cofs + w, :]
                part = jax.lax.dot_general(
                    tap.reshape(bt * h * w, co), w_ref[a + 2 * r, b + 2 * s],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)    # [N, Ci]
                acc = part if acc is None else acc + part
    dx_ref[:] = acc.reshape(bt, h, w, ci).astype(out_dtype)


def _bwd_usage(bt, h, w, ci, co, itemsize):
    """Scoped-VMEM estimate for one bwd grid program (same model as fwd)."""
    wgt = 4 * 4 * _sublane_pad(ci) * _lane_pad(co) * itemsize
    ins = 8 * _blk(bt, h, w, co, itemsize) + wgt
    outs = _blk(bt, h, w, ci, itemsize) + 4 * _blk(bt, h, w, co, itemsize)
    scratch = _blk(bt, h + 2, w + 2, co, itemsize)
    # phase-local f32 values (xn/dout/dy of ONE parity + temporaries) plus
    # the dx matmul accumulator
    vals = 4 * _blk(bt, h, w, co, 4) + _blk(bt, h, w, ci, 4)
    return 2 * (ins + outs) + scratch + vals


def _backward(w, gamma, beta, mu3, rstd3, g_ps, y_ps, *,
              slope, groups, compute_dtype):
    b, h, ww, co = g_ps[0].shape
    ci = w.shape[2]
    cdt = jnp.dtype(compute_dtype)
    bt = _pick_batch_tile(
        b, lambda t: _bwd_usage(t, h, ww, ci, co, cdt.itemsize))

    kern = functools.partial(
        _bwd_kernel, h=h, w=ww, ci=ci, co=co, groups=groups,
        slope=slope, out_dtype=cdt)
    par_spec = pl.BlockSpec((bt, h, ww, co), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((bt, 1, co), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    aff_spec = pl.BlockSpec((1, co), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    par_shape = jax.ShapeDtypeStruct((b, h, ww, co), cdt)
    outs = pl.pallas_call(
        kern,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((4, 4, ci, co), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            aff_spec, aff_spec, stat_spec, stat_spec,
        ] + [par_spec] * 8,
        out_specs=[pl.BlockSpec((bt, h, ww, ci), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)]
        + [par_spec] * 4
        + [pl.BlockSpec((1, co), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((b, h, ww, ci), cdt)]
        + [par_shape] * 4
        + [jax.ShapeDtypeStruct((1, co), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((bt, h + 2, ww + 2, co), cdt)],
        cost_estimate=pl.CostEstimate(
            flops=32 * b * h * ww * ci * co,
            bytes_accessed=(13 * b * h * ww * co * cdt.itemsize
                            + b * h * ww * ci * cdt.itemsize
                            + w.size * cdt.itemsize),
            transcendentals=0),
        interpret=(jax.default_backend() == "cpu"),
    )(w.astype(cdt), gamma.astype(jnp.float32)[None, :],
      beta.astype(jnp.float32)[None, :], mu3, rstd3, *g_ps, *y_ps)
    dx, dy_ps, dgamma, dbeta = outs[0], outs[1:5], outs[5], outs[6]
    return dx, dy_ps, dgamma[0], dbeta[0]


def _weight_grad(x, dy_ps, *, compute_dtype):
    """dw[a+2r, b+2s] = xp_tap^T @ dy_(a,b): 16 dense XLA matmuls at MXU
    roofline (kept outside the Pallas bwd: a [4,4,Ci,Co] f32 accumulator
    would not fit VMEM beside the fused working set at the widest stage)."""
    b, h, ww, ci = x.shape
    co = dy_ps[0].shape[-1]
    cdt = jnp.dtype(compute_dtype)
    xp = jnp.pad(x.astype(cdt), ((0, 0), (1, 1), (1, 1), (0, 0)))
    n = b * h * ww
    rows = {}
    for p, (a, bb) in enumerate(_PARITIES):
        dy = dy_ps[p].reshape(n, co)
        for r in (0, 1):
            for s in (0, 1):
                tap = xp[:, a + r:a + r + h, bb + s:bb + s + ww, :]
                rows[(a + 2 * r, bb + 2 * s)] = jax.lax.dot_general(
                    tap.reshape(n, ci), dy, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # [Ci, Co]
    return jnp.stack([jnp.stack([rows[(kh, kw)] for kw in range(4)], axis=0)
                      for kh in range(4)], axis=0)          # [4,4,Ci,Co]


@functools.lru_cache(maxsize=None)
def _make_op(slope: float, group_size: int, dtype_name: str):
    compute_dtype = jnp.dtype(dtype_name)

    @jax.custom_vjp
    def op(x, w, gamma, beta):
        return _forward(x, w, gamma, beta, slope=slope,
                        group_size=group_size, compute_dtype=compute_dtype,
                        residuals=False)

    def fwd(x, w, gamma, beta):
        y, y_ps, mu3, rstd3 = _forward(
            x, w, gamma, beta, slope=slope, group_size=group_size,
            compute_dtype=compute_dtype, residuals=True)
        return y, (x, w, gamma, beta, y_ps, mu3, rstd3)

    def bwd(res, g):
        x, w, gamma, beta, y_ps, mu3, rstd3 = res
        co = w.shape[-1]
        groups = max(1, co // group_size)
        g_ps = _deinterleave(g.astype(compute_dtype))
        dx, dy_ps, dgamma, dbeta = _backward(
            w, gamma, beta, mu3, rstd3, g_ps, y_ps,
            slope=slope, groups=groups, compute_dtype=compute_dtype)
        dw = _weight_grad(x, dy_ps, compute_dtype=compute_dtype)
        return (dx.astype(x.dtype), dw.astype(w.dtype),
                dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype))

    op.defvjp(fwd, bwd)
    return op


# Mosaic's scoped-vmem hard cap is 16 MB per kernel; leave headroom for its
# own bookkeeping.  Checked at bt=1 (the smallest batch tile the grid can
# shrink to) with Mosaic's observed buffering: grid-varying in/out blocks
# double-buffered, constant-index blocks (weights) resident once.
_SCOPED_LIMIT = 15 * 1024 * 1024


def pallas_fits(b, h, w_sp, ci, co, compute_dtype) -> bool:
    """Whether the fused fwd AND bwd kernels fit scoped VMEM at this shape.

    The real-TPU tier showed the f32 widest stage (h=32, ci=64, co=32)
    needs 17.65 MB scoped for the bwd even at bt=1 — over the 16 MB hard
    cap (lane padding: co=32 parity blocks occupy 4x their bytes).  The
    estimators double-count the constant weight block relative to Mosaic's
    accounting, so it is subtracted back once here."""
    itemsize = jnp.dtype(compute_dtype).itemsize
    wgt = 4 * 4 * _sublane_pad(ci) * _lane_pad(co) * itemsize
    fwd = _fwd_usage(1, h, w_sp, ci, co, itemsize) - wgt
    bwd = _bwd_usage(1, h, w_sp, ci, co, itemsize) - wgt
    return max(fwd, bwd) <= _SCOPED_LIMIT


def upsample_block_pallas(x, w, gamma, beta, *, slope: float = 0.2,
                          group_size: int = 16,
                          compute_dtype=jnp.bfloat16):
    """Drop-in twin of ``ops.blocks.upsample_block_xla`` (same signature).

    Guarantee-run: shapes whose fused working set cannot fit Mosaic's
    scoped-VMEM cap even at batch tile 1 (e.g. the widest stage at f32)
    dispatch to the XLA twin instead of failing at compile time.  Every
    shipped bf16 stage fits."""
    b, h, ww, ci = x.shape
    co = w.shape[-1]
    if not pallas_fits(b, h, ww, ci, co, compute_dtype):
        from levelgan.ops.blocks import upsample_block_xla
        return upsample_block_xla(x, w, gamma, beta, slope=slope,
                                  group_size=group_size,
                                  compute_dtype=compute_dtype)
    op = _make_op(float(slope), int(group_size), jnp.dtype(compute_dtype).name)
    return op(x, w, gamma, beta)
