"""Pallas TPU kernel K2 stage (c): fused critic forward + inner input-gradient.

Reference equivalent: the inner ``torch.autograd.grad(D(x_hat), x_hat,
create_graph=True)`` of WGAN-GP (SURVEY.md K2 [NS]) — in torch/XLA this is a
forward pass plus a reverse pass spread over dozens of separate kernels with
every intermediate activation round-tripping through HBM.

Here ONE Pallas program per batch tile computes the critic trunk forward
(strided 4x4/s2 convs + GroupNorm + LeakyReLU + linear head) AND its exact
input gradient, keeping every activation in VMEM (SURVEY.md §7.4 item 1
stage (c)).  Scope: the small critics (level_size <= 32), whose weight set
fits VMEM; gumbel_64 keeps the stage-(b) penalty-core kernel.

Split of labor (lane-padding economics): layer 0 reads the n_tiles(+cond)
input — 8-ish channels that pad to 128 lanes, a 16x VMEM/bandwidth waste if
staged into the kernel — and it is the only layer that sees ``cond``.  So
layer 0's conv and its input-gradient transpose stay in XLA (captured via
``jax.vjp``, one matmul each, fused by XLA into the producer/consumer),
while the kernel fuses everything from the first 64-channel activation
onward: layers 1..L-1 fwd, head, and the full reverse chain back to
layer 0's pre-activation gradient.

Layout: inside the kernel activations are SPATIAL-MAJOR ``[H, W, B, C]`` so
the tiled (sublane, lane) dims are (batch, channels) and both spatial dims
are untiled outer dims.  That makes the stride-2 parity bookkeeping free:

  - parity split  = outer-dim reshape [M,M,B,C] -> [M/2,2,M/2,2,B,C] + index
  - parity merge  = outer-dim stack + reshape (exact inverse)
  - conv taps     = unit-stride offset slices of zero-padded parity planes

and each of the 16 taps of a strided conv is a dense MXU contraction
``[m*m*B, Ci] x [Ci, Co]`` — the stride-2 dual of K1's zero-insertion-free
transposed-conv decomposition (ops.blocks.conv_transpose_2x_parity):

  y[i,j] = sum_{ky,kx} x[2i+ky-1, 2j+kx-1] @ W[ky,kx]
         = sum_{taps}  xplane_c[i+r] @ W[ky,kx],  c=(ky-1)%2, r=(ky-1-c)//2

GroupNorm stats/backward use K1's membership-matmul form (no minor-dim
reshapes); the head is an elementwise-mult + reduce (no flatten reshape).

The op is wrapped in ``jax.custom_vjp``: the outer gradient w.r.t. critic
params — the double backward — is the gradient of the directional
derivative <ct, grad_x D> = d/de sum_b D(x + e*ct), computed as XLA
reverse-over-forward (``jax.grad`` of ``jax.jvp``) on the XLA-twin critic.
This is mathematically exact (symmetric Hessian) and lets XLA fuse the HVP,
while the hot inner gradient — executed n_critic times per step — runs as
one fused kernel.

Oracle: ``jax.grad`` of ``Critic.apply`` / ``ops.grad_penalty``
(parity-tested in tests/test_gp_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from levelgan.kernels.upsample_block import (
    _lane_pad, _membership, _sublane_pad)

_VMEM_BUDGET = 12 * 1024 * 1024
_EPS = 1e-5


def _tap_cr(k: int) -> tuple[int, int]:
    """4-tap kernel index -> (input parity c, plane offset r)."""
    c = (k - 1) % 2
    return c, (k - 1 - c) // 2


def _split_pad(x):
    """[M, M, B, C] -> planes[c][d] = zero-padded x[2i+c, 2j+d] ([m+2, m+2, B, C])."""
    m2 = x.shape[0]
    m = m2 // 2
    bt, c = x.shape[2:]
    r = x.reshape(m, 2, m, 2, bt, c)
    pad = ((1, 1), (1, 1), (0, 0), (0, 0))
    return [[jnp.pad(r[:, cy, :, cx], pad) for cx in (0, 1)] for cy in (0, 1)]


def _merge(planes):
    """Inverse of the split (no pad): planes[c][d] [m,m,B,C] -> [2m,2m,B,C]."""
    rows = [jnp.stack(r, axis=2) for r in planes]      # [m, m, 2, B, C]
    y = jnp.stack(rows, axis=1)                        # [m, 2, m, 2, B, C]
    m = planes[0][0].shape[0]
    b, c = planes[0][0].shape[2:]
    return y.reshape(2 * m, 2 * m, b, c)


def _conv_down(planes, w_ref, m, ci, co, bt):
    """Strided 4x4/s2 conv from padded parity planes: -> [m, m, B, Co] f32."""
    acc = None
    for ky in range(4):
        cy, ry = _tap_cr(ky)
        for kx in range(4):
            cx, rx = _tap_cr(kx)
            tap = planes[cy][cx][ry + 1:ry + 1 + m, rx + 1:rx + 1 + m]
            part = jax.lax.dot_general(
                tap.reshape(m * m * bt, ci), w_ref[ky, kx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    return acc.reshape(m, m, bt, co)


def _conv_down_dx(d, w_ref, m, ci, co, bt, cdt):
    """Input gradient of the strided conv: d [m,m,B,Co] -> [2m,2m,B,Ci].

    dxplane_c[p] = sum_{ky: (ky-1)%2==c} dpad[p - r + 1] @ W[ky]^T — the
    exact transpose of the forward tap mapping (offset sign flipped).
    """
    dpad = jnp.pad(d.astype(cdt), ((1, 1), (1, 1), (0, 0), (0, 0)))
    planes = [[None, None], [None, None]]
    for cy in (0, 1):
        for cx in (0, 1):
            acc = None
            for ky in range(4):
                c1, ry = _tap_cr(ky)
                if c1 != cy:
                    continue
                for kx in range(4):
                    c2, rx = _tap_cr(kx)
                    if c2 != cx:
                        continue
                    tap = dpad[1 - ry:1 - ry + m, 1 - rx:1 - rx + m]
                    part = jax.lax.dot_general(
                        tap.reshape(m * m * bt, co), w_ref[ky, kx],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = part if acc is None else acc + part
            planes[cy][cx] = acc.reshape(m, m, bt, ci).astype(cdt)
    return _merge(planes)


def _gn_fwd(y, gamma, beta, member, gs, m):
    """GroupNorm fwd on [m,m,B,Co] (f32 stats, K1's membership-matmul form)."""
    yf = y.astype(jnp.float32)
    s1 = jnp.sum(yf, axis=(0, 1))                      # [B, Co]
    s2 = jnp.sum(yf * yf, axis=(0, 1))
    cnt = float(gs * m * m)
    gmean = jax.lax.dot_general(s1, member, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) / cnt
    gm2 = jax.lax.dot_general(s2, member, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) / cnt
    grstd = jax.lax.rsqrt(gm2 - gmean * gmean + _EPS)  # [B, G]
    mu_c = jax.lax.dot_general(gmean, member.T, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    rstd_c = jax.lax.dot_general(grstd, member.T, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    xn = (yf - mu_c[None, None]) * rstd_c[None, None]  # [m, m, B, Co] f32
    return xn, rstd_c, xn * gamma + beta


def _gn_bwd(d, xn, rstd_c, gamma, member, gs, m):
    """d(GN out) -> d(GN in): rstd * (dxhat - mean_g(dxhat) - xn*mean_g(dxhat*xn))."""
    dxhat = d.astype(jnp.float32) * gamma
    s1 = jnp.sum(dxhat, axis=(0, 1))                   # [B, Co]
    s2 = jnp.sum(dxhat * xn, axis=(0, 1))
    cnt = float(gs * m * m)

    def gmean_c(s):
        g = jax.lax.dot_general(s, member, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) / cnt
        return jax.lax.dot_general(g, member.T, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    m1 = gmean_c(s1)[None, None]
    m2 = gmean_c(s2)[None, None]
    return rstd_c[None, None] * (dxhat - m1 - xn * m2)


def _kernel(a0_ref, *refs, layers, group_size, slope, m0, cdt):
    """One fused program: trunk fwd + head + full inner-gradient reverse.

    a0_ref: layer-0 activation (post-LeakyReLU), spatial-major
    [M0, M0, bt, C0].  refs order: per trunk layer (w, b[, gamma, beta]),
    then head_w [4, 4, 1, Cl], then the output ref (dy0: gradient at
    layer 0's PRE-activation, same shape as a0).
    """
    out_ref = refs[-1]
    bt = a0_ref.shape[2]
    it = iter(refs[:-1])
    params = []
    for (_ci, _co, has_gn) in layers:
        w, b = next(it), next(it)
        gb = (next(it), next(it)) if has_gn else (None, None)
        params.append((w, b, *gb))
    head_ref = next(it)

    # ---- forward trunk, residual values stay live in VMEM ----------------
    a0 = a0_ref[:]
    cur, m = a0, m0
    saved = []
    for (ci, co, has_gn), (w, b, ga, be) in zip(layers, params):
        m //= 2
        planes = _split_pad(cur)
        y = _conv_down(planes, w, m, ci, co, bt)
        y = y.astype(cdt) + b[:].astype(cdt)           # [m, m, B, Co]
        if has_gn:
            gamma = ga[:].astype(jnp.float32)          # [1, Co] broadcasts
            groups = max(1, co // group_size)
            member = _membership(co, groups)
            gs = co // groups
            xn, rstd_c, o = _gn_fwd(y, gamma, be[:].astype(jnp.float32),
                                    member, gs, m)
            saved.append((o, xn, rstd_c, gamma, member, gs))
        else:
            o = y.astype(jnp.float32)
            saved.append((o, None, None, None, None, None))
        cur = jnp.where(o >= 0, o, slope * o).astype(cdt)

    # ---- inner gradient: head -> trunk layers in reverse -----------------
    # d(sum_b score_b)/d(a_last) = head weights broadcast over batch.
    cl = layers[-1][1] if layers else a0.shape[-1]
    d = jnp.broadcast_to(head_ref[:].astype(jnp.float32), (m, m, bt, cl))
    for (ci, co, has_gn), (w, _b, _ga, _be), (o, xn, rstd_c, gamma, member, gs) \
            in zip(reversed(layers), reversed(params), reversed(saved)):
        d = jnp.where(o >= 0, d, slope * d)            # LeakyReLU bwd
        if has_gn:
            d = _gn_bwd(d, xn, rstd_c, gamma, member, gs, m)
        d = _conv_down_dx(d, w, m, ci, co, bt, cdt)    # -> [2m, 2m, B, Ci]
        m *= 2

    # layer-0 LeakyReLU bwd: slope > 0 preserves sign, so the mask can be
    # read off a0 itself (no need to ship y0 into the kernel).  Compare in
    # f32: Mosaic rejects bf16 vector cmpf on v5e ("Target does not
    # support this comparison").
    a0f = a0.astype(jnp.float32)
    out_ref[:] = jnp.where(a0f >= 0, d, slope * d).astype(out_ref.dtype)


def _usage(bt, m0, c0, layers, itemsize):
    """Scoped-VMEM estimate for one grid program at batch tile ``bt``.

    [m, m, bt, c] blocks tile (bt, c) -> (8, 128); spatial dims are outer.
    """
    def blk(m, c, isz):
        return m * m * _sublane_pad(bt) * _lane_pad(c) * isz

    io = blk(m0, c0, itemsize) * 2                     # a0 in + dy0 out
    wgt = sum(4 * 4 * _sublane_pad(ci) * _lane_pad(co) * itemsize
              for ci, co, _ in layers)
    m, acts = m0, 4 * blk(m0 // 2 + 2, c0, itemsize)   # layer-1 parity planes
    for ci, co, has_gn in layers:
        m //= 2
        # y/o/xn/d f32 working values per layer (live across fwd+bwd),
        # plus the next split's padded parity planes
        acts += (4 if has_gn else 2) * blk(m, co, 4)
        acts += 4 * blk(m // 2 + 2, co, itemsize)
    return 2 * io + 2 * wgt + acts


@functools.lru_cache(maxsize=None)
def _make_fused(m0, c0, layer_key, group_size, slope, dtype_name):
    layers = tuple(layer_key)
    cdt = jnp.dtype(dtype_name)

    def run(a0_sm, flat_params, head_w):
        """a0_sm [M0, M0, B, C0] spatial-major -> dy0 (same shape)."""
        b = a0_sm.shape[2]
        bt = b
        while bt > 1 and (b % bt or _usage(bt, m0, c0, layers, cdt.itemsize)
                          > _VMEM_BUDGET):
            bt //= 2
        if _usage(bt, m0, c0, layers, cdt.itemsize) > _VMEM_BUDGET:
            raise ValueError(
                "critic_grad: single-sample working set exceeds the VMEM "
                "budget; use the stage-(b) gp_penalty path for this shape")

        def full(*s):
            return pl.BlockSpec(s, lambda i: (0,) * len(s),
                                memory_space=pltpu.VMEM)

        io_spec = pl.BlockSpec((m0, m0, bt, c0), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM)
        in_specs = [io_spec]
        for p in flat_params:
            in_specs.append(full(*p.shape))
        in_specs.append(full(*head_w.shape))
        kern = functools.partial(_kernel, layers=layers,
                                 group_size=group_size, slope=slope,
                                 m0=m0, cdt=cdt)
        flops = sum(2 * 2 * 16 * (m0 // 2 ** (i + 1)) ** 2 * b * ci * co
                    for i, (ci, co, _) in enumerate(layers))
        return pl.pallas_call(
            kern,
            grid=(b // bt,),
            in_specs=in_specs,
            out_specs=io_spec,
            out_shape=jax.ShapeDtypeStruct((m0, m0, b, c0), cdt),
            cost_estimate=pl.CostEstimate(
                flops=max(flops, 1),
                bytes_accessed=2 * m0 * m0 * b * c0 * cdt.itemsize,
                transcendentals=0),
            interpret=(jax.default_backend() == "cpu"),
        )(a0_sm, *flat_params, head_w)

    return run


def _arch(mcfg):
    """Static plan mirroring models.critic.Critic: (c0, trunk layer list).

    trunk layers = downs 1..n-1 as (ci, co, has_gn); layer 0 stays in XLA.
    """
    n = int(np.log2(mcfg.level_size // 4))
    chans = [min(mcfg.critic_base_channels * 2 ** i, mcfg.max_channels)
             for i in range(n)]
    layers = [(chans[i - 1], chans[i], mcfg.norm != "none")
              for i in range(1, n)]
    return chans[0], tuple(layers), chans[-1]


def _flatten_params(params_d, layers, cl, cdt):
    """Critic param tree -> (kernel refs in order, head_w [4,4,1,Cl])."""
    flat = []
    for i, (_ci, co, has_gn) in enumerate(layers, start=1):
        flat.append(params_d[f"down{i}"]["kernel"].astype(cdt))
        flat.append(params_d[f"down{i}"]["bias"][None, :].astype(jnp.float32))
        if has_gn:
            flat.append(params_d[f"scale{i}"][None, :].astype(jnp.float32))
            flat.append(params_d[f"bias{i}"][None, :].astype(jnp.float32))
    hk = params_d["head"]["kernel"]                    # [16*Cl, 1]
    head_w = hk[:, 0].reshape(4, 4, 1, cl).astype(jnp.float32)
    return flat, head_w


def make_critic_input_grad(mcfg):
    """Build ``grad_fn(params_d, x_hat, cond) -> d(sum_b D_b)/d(x_hat)``.

    Forward: XLA layer-0 conv (via jax.vjp) + the fused Pallas kernel.
    Backward (the WGAN-GP double backward): exact XLA reverse-over-forward
    on the XLA-twin critic.
    """
    from levelgan.models.critic import Critic

    critic = Critic(mcfg)
    c0, layers, cl = _arch(mcfg)
    cdt = jnp.dtype(mcfg.dtype)
    run = _make_fused(mcfg.level_size // 2, c0, layers, mcfg.group_size,
                      mcfg.leaky_slope, cdt.name)
    dn = ("NHWC", "HWIO", "NHWC")

    def apply_sum(pd, x, cond):
        return critic.apply({"params": pd}, x, cond).astype(jnp.float32).sum()

    def embed_cat(pd, x, cond):
        """Mirror the critic's cond concat (XLA side; Dense+lrelu is tiny)."""
        if not mcfg.cond_dim:
            return x.astype(cdt)
        ek = pd["cond_embed"]["kernel"].astype(cdt)
        eb = pd["cond_embed"]["bias"].astype(cdt)
        emb = cond.astype(cdt) @ ek + eb
        emb = jnp.where(emb >= 0, emb, mcfg.leaky_slope * emb)
        emb = jnp.broadcast_to(emb[:, None, None, :],
                               x.shape[:3] + (emb.shape[-1],))
        return jnp.concatenate([x.astype(cdt), emb], axis=-1)

    @jax.custom_vjp
    def grad_fn(pd, x_hat, cond):
        with jax.named_scope("K2_critic_grad_fused"):
            xc = embed_cat(pd, x_hat, cond)
            w0 = pd["down0"]["kernel"].astype(cdt)
            b0 = pd["down0"]["bias"].astype(cdt)
            conv0 = lambda xx: jax.lax.conv_general_dilated(
                xx, w0, (2, 2), "SAME", dimension_numbers=dn)
            y0, vjp0 = jax.vjp(conv0, xc)
            a0 = jax.nn.leaky_relu(y0 + b0, mcfg.leaky_slope)
            flat, head_w = _flatten_params(pd, layers, cl, cdt)
            dy0_sm = run(jnp.transpose(a0, (1, 2, 0, 3)), flat, head_w)
            dy0 = jnp.transpose(dy0_sm, (2, 0, 1, 3)).astype(cdt)
            dxc = vjp0(dy0)[0]
            # gradient w.r.t. x_hat = first n_tiles channels (the rest are
            # the cond embedding's, not x_hat's)
            return dxc[..., :mcfg.n_tiles].astype(x_hat.dtype)

    def fwd(pd, x_hat, cond):
        return grad_fn(pd, x_hat, cond), (pd, x_hat, cond)

    def bwd(res, ct):
        pd, x_hat, cond = res

        def dir_deriv(p, x, c):
            # <ct, grad_x sum D> as a jvp — its gradient is the exact
            # (symmetric-Hessian) double backward.
            return jax.jvp(lambda xx: apply_sum(p, xx, c),
                           (x,), (ct.astype(x.dtype),))[1]

        if cond is None:
            dp, dx = jax.grad(lambda p, x: dir_deriv(p, x, None),
                              argnums=(0, 1))(pd, x_hat)
            return dp, dx, None
        dp, dx, dc = jax.grad(dir_deriv, argnums=(0, 1, 2))(pd, x_hat, cond)
        return dp, dx, dc

    grad_fn.defvjp(fwd, bwd)
    return grad_fn


def fused_supported(mcfg) -> bool:
    """Stage (c) scope: small tile-family critics (>=2 down layers, VMEM-fit).

    The VMEM gate is evaluated at the minimum batch tile (bt=1): if even a
    single sample's fused working set exceeds the budget (e.g. the 32x32
    critic at f32 — caught by the real-TPU tier as a trace-time error),
    the caller must use the stage-(b) penalty-core path instead."""
    if not (mcfg.family == "tile" and mcfg.level_size in (16, 32)
            and mcfg.norm in ("group", "none")):
        return False
    if mcfg.cond_dim and mcfg.cond_mode != "concat":
        # the kernel mirrors the concat architecture (embed_cat + plain
        # Dense head); projection conditioning routes to the generic paths
        return False
    if getattr(mcfg, "critic_mbstd", ""):
        # the hand-mirrored critic has no minibatch-stddev channel; with
        # mbstd enabled its param shapes mismatch the Flax critic (down0
        # input channels / head reshape) — reject cleanly so 'auto'/'fused'
        # route to the real-critic paths instead of a trace-time error
        return False
    c0, layers, _cl = _arch(mcfg)
    itemsize = jnp.dtype(mcfg.dtype).itemsize
    return _usage(1, mcfg.level_size // 2, c0, layers, itemsize) <= _VMEM_BUDGET


def make_gradient_penalty(mcfg):
    """GP implementation picker for ``use_pallas=True``, honoring
    ``mcfg.pallas_gp`` ('auto'|'fused'|'core'|'xla').

    'auto' measurement note (dev v5e, BASELINE.md K2 table): in TRAINING the
    outer double-backward dominates and stage (c)'s custom_vjp cannot share
    residuals with its fused forward, so it does strictly more work per
    critic iteration than the one XLA graph the oracle compiles to; stage
    (b) fuses only the tiny penalty core.  'auto' therefore picks the
    XLA-oracle GP path (K1 stays Pallas) — the fused stage-(c) kernel
    remains the right call for inference-style uses (inner gradient alone,
    no double backward) and stays selectable as 'fused'.
    Signature-compatible with ``ops.grad_penalty.gradient_penalty``."""
    from levelgan.kernels.gp_penalty import (gradient_penalty_pallas,
                                             norm_penalty)
    from levelgan.ops.grad_penalty import gradient_penalty, interpolate

    choice = getattr(mcfg, "pallas_gp", "auto")
    if choice == "xla" or choice == "auto":
        return gradient_penalty
    if choice == "core" or (choice == "fused" and not fused_supported(mcfg)):
        if choice == "fused":
            raise ValueError(
                "model.pallas_gp='fused' but the stage-(c) kernel does not "
                "support this critic shape; use 'core' or 'auto'")
        return gradient_penalty_pallas

    grad_fn = make_critic_input_grad(mcfg)

    def gp(d_apply, params_d, key, real, fake, cond=None):
        del d_apply   # the fused kernel embodies the critic architecture
        with jax.named_scope("K2_grad_penalty_fused"):
            x_hat = interpolate(key, real, fake)
            g = grad_fn(params_d, x_hat, cond)
            return jnp.mean(norm_penalty(g.reshape(g.shape[0], -1)))

    return gp
