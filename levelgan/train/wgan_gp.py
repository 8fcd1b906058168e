"""WGAN-GP train step — configs 2-4 (and the GAN half of config 5).

Reference equivalent: the eager n_critic loop with torch double-backward GP
(SURVEY.md §3.1).  TPU-first: the n_critic critic updates run as a
``lax.scan`` INSIDE one jit step — the step consumes a super-batch of
``n_critic`` real minibatches (shape [n_critic, B, H, W]) so the whole
critic schedule plus the generator update is a single XLA program with zero
host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from levelgan.config import Config
from levelgan.data.codec import decode
from levelgan.data.features import level_features
from levelgan.lio.metrics import tile_histogram
from levelgan.models import Critic, Generator, sample_head
from levelgan.ops.grad_penalty import gradient_penalty
from levelgan.train.gan import corpus_cond_scale, current_tau, prepare_real
from levelgan.train.state import GANState, make_optimizers, update_ema


def make_critic_scan(cfg: Config, gen, critic, tx_d, gp_impl):
    """Shared n_critic WGAN-GP critic schedule as a ``lax.scan``.

    Used by both the plain WGAN-GP step (configs 2-4) and the curriculum
    step's realism term (config 5) so the GP/critic-loss logic exists once.
    Returns ``run(params_g, params_d, opt_d, batch_ids, iter_keys, step)
    -> (params_d, opt_d, per_iter_metrics)``.
    """
    m, t = cfg.model, cfg.train

    def run(params_g, params_d, opt_d, batch_ids, iter_keys, step):
        bsz = batch_ids.shape[1]
        tau = current_tau(cfg, step)
        from levelgan.ops.presence import mbstd_scale_schedule
        ms = mbstd_scale_schedule(t, step)   # None when the anneal is off

        def d_apply(params_d, x, cond):
            return critic.apply({"params": params_d}, x, cond,
                                mbstd_scale=ms)

        def critic_iter(carry, xs):
            params_d, opt_d = carry
            ids, k = xs
            k_aug, k_z, k_s, k_eps = jax.random.split(k, 4)
            real, cond = prepare_real(cfg, k_aug, ids)
            z = jax.random.normal(k_z, (bsz, m.latent_dim), jnp.float32)
            logits = gen.apply({"params": params_g}, z, cond)
            fake = jax.lax.stop_gradient(sample_head(
                k_s, logits, m.head, tau, structural=m.structural_head))

            def d_loss_fn(pd):
                d_real = d_apply(pd, real, cond)
                d_fake = d_apply(pd, fake, cond)
                gp = gp_impl(d_apply, pd, k_eps, real, fake, cond)
                wdist = d_real.mean() - d_fake.mean()
                loss = -wdist + t.gp_lambda * gp
                return loss, (gp, wdist)

            (d_loss, (gp, wdist)), grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(params_d)
            updates, opt_d = tx_d.update(grads, opt_d, params_d)
            new_params = optax.apply_updates(params_d, updates)
            if t.freeze_critic_until:
                # round-5 stationary-critic window: carry the old
                # params/opt state through unchanged while step <
                # freeze_critic_until (a tree-wide select keeps the scan
                # structure static; cost is one where() per leaf)
                live = step >= t.freeze_critic_until
                new_params, opt_d = jax.tree.map(
                    lambda new, old: jnp.where(live, new, old),
                    (new_params, opt_d), (params_d, carry[1]))
            params_d = new_params
            return (params_d, opt_d), {"d_loss": d_loss, "gp": gp, "wdist": wdist}

        with jax.named_scope("critic_scan"):   # profiler range (SURVEY §5.1)
            (params_d, opt_d), it = jax.lax.scan(
                critic_iter, (params_d, opt_d), (batch_ids, iter_keys))
        return params_d, opt_d, it

    return run


def make_wgan_gp_step(cfg: Config):
    """Build the jit-able WGAN-GP step. Batch: uint8 ids [n_critic, B, H, W]."""
    m, t = cfg.model, cfg.train
    gen, critic = Generator(m), Critic(m)
    if t.w_closure:
        # loud instead of a silent no-op: grids have no heading to close
        raise ValueError("train.w_closure is track-family only "
                         "(heading-closure prior); tile levels have no "
                         "loop-closure invariant")
    if t.w_cond_match and not m.cond_dim:
        raise ValueError("train.w_cond_match requires a conditional model "
                         "(model.cond_dim > 0): it matches the fake "
                         "sample's features to the requested condition")
    tx_g, tx_d = make_optimizers(cfg)
    cond_scale = corpus_cond_scale(cfg) if t.w_cond_match else None
    if m.use_pallas:
        # stage-(c) fused critic-gradient kernel for the small critics,
        # stage-(b) penalty core elsewhere (kernels/critic_grad.py)
        from levelgan.kernels.critic_grad import make_gradient_penalty
        gp_impl = make_gradient_penalty(m)
    else:
        gp_impl = gradient_penalty

    critic_scan = make_critic_scan(cfg, gen, critic, tx_d, gp_impl)

    def step_fn(state: GANState, batch_ids: jax.Array):
        assert batch_ids.ndim == 4, "wgan_gp expects [n_critic, B, H, W]"
        bsz = batch_ids.shape[1]
        base = jax.random.fold_in(state.rng, state.step)
        iter_keys = jax.random.split(
            jax.random.fold_in(base, 0), batch_ids.shape[0])
        k_zg, k_sg = jax.random.split(jax.random.fold_in(base, 1))

        # ---- critic updates: lax.scan over n_critic minibatches ------------
        params_d, opt_d, it = critic_scan(
            state.generator, state.discriminator, state.opt_d,
            batch_ids, iter_keys, state.step)

        # ---- generator update ----------------------------------------------
        # Condition features are D4-invariant, so take them straight from the
        # last (un-augmented) real minibatch.
        cond_g = level_features(batch_ids[-1]) if m.cond_dim else None
        z = jax.random.normal(k_zg, (bsz, m.latent_dim), jnp.float32)
        from levelgan.ops.presence import (excess_weight_schedule,
                                           mbstd_scale_schedule)
        ms_g = mbstd_scale_schedule(t, state.step)

        def g_loss_fn(pg):
            logits = gen.apply({"params": pg}, z, cond_g)
            fake = sample_head(k_sg, logits, m.head,
                               current_tau(cfg, state.step),
                               structural=m.structural_head)
            # same mbstd scale as the critic schedule saw this step, so G
            # optimizes against the critic it will actually face
            loss = -critic.apply({"params": params_d}, fake, cond_g,
                                 mbstd_scale=ms_g).mean()
            pres = None
            if t.w_presence:
                # structural-tile presence prior (ops/presence.py): direct
                # low-variance gradient against rare-tile mode-drop
                from levelgan.ops.presence import presence_penalty
                pres = presence_penalty(
                    fake, w_spread=t.presence_spread,
                    w_excess=excess_weight_schedule(t, state.step))
                loss = loss + t.w_presence * pres
            cmatch = None
            if t.w_cond_match:
                # feature-matching conditioning loss (round 3): match the
                # EXPECTED features of the sampling model — for both heads
                # the per-cell tile marginal is softmax(logits) (gumbel-max
                # property; tau only shapes the relaxation gradient), so
                # soft features of the softmax are the exact differentiable
                # expectation.  Matching the hard ST sample instead was
                # measured to DESTROY the response it should create (noisy
                # ST gradients at tau_end: artifacts/eval_cond_32_cm_st.json
                # wall_frac r 0.9999 -> 0.36) — do not regress this.
                from levelgan.data.features import soft_level_features
                probs = jax.nn.softmax(logits, axis=-1)
                # standardize per dim by the CORPUS feature spread (static,
                # train/gan.corpus_cond_scale): hazard/coin corpus ranges
                # are ~2% of the grid, so a raw-scale MSE is ~1e-4 —
                # invisible next to the O(1) adversarial term (measured:
                # those dims stayed flat at w=10,
                # artifacts/eval_cond_32_cm2.json); unit-variance residuals
                # give every dim comparable gradient, and the static scale
                # cannot be inflated by a degenerate batch (advisor r3).
                cmatch = jnp.square(
                    (soft_level_features(probs) - cond_g) / cond_scale).mean()
                loss = loss + t.w_cond_match * cmatch
            return loss, (fake, pres, cmatch)

        (g_loss, (fake, pres, cmatch)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.generator)
        g_updates, opt_g = tx_g.update(g_grads, state.opt_g, state.generator)
        params_g = optax.apply_updates(state.generator, g_updates)

        new_state = state.replace(
            step=state.step + 1, generator=params_g, discriminator=params_d,
            opt_g=opt_g, opt_d=opt_d,
            g_ema=update_ema(cfg, state.g_ema, params_g, state.step))
        metrics = {
            "d_loss": it["d_loss"][-1], "g_loss": g_loss,
            "gp": it["gp"][-1], "wdist": it["wdist"][-1],
            "gen_hist": tile_histogram(decode(fake), m.n_tiles),
        }
        if pres is not None:
            metrics["presence"] = pres
        if cmatch is not None:
            metrics["cond_match"] = cmatch
        return new_state, metrics

    return step_fn
