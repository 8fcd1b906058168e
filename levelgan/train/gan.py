"""Vanilla (non-saturating) GAN train step — config 1 (toy DCGAN).

Reference equivalent: the eager alternating G/D loop with BCE losses
(SURVEY.md §3.1, R4).  TPU-first: the ENTIRE step — on-device augment +
one-hot encode, D update, G update, metrics — is one jit-compiled pure
function ``(state, batch_ids, ...) -> (state, metrics)``; the host loop only
feeds uint8 ids and logs.  Under a data mesh the batch arrives sharded on
'data' and XLA inserts the ICI gradient allreduce automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from levelgan.config import Config
from levelgan.data.augment import augment
from levelgan.data.codec import decode, encode
from levelgan.data.features import level_features
from levelgan.lio.metrics import tile_histogram
from levelgan.models import Critic, Generator, sample_head
from levelgan.ops.gumbel import tau_schedule
from levelgan.train.state import GANState, make_optimizers, update_ema


def prepare_real(cfg: Config, key, batch_ids):
    """On-device: (augment) -> features -> one-hot encode."""
    ids = augment(key, batch_ids) if cfg.data.augment else batch_ids
    cond = level_features(ids) if cfg.model.cond_dim else None
    real = encode(ids, cfg.model.n_tiles, dtype=jnp.float32)
    return real, cond


def current_tau(cfg: Config, step):
    m = cfg.model
    return tau_schedule(step, m.tau_start, m.tau_end, m.tau_anneal_steps)


@functools.lru_cache(maxsize=8)
def corpus_cond_scale(cfg: Config):
    """Static per-dim feature scale for the cond-match loss.

    Advisor r3: the per-batch ``cond.std(axis=0)`` with a 1e-3 floor let a
    near-constant batch dim (small batch / degenerate corpus feature)
    inflate that dim's squared residual by up to ~1e6, so w_cond_match
    could dominate the G loss.  The CORPUS-wide std is a build-time
    constant — same expected magnitude as the batch std (the round-3
    w_cond_match=4 calibration carries over) with zero batch dependence.
    lru_cached per config and extracted in bounded batches (advisor r4:
    the uncached whole-corpus jit ran at every gan/wgan step build and
    duplicated the training dataset's memory); float32 [cond_dim].
    """
    import numpy as np

    from levelgan.data.dataset import LevelDataset
    from levelgan.data.features import batched_features

    ds = LevelDataset.from_config(cfg.data, cfg.model, seed=cfg.train.seed)
    feats = batched_features(level_features, np.asarray(ds.levels))
    scale = np.maximum(feats.std(axis=0), 1e-3)
    if cfg.train.cond_match_dim_weights:
        # per-dim residual multipliers (round 4) folded into the static
        # scale: residual/(scale/sqrt(w)) == w * residual^2 / scale^2
        w = np.array([float(x) for x in
                      cfg.train.cond_match_dim_weights.split(",")], np.float64)
        if w.size != scale.size:
            raise ValueError(
                f"train.cond_match_dim_weights needs {scale.size} values, "
                f"got {w.size}")
        scale = scale / np.sqrt(np.maximum(w, 1e-9))
    return jnp.asarray(scale, jnp.float32)


def make_gan_step(cfg: Config):
    """Build the jit-able vanilla GAN step. Batch: uint8 ids [B, H, W]."""
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
    label_smooth = 0.9  # soft real targets for D (standard DCGAN stabilizer)

    def g_sample(params_g, key, z, cond, step):
        logits = gen.apply({"params": params_g}, z, cond)
        tau = current_tau(cfg, step)
        return sample_head(key, logits, m.head, tau,
                           structural=m.structural_head)

    def step_fn(state: GANState, batch_ids: jax.Array):
        base = jax.random.fold_in(state.rng, state.step)
        k_aug, k_z1, k_s1, k_z2, k_s2 = jax.random.split(base, 5)
        bsz = batch_ids.shape[0]

        real, cond = prepare_real(cfg, k_aug, batch_ids)

        # --- D update -------------------------------------------------------
        z1 = jax.random.normal(k_z1, (bsz, m.latent_dim), jnp.float32)
        fake = jax.lax.stop_gradient(
            g_sample(state.generator, k_s1, z1, cond, state.step))

        def d_loss_fn(params_d):
            d_real = critic.apply({"params": params_d}, real, cond)
            d_fake = critic.apply({"params": params_d}, fake, cond)
            loss = (optax.sigmoid_binary_cross_entropy(
                        d_real, jnp.full_like(d_real, label_smooth)).mean()
                    + optax.sigmoid_binary_cross_entropy(
                        d_fake, jnp.zeros_like(d_fake)).mean())
            if t.r1_gamma > 0:
                # R1 regularizer (Mescheder et al. 2018): penalize D's
                # gradient on REALS. The reference's plain BCE GAN
                # oscillates on discrete tile data (BASELINE.md config-1
                # row); R1 is the standard fix. Off by default (0.0) so the
                # reference-default run stays loss-identical. Sum trick as
                # in ops.grad_penalty: per-sample scores are independent.
                def d_sum(x):
                    return critic.apply(
                        {"params": params_d}, x, cond).astype(
                            jnp.float32).sum()
                g = jax.grad(d_sum)(real)
                r1 = jnp.mean(jnp.sum(
                    jnp.square(g.astype(jnp.float32)),
                    axis=tuple(range(1, g.ndim))))
                loss = loss + 0.5 * t.r1_gamma * r1
            return loss, (d_real.mean(), d_fake.mean())

        (d_loss, (dr, df)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.discriminator)
        d_updates, opt_d = tx_d.update(d_grads, state.opt_d, state.discriminator)
        params_d = optax.apply_updates(state.discriminator, d_updates)

        # --- G update -------------------------------------------------------
        z2 = jax.random.normal(k_z2, (bsz, m.latent_dim), jnp.float32)

        def g_loss_fn(params_g):
            logits2 = gen.apply({"params": params_g}, z2, cond)
            fake2 = sample_head(k_s2, logits2, m.head,
                                current_tau(cfg, state.step),
                                structural=m.structural_head)
            d_out = critic.apply({"params": params_d}, fake2, cond)
            loss = optax.sigmoid_binary_cross_entropy(
                d_out, jnp.ones_like(d_out)).mean()
            pres = None
            if t.w_presence:
                # structural-tile presence prior (ops/presence.py)
                from levelgan.ops.presence import presence_penalty
                pres = presence_penalty(fake2, w_spread=t.presence_spread,
                                        w_excess=t.presence_excess)
                loss = loss + t.w_presence * pres
            cmatch = None
            if t.w_cond_match:
                # feature-matching conditioning loss on the EXPECTED
                # features (softmax marginal — see train/wgan_gp.py for
                # the measured ST-gradient failure this avoids)
                from levelgan.data.features import soft_level_features
                probs2 = jax.nn.softmax(logits2, axis=-1)
                # standardize per dim by the CORPUS feature spread (static,
                # corpus_cond_scale): hazard/coin corpus ranges are ~2% of
                # the grid, so a raw-scale MSE is ~1e-4 — invisible next to
                # the O(1) adversarial term (measured: those dims stayed
                # flat at w=10, artifacts/eval_cond_32_cm2.json);
                # unit-variance residuals give every dim comparable
                # gradient, and the static scale cannot be inflated by a
                # degenerate batch (advisor r3).
                cmatch = jnp.square(
                    (soft_level_features(probs2) - cond) / cond_scale).mean()
                loss = loss + t.w_cond_match * cmatch
            return loss, (fake2, pres, cmatch)

        (g_loss, (fake2, pres, cmatch)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.generator)
        g_updates, opt_g = tx_g.update(g_grads, state.opt_g, state.generator)
        params_g = optax.apply_updates(state.generator, g_updates)

        new_state = state.replace(
            step=state.step + 1, generator=params_g, discriminator=params_d,
            opt_g=opt_g, opt_d=opt_d,
            g_ema=update_ema(cfg, state.g_ema, params_g, state.step))
        metrics = {
            "d_loss": d_loss, "g_loss": g_loss,
            "d_real": dr, "d_fake": df,
            "gen_hist": tile_histogram(decode(fake2), m.n_tiles),
        }
        if pres is not None:
            metrics["presence"] = pres
        if cmatch is not None:
            metrics["cond_match"] = cmatch
        return new_state, metrics

    return step_fn
