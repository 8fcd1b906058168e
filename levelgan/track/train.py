"""Track-family train steps: WGAN-GP on segment sequences + race curriculum.

Reference equivalent: the race-track training loop — generator emits
tracks, agents race them, generator rewarded for drivable, skill-separating
tracks (SURVEY.md R2/R7/R9).  Same one-jit-program shape as the tile
family; shares GANState / CurriculumState, the optimizers, checkpointing,
and the DP mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from levelgan.config import Config
from levelgan.ops.grad_penalty import gradient_penalty
from levelgan.track.data import KAPPA_MAX, TrackDataset
from levelgan.track.models import TrackCritic, TrackGenerator
from levelgan.track.ops import curvature_hist_device, track_augment
from levelgan.track.race import (RaceParams, driver_apply,
                                 init_driver, race_rollout)
from levelgan.train.curriculum import CurriculumState, make_agent_optimizers
from levelgan.train.state import GANState, make_optimizers, update_ema

EXPLORE_SIGMA = 0.05  # curvature exploration noise for REINFORCE sampling


def race_params(cfg: Config) -> RaceParams:
    return RaceParams(rollout_steps=cfg.curriculum.rollout_steps,
                      gamma=cfg.curriculum.gamma)


def create_track_state(cfg: Config, key=None) -> GANState:
    if key is None:
        key = jax.random.key(cfg.train.seed)
    k_g, k_d, k_root = jax.random.split(key, 3)
    m = cfg.model
    gen, critic = TrackGenerator(m), TrackCritic(m)
    z = jnp.zeros((2, m.latent_dim), jnp.float32)
    x = jnp.zeros((2, m.n_segments, 2), jnp.float32)
    cond = jnp.zeros((2, m.cond_dim), jnp.float32) if m.cond_dim else None
    params_g = gen.init(k_g, z, cond)["params"]
    params_d = critic.init(k_d, x, cond)["params"]
    tx_g, tx_d = make_optimizers(cfg)
    return GANState(step=jnp.zeros((), jnp.int32), rng=k_root,
                    generator=params_g, discriminator=params_d,
                    opt_g=tx_g.init(params_g), opt_d=tx_d.init(params_d),
                    g_ema=params_g)


def create_track_curriculum_state(cfg: Config, key=None) -> CurriculumState:
    if key is None:
        key = jax.random.key(cfg.train.seed)
    k_gan, k_as, k_aw = jax.random.split(key, 3)
    base = create_track_state(cfg, k_gan)
    rp = race_params(cfg)
    a_s, a_w = init_driver(k_as, rp), init_driver(k_aw, rp)
    tx_s, tx_w = make_agent_optimizers(cfg)
    return CurriculumState(
        **{f: getattr(base, f) for f in GANState.__dataclass_fields__},
        agent_strong=a_s, agent_weak=a_w,
        opt_as=tx_s.init(a_s), opt_aw=tx_w.init(a_w))


def _prepare_real(cfg: Config, key, batch):
    return track_augment(key, batch) if cfg.data.augment else batch


def make_track_wgan_step(cfg: Config):
    """jit-able WGAN-GP step on tracks. Batch: float32 [n_critic, B, T, 2]."""
    m, t = cfg.model, cfg.train
    gen, critic = TrackGenerator(m), TrackCritic(m)
    tx_g, tx_d = make_optimizers(cfg)

    def d_apply(pd, x, cond):
        return critic.apply({"params": pd}, x, cond)

    def step_fn(state: GANState, batch):
        n_critic, bsz = batch.shape[0], batch.shape[1]
        base = jax.random.fold_in(state.rng, state.step)
        iter_keys = jax.random.split(jax.random.fold_in(base, 0), n_critic)
        k_zg = jax.random.fold_in(base, 1)

        def critic_iter(carry, xs):
            params_d, opt_d = carry
            real_raw, k = xs
            k_aug, k_z, k_eps = jax.random.split(k, 3)
            real = _prepare_real(cfg, k_aug, real_raw)
            z = jax.random.normal(k_z, (bsz, m.latent_dim), jnp.float32)
            fake = jax.lax.stop_gradient(
                gen.apply({"params": state.generator}, z))

            def d_loss_fn(pd):
                wdist = d_apply(pd, real, None).mean() - \
                    d_apply(pd, fake, None).mean()
                gp = gradient_penalty(d_apply, pd, k_eps, real, fake)
                return -wdist + t.gp_lambda * gp, (gp, wdist)

            (d_loss, (gp, wdist)), grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(params_d)
            updates, opt_d = tx_d.update(grads, opt_d, params_d)
            return ((optax.apply_updates(params_d, updates), opt_d),
                    {"d_loss": d_loss, "gp": gp, "wdist": wdist})

        (params_d, opt_d), it = jax.lax.scan(
            critic_iter, (state.discriminator, state.opt_d),
            (batch, iter_keys))

        z = jax.random.normal(k_zg, (bsz, m.latent_dim), jnp.float32)

        def g_loss_fn(pg):
            fake = gen.apply({"params": pg}, z)
            return -d_apply(params_d, fake, None).mean(), fake

        (g_loss, fake), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.generator)
        g_updates, opt_g = tx_g.update(g_grads, state.opt_g, state.generator)

        params_g = optax.apply_updates(state.generator, g_updates)
        new_state = state.replace(
            step=state.step + 1, generator=params_g,
            discriminator=params_d, opt_g=opt_g, opt_d=opt_d,
            g_ema=update_ema(cfg, state.g_ema, params_g, state.step))
        metrics = {
            "d_loss": it["d_loss"][-1], "g_loss": g_loss,
            "gp": it["gp"][-1], "wdist": it["wdist"][-1],
            "gen_hist": curvature_hist_device(fake, TrackDataset.N_BINS),
        }
        return new_state, metrics

    return step_fn


def make_track_curriculum_step(cfg: Config):
    """Race curriculum: WGAN-GP realism + drivers race generated tracks +
    G REINFORCE on drivability/skill-gap reward.
    Batch: float32 [n_critic, B, T, 2]."""
    m, cur = cfg.model, cfg.curriculum
    gen = TrackGenerator(m)
    tx_g, _ = make_optimizers(cfg)
    tx_s, tx_w = make_agent_optimizers(cfg)
    rp = race_params(cfg)
    wgan_step = make_track_wgan_step(cfg)
    from levelgan.env.agent import a2c_loss_from_obs

    def step_fn(state: CurriculumState, batch):
        bsz = batch.shape[1]
        base = jax.random.fold_in(state.rng, state.step)
        k_z, k_expl, k_rs, k_rw = jax.random.split(
            jax.random.fold_in(base, 2), 4)

        # ---- 1. adversarial (realism) updates via the shared WGAN step ----
        gan_state = GANState(
            step=state.step, rng=state.rng, generator=state.generator,
            discriminator=state.discriminator, opt_g=state.opt_g,
            opt_d=state.opt_d, g_baseline=state.g_baseline,
            g_ema=state.g_ema)
        gan_state, gan_metrics = wgan_step(gan_state, batch)

        # ---- 2. sample tracks with exploration noise (REINFORCE) ----------
        z = jax.random.normal(k_z, (bsz, m.latent_dim), jnp.float32)
        mean_tracks = gen.apply({"params": gan_state.generator}, z)
        noise = EXPLORE_SIGMA * jax.random.normal(
            k_expl, mean_tracks[..., 0].shape)
        kappa_s = jnp.clip(mean_tracks[..., 0] + noise,
                           -KAPPA_MAX, KAPPA_MAX)
        tracks = jax.lax.stop_gradient(
            jnp.stack([kappa_s, mean_tracks[..., 1]], axis=-1))

        # ---- 3. both drivers race the sampled tracks ----------------------
        traj_s = race_rollout(driver_apply, state.agent_strong, tracks, k_rs, rp)
        traj_w = race_rollout(driver_apply, state.agent_weak, tracks, k_rw, rp)

        # ---- 4. driver A2C updates ----------------------------------------
        def update_driver(params, opt, tx, traj):
            (loss, aux), grads = jax.value_and_grad(
                a2c_loss_from_obs, has_aux=True)(
                    params, driver_apply, traj.obs, traj.actions,
                    traj.returns, traj.active, cur)
            upd, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, upd), opt, aux

        a_s, opt_as, s_aux = update_driver(
            state.agent_strong, state.opt_as, tx_s, traj_s)
        a_w, opt_aw, _ = update_driver(
            state.agent_weak, state.opt_aw, tx_w, traj_w)

        # ---- 5. G REINFORCE on drivability + skill gap ---------------------
        horizon = rp.rollout_steps * rp.v_max * rp.dt
        drive_s = traj_s.progress / horizon
        drive_w = traj_w.progress / horizon
        reward = (cur.w_play * drive_s - cur.w_anti * drive_w
                  + cur.w_gap * (traj_s.total_return - traj_w.total_return))
        advantage = jax.lax.stop_gradient(reward - state.g_baseline)

        def g_rl_loss(pg):
            mu = gen.apply({"params": pg}, z)[..., 0]
            logp = -0.5 * jnp.sum(
                ((kappa_s - mu) / EXPLORE_SIGMA) ** 2, axis=-1)
            return -(advantage * logp).mean() / m.n_segments

        rl_loss, g_grads = jax.value_and_grad(g_rl_loss)(gan_state.generator)
        g_updates, opt_g = tx_g.update(g_grads, gan_state.opt_g,
                                       gan_state.generator)
        params_g = optax.apply_updates(gan_state.generator, g_updates)
        baseline = (cur.g_baseline_decay * state.g_baseline
                    + (1 - cur.g_baseline_decay) * reward.mean())

        new_state = state.replace(
            step=gan_state.step, generator=params_g,
            discriminator=gan_state.discriminator,
            opt_g=opt_g, opt_d=gan_state.opt_d, g_baseline=baseline,
            g_ema=update_ema(cfg, gan_state.g_ema, params_g, state.step),
            agent_strong=a_s, agent_weak=a_w, opt_as=opt_as, opt_aw=opt_aw)
        metrics = {
            **gan_metrics, "g_rl": rl_loss,
            "drivability": drive_s.mean(), "drivability_weak": drive_w.mean(),
            "skill_gap": (traj_s.total_return - traj_w.total_return).mean(),
            "crashes": traj_s.crashes.mean(),
            "laps": (traj_s.progress / m.n_segments).mean(),
            "agent_entropy": s_aux["entropy"],
        }
        return new_state, metrics

    return step_fn
