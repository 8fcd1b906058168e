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

from levelgan import rng
from levelgan.config import Config
from levelgan.ops.grad_penalty import gradient_penalty
from levelgan.track.data import KAPPA_MAX, TrackDataset
from levelgan.track.models import TrackCritic, TrackGenerator
from levelgan.track.ops import (closure_penalty, curvature_hist_device,
                                track_augment, track_features)
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
        key = rng.key(cfg)
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
        key = rng.key(cfg)
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


def make_track_critic_update(cfg: Config):
    """Shared n_critic WGAN-GP critic scan (used by both track steps).

    Returns ``(params_d, opt_d, it_metrics)`` given the current generator.
    Conditioning (model.cond_dim > 0): symmetry-invariant ``track_features``
    of each real minibatch condition both networks, mirroring the tile
    family's wgan_gp step.

    Deliberately NOT merged with ``train.wgan_gp.make_critic_scan``: the
    two differ in per-iter key discipline (3 splits here vs 4 there — no
    sampling-head key for the deterministic track G), and changing either
    stream would break bit-exact resume against existing checkpoints and
    the recorded statistical results.  Keep loss-shape changes in sync.
    """
    m, t = cfg.model, cfg.train
    gen, critic = TrackGenerator(m), TrackCritic(m)
    _, tx_d = make_optimizers(cfg)
    if m.use_pallas:
        # K2's penalty core is shape-agnostic (flattens g to [B, F]), so the
        # flag means the same thing here as in the tile family's steps.
        from levelgan.kernels.gp_penalty import \
            gradient_penalty_pallas as gp_impl
    else:
        gp_impl = gradient_penalty

    def d_apply(pd, x, cond):
        return critic.apply({"params": pd}, x, cond)

    def critic_update(params_g, params_d, opt_d, batch, iter_keys):
        bsz = batch.shape[1]

        def critic_iter(carry, xs):
            params_d, opt_d = carry
            real_raw, k = xs
            k_aug, k_z, k_eps = jax.random.split(k, 3)
            real = _prepare_real(cfg, k_aug, real_raw)
            cond = track_features(real) if m.cond_dim else None
            z = jax.random.normal(k_z, (bsz, m.latent_dim), jnp.float32)
            fake = jax.lax.stop_gradient(
                gen.apply({"params": params_g}, z, cond))

            def d_loss_fn(pd):
                wdist = d_apply(pd, real, cond).mean() - \
                    d_apply(pd, fake, cond).mean()
                gp = gp_impl(d_apply, pd, k_eps, real, fake, cond)
                return -wdist + t.gp_lambda * gp, (gp, wdist)

            (d_loss, (gp, wdist)), grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(params_d)
            updates, opt_d = tx_d.update(grads, opt_d, params_d)
            return ((optax.apply_updates(params_d, updates), opt_d),
                    {"d_loss": d_loss, "gp": gp, "wdist": wdist})

        (params_d, opt_d), it = jax.lax.scan(
            critic_iter, (params_d, opt_d), (batch, iter_keys))
        return params_d, opt_d, it

    return critic_update, d_apply


def make_track_wgan_step(cfg: Config):
    """jit-able WGAN-GP step on tracks. Batch: float32 [n_critic, B, T, 2]."""
    if cfg.train.w_presence:
        # loud instead of a silent no-op: tracks have no tile vocabulary
        raise ValueError("train.w_presence is tile-family only "
                         "(structural-tile presence prior); track tracks "
                         "have no START/GOAL tiles")
    m, t = cfg.model, cfg.train
    gen = TrackGenerator(m)
    tx_g, _ = make_optimizers(cfg)
    critic_update, d_apply = make_track_critic_update(cfg)

    def step_fn(state: GANState, batch):
        n_critic, bsz = batch.shape[0], batch.shape[1]
        base = jax.random.fold_in(state.rng, state.step)
        iter_keys = jax.random.split(jax.random.fold_in(base, 0), n_critic)
        k_zg = jax.random.fold_in(base, 1)

        params_d, opt_d, it = critic_update(
            state.generator, state.discriminator, state.opt_d,
            batch, iter_keys)

        # Condition features are symmetry-invariant; take them from the last
        # (un-augmented) real minibatch, as in the tile wgan_gp step.
        cond_g = track_features(batch[-1]) if m.cond_dim else None
        z = jax.random.normal(k_zg, (bsz, m.latent_dim), jnp.float32)

        def g_loss_fn(pg):
            fake = gen.apply({"params": pg}, z, cond_g)
            loss = -d_apply(params_d, fake, cond_g).mean()
            clos = jnp.zeros(())
            if t.w_closure:
                # heading-closure prior (track/ops.py): pathwise gradient
                # through the tanh-bounded curvature channel
                clos = closure_penalty(fake)
                loss = loss + t.w_closure * clos
            return loss, (fake, clos)

        (g_loss, (fake, clos)), g_grads = jax.value_and_grad(
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
        if t.w_closure:
            metrics["closure"] = clos
        return new_state, metrics

    return step_fn


def make_track_curriculum_step(cfg: Config):
    """Race curriculum: WGAN-GP realism + drivers race generated tracks +
    G update combining the adversarial and REINFORCE terms (drivability /
    skill gap) in ONE optimizer step — the G optimizer chain, LR schedule,
    and EMA each advance exactly once per curriculum step, matching the tile
    curriculum.  Batch: float32 [n_critic, B, T, 2]."""
    m, cur, t = cfg.model, cfg.curriculum, cfg.train
    gen = TrackGenerator(m)
    tx_g, _ = make_optimizers(cfg)
    tx_s, tx_w = make_agent_optimizers(cfg)
    rp = race_params(cfg)
    critic_update, d_apply = make_track_critic_update(cfg)
    from levelgan.env.agent import a2c_loss_from_obs

    def step_fn(state: CurriculumState, batch):
        n_critic, bsz = batch.shape[0], batch.shape[1]
        base = jax.random.fold_in(state.rng, state.step)
        iter_keys = jax.random.split(jax.random.fold_in(base, 0), n_critic)
        k_z, k_expl, k_rs, k_rw = jax.random.split(
            jax.random.fold_in(base, 2), 4)

        # ---- 1. critic (realism) updates via the shared scan --------------
        params_d, opt_d, it = critic_update(
            state.generator, state.discriminator, state.opt_d,
            batch, iter_keys)

        # ---- 2. sample tracks with exploration noise (REINFORCE) ----------
        cond_g = track_features(batch[-1]) if m.cond_dim else None
        z = jax.random.normal(k_z, (bsz, m.latent_dim), jnp.float32)
        # ONE generator forward serves both the track sampling and the G
        # update below (VJP captured here, loss gradient pulled back through
        # it) — no duplicate forward inside a params-space value_and_grad.
        mean_tracks, g_vjp = jax.vjp(
            lambda pg: gen.apply({"params": pg}, z, cond_g), state.generator)
        noise = EXPLORE_SIGMA * jax.random.normal(
            k_expl, mean_tracks[..., 0].shape)
        # The Gaussian policy sample is scored UNCLIPPED (unbiased
        # score-function estimator); the clip to the physical curvature
        # range happens inside the "environment" boundary below.
        kappa_s = mean_tracks[..., 0] + noise
        kappa_env = jnp.clip(kappa_s, -KAPPA_MAX, KAPPA_MAX)
        tracks = jax.lax.stop_gradient(
            jnp.stack([kappa_env, mean_tracks[..., 1]], axis=-1))
        kappa_s = jax.lax.stop_gradient(kappa_s)

        # ---- 3. both drivers race the sampled tracks ----------------------
        traj_s = race_rollout(driver_apply, state.agent_strong, tracks, k_rs, rp)
        traj_w = race_rollout(driver_apply, state.agent_weak, tracks, k_rw, rp)

        # ---- 4. driver A2C updates ----------------------------------------
        def update_driver(params, opt, tx, traj):
            aux = None
            for _ in range(max(1, cur.agent_updates_per_step)):
                (_, aux), grads = jax.value_and_grad(
                    a2c_loss_from_obs, has_aux=True)(
                        params, driver_apply, traj.obs, traj.actions,
                        traj.returns, traj.active, cur)
                upd, opt = tx.update(grads, opt, params)
                params = optax.apply_updates(params, upd)
            return params, opt, aux

        a_s, opt_as, s_aux = update_driver(
            state.agent_strong, state.opt_as, tx_s, traj_s)
        a_w, opt_aw, _ = update_driver(
            state.agent_weak, state.opt_aw, tx_w, traj_w)

        # ---- 5. ONE G update: adversarial + REINFORCE ----------------------
        horizon = rp.rollout_steps * rp.v_max * rp.dt
        drive_s = traj_s.progress / horizon
        drive_w = traj_w.progress / horizon
        reward = (cur.w_play * drive_s - cur.w_anti * drive_w
                  + cur.w_gap * (traj_s.total_return - traj_w.total_return))
        advantage = jax.lax.stop_gradient(reward - state.g_baseline)

        def g_loss_fn(out):
            gan_term = -d_apply(params_d, out, cond_g).mean()
            mu = out[..., 0]
            logp = -0.5 * jnp.sum(
                ((kappa_s - mu) / EXPLORE_SIGMA) ** 2, axis=-1)
            rl_term = -(advantage * logp).mean() / m.n_segments
            loss = gan_term + rl_term
            clos = jnp.zeros(())
            if t.w_closure:
                # heading-closure prior: pathwise term on the mean tracks
                # (the same tensor the VJP below pulls gradients through)
                clos = closure_penalty(out)
                loss = loss + t.w_closure * clos
            return loss, (gan_term, rl_term, clos, out)

        (g_loss, (gan_term, rl_term, clos, fake)), g_out = jax.value_and_grad(
            g_loss_fn, has_aux=True)(mean_tracks)
        (g_grads,) = g_vjp(g_out)
        g_updates, opt_g = tx_g.update(g_grads, state.opt_g, state.generator)
        params_g = optax.apply_updates(state.generator, g_updates)
        baseline = (cur.g_baseline_decay * state.g_baseline
                    + (1 - cur.g_baseline_decay) * reward.mean())

        new_state = state.replace(
            step=state.step + 1, generator=params_g, discriminator=params_d,
            opt_g=opt_g, opt_d=opt_d, g_baseline=baseline,
            g_ema=update_ema(cfg, state.g_ema, params_g, state.step),
            agent_strong=a_s, agent_weak=a_w, opt_as=opt_as, opt_aw=opt_aw)
        metrics = {
            "d_loss": it["d_loss"][-1], "gp": it["gp"][-1],
            "wdist": it["wdist"][-1], "g_loss": g_loss,
            "g_gan": gan_term, "g_rl": rl_term,
            "drivability": drive_s.mean(), "drivability_weak": drive_w.mean(),
            "skill_gap": (traj_s.total_return - traj_w.total_return).mean(),
            "crashes": traj_s.crashes.mean(),
            "laps": (traj_s.progress / m.n_segments).mean(),
            "agent_entropy": s_aux["entropy"],
            "gen_hist": curvature_hist_device(
                jax.lax.stop_gradient(fake), TrackDataset.N_BINS),
        }
        if t.w_closure:
            metrics["closure"] = clos
        return new_state, metrics

    return step_fn
