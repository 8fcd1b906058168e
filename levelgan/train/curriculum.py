"""Agent-in-the-loop adversarial curriculum step — config 5.

Reference equivalent: the reference's signature twist (SURVEY.md R9): levels
are scored by agents that play them, and the generator is trained to produce
levels that are playable AND that separate strong from weak agents, via
REINFORCE on the non-differentiable agent-derived reward.

TPU-first (SURVEY.md §3.4): ONE jit program per step containing
  1. the WGAN-GP critic updates on real levels (realism term; lax.scan),
  2. G's Gumbel-ST level sampling,
  3. both agents' T-step rollouts (lax.scan time loop, vmap over levels),
  4. A2C updates for the strong and weak agents (weak learns slower ->
     persistent skill gap),
  5. the G update with combined loss: adversarial (-D(fake)) + REINFORCE
     (score-function estimator: logp(level) * (reward - EMA baseline)).
Data-parallel over the 'data' mesh axis like every other step; XLA emits the
ICI allreduce for G/D/agent grads alike.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from levelgan import rng
from levelgan.config import Config
from levelgan.data.codec import decode
from levelgan.data.features import level_features
from levelgan.env.agent import agent_update, init_agent, policy_apply
from levelgan.env.sim import EnvParams, rollout
from levelgan.lio.metrics import tile_histogram
from levelgan.models import Critic, Generator, sample_head
from levelgan.ops.grad_penalty import gradient_penalty
from levelgan.train.gan import current_tau
from levelgan.train.wgan_gp import make_critic_scan
from levelgan.train.state import (GANState, create_state, make_optimizers,
                                  update_ema)


@flax.struct.dataclass
class CurriculumState(GANState):
    agent_strong: Any = None
    agent_weak: Any = None
    opt_as: Any = None
    opt_aw: Any = None


def make_agent_optimizers(cfg: Config):
    return (optax.adam(cfg.curriculum.agent_lr),
            optax.adam(cfg.curriculum.weak_agent_lr))


def create_curriculum_state(cfg: Config, key=None) -> CurriculumState:
    if key is None:
        key = rng.key(cfg)
    k_gan, k_as, k_aw = jax.random.split(key, 3)
    base = create_state(cfg, k_gan)
    a_s = init_agent(k_as, cfg.model)
    a_w = init_agent(k_aw, cfg.model)
    tx_s, tx_w = make_agent_optimizers(cfg)
    return CurriculumState(
        **{f: getattr(base, f) for f in GANState.__dataclass_fields__},
        agent_strong=a_s, agent_weak=a_w,
        opt_as=tx_s.init(a_s), opt_aw=tx_w.init(a_w))


def env_params(cfg: Config) -> EnvParams:
    cur = cfg.curriculum
    return EnvParams(rollout_steps=cur.rollout_steps, gamma=cur.gamma)


def make_curriculum_step(cfg: Config):
    """Build the jit-able curriculum step. Batch: uint8 [n_critic, B, H, W]."""
    m, t, cur = cfg.model, cfg.train, cfg.curriculum
    if t.w_closure:
        # loud instead of a silent no-op: grids have no heading to close
        raise ValueError("train.w_closure is track-family only "
                         "(heading-closure prior); tile levels have no "
                         "loop-closure invariant")
    if m.head != "gumbel":
        # The REINFORCE term scores HARD discrete levels; with any other
        # head the critic/gan term would train on soft samples while the
        # agents play discrete ones — two different sample spaces, silently.
        raise ValueError(
            f"curriculum loss requires model.head='gumbel', got '{m.head}'")
    if m.structural_head != "none":
        # The REINFORCE estimator credits per-cell log p(tile | cell) from
        # the channel softmax; the spatial head samples START/GOAL from a
        # per-POSITION categorical instead, so that log-prob would be wrong
        # for the composed sample.  (The curriculum's playability reward is
        # itself the in-training structural pressure for this family.)
        raise ValueError("model.structural_head='spatial' is not supported "
                         "with the curriculum loss (REINFORCE log-prob "
                         "assumes per-cell channel sampling)")
    gen, critic = Generator(m), Critic(m)
    tx_g, tx_d = make_optimizers(cfg)
    if m.use_pallas:
        # stage-(c) fused critic-gradient kernel where supported (the 16x16
        # curriculum critic is), stage-(b) penalty core elsewhere
        from levelgan.kernels.critic_grad import make_gradient_penalty
        gp_impl = make_gradient_penalty(m)
    else:
        gp_impl = gradient_penalty
    tx_s, tx_w = make_agent_optimizers(cfg)
    ep = env_params(cfg)
    critic_scan = make_critic_scan(cfg, gen, critic, tx_d, gp_impl)

    def d_apply(params_d, x, cond):
        return critic.apply({"params": params_d}, x, cond)

    def step_fn(state: CurriculumState, batch_ids: jax.Array):
        n_critic, bsz = batch_ids.shape[0], batch_ids.shape[1]
        base = jax.random.fold_in(state.rng, state.step)
        iter_keys = jax.random.split(jax.random.fold_in(base, 0), n_critic)
        k_zg, k_sg, k_rs, k_rw = jax.random.split(jax.random.fold_in(base, 1), 4)
        tau = current_tau(cfg, state.step)

        # ---- 1. critic updates on real corpus levels (realism term) --------
        # (shared with the plain WGAN-GP step: train/wgan_gp.make_critic_scan)
        params_d, opt_d, it = critic_scan(
            state.generator, state.discriminator, state.opt_d,
            batch_ids, iter_keys, state.step)

        # ---- 2. G samples a batch of discrete levels -----------------------
        # Condition features are D4-invariant; like the WGAN-GP step, take
        # them from the last (un-augmented) real minibatch when conditioning.
        cond_g = level_features(batch_ids[-1]) if m.cond_dim else None
        z = jax.random.normal(k_zg, (bsz, m.latent_dim), jnp.float32)
        # ONE generator forward serves both the level sampling (step 2) and
        # the G update (step 5): capture its VJP here and pull the loss
        # gradient back through it, instead of re-running the identical
        # forward inside a value_and_grad over params.
        logits, g_vjp = jax.vjp(
            lambda pg: gen.apply({"params": pg}, z, cond_g), state.generator)
        levels_soft = jax.lax.stop_gradient(
            sample_head(k_sg, logits, "gumbel", tau))
        level_ids = decode(levels_soft)
        # hard=True Gumbel-ST already emits a one-hot forward value, so the
        # one-hot tensor IS the sample (no re-encode round trip)
        level_onehot = levels_soft.astype(jnp.float32)

        # ---- 3. both agents play the levels --------------------------------
        traj_s = rollout(policy_apply, state.agent_strong, level_ids,
                         level_onehot, k_rs, ep)
        traj_w = rollout(policy_apply, state.agent_weak, level_ids,
                         level_onehot, k_rw, ep)

        # ---- 4. agent updates (A2C replay; cfg'd number of passes) ---------
        def multi_agent_update(params, opt, tx, traj):
            aux = None
            for _ in range(max(1, cur.agent_updates_per_step)):
                params, opt, _, aux = agent_update(
                    params, opt, tx, level_onehot, traj, cur)
            return params, opt, aux

        a_s, opt_as, s_aux = multi_agent_update(
            state.agent_strong, state.opt_as, tx_s, traj_s)
        a_w, opt_aw, _ = multi_agent_update(
            state.agent_weak, state.opt_aw, tx_w, traj_w)

        # ---- 5. generator update: adversarial + curriculum REINFORCE -------
        play_s = traj_s.reached.astype(jnp.float32)
        play_w = traj_w.reached.astype(jnp.float32)
        gap = traj_s.total_return - traj_w.total_return
        sol = None
        if cur.w_solvable or cur.gap_on_solvable:
            # exact, variance-free playability signal alongside the noisy
            # agent terms (env/solver.py; traced only when enabled — the
            # while_loop costs nothing in the default reward)
            from levelgan.env.solver import solvable
            sol = solvable(level_ids).astype(jnp.float32)
        # round-4 frontier lever: earn the gap reward only on levels the
        # exact solver certifies — "solvable-but-discriminating" as a
        # per-level objective, not a post-hoc filter
        gap_term = gap * sol if cur.gap_on_solvable else gap
        level_reward = (cur.w_play * play_s
                        - cur.w_anti * play_w
                        + cur.w_gap * gap_term)
        if cur.w_solvable:
            w_sol = jnp.float32(cur.w_solvable)
            if cur.solvable_target < 1.0:
                # reward ceiling: once the batch is sufficiently solvable
                # the term switches off, so REINFORCE stops trading skill
                # separation for playability the frontier already has
                w_sol = w_sol * (sol.mean()
                                 < cur.solvable_target).astype(jnp.float32)
            level_reward = level_reward + w_sol * sol
        advantage = jax.lax.stop_gradient(level_reward - state.g_baseline)

        credit = None
        if cur.cell_credit:
            # Per-cell credit: weight each cell's logp by where the
            # episodes actually went (both agents' visitation, dilated one
            # cell so bumped-into walls/hazards on the path boundary get
            # credit too — the agent never *occupies* the wall that blocks
            # it).  Normalized to mean 1 over cells so the rl_term scale
            # matches the uniform whole-level estimator it replaces.
            hsz = m.level_size

            def visit_map(traj):
                flat = traj.pos[..., 0] * hsz + traj.pos[..., 1]   # [T, B]
                oh = jax.nn.one_hot(flat, hsz * hsz, dtype=jnp.float32)
                return oh.sum(0).reshape(bsz, hsz, hsz)

            visit = ((visit_map(traj_s) + visit_map(traj_w)) > 0
                     ).astype(jnp.float32)
            dilated = jax.lax.reduce_window(
                visit, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME")
            credit = jax.lax.stop_gradient(
                dilated * (hsz * hsz)
                / (dilated.sum(axis=(1, 2), keepdims=True) + 1e-6))

        def g_loss_fn(lg):
            fake = sample_head(k_sg, lg, m.head, tau)
            gan_term = -d_apply(params_d, fake, cond_g).mean()
            # score-function estimator on the same sampled levels
            logp_map = jax.nn.log_softmax(lg, axis=-1)
            logp_cell = jnp.sum(logp_map * levels_soft, axis=-1)  # [B, H, W]
            if credit is not None:
                logp = jnp.sum(logp_cell * credit, axis=(1, 2))
            else:
                logp = jnp.sum(logp_cell, axis=(1, 2))
            rl_term = -(advantage * logp).mean() / (m.level_size ** 2)
            loss = gan_term + rl_term
            pres = None
            if t.w_presence:
                # structural-tile presence prior (ops/presence.py): direct
                # pathwise gradient alongside the score-function terms
                from levelgan.ops.presence import presence_penalty
                pres = presence_penalty(fake, w_spread=t.presence_spread,
                                        w_excess=t.presence_excess)
                loss = loss + t.w_presence * pres
            return loss, (gan_term, rl_term, pres)

        (g_loss, (gan_term, rl_term, pres)), g_logits = jax.value_and_grad(
            g_loss_fn, has_aux=True)(logits)
        (g_grads,) = g_vjp(g_logits)
        g_updates, opt_g = tx_g.update(g_grads, state.opt_g, state.generator)
        params_g = optax.apply_updates(state.generator, g_updates)

        baseline = (cur.g_baseline_decay * state.g_baseline
                    + (1 - cur.g_baseline_decay) * level_reward.mean())

        new_state = state.replace(
            step=state.step + 1, generator=params_g, discriminator=params_d,
            opt_g=opt_g, opt_d=opt_d, g_baseline=baseline,
            g_ema=update_ema(cfg, state.g_ema, params_g, state.step),
            agent_strong=a_s, agent_weak=a_w, opt_as=opt_as, opt_aw=opt_aw)
        metrics = {
            "d_loss": it["d_loss"][-1], "gp": it["gp"][-1],
            "wdist": it["wdist"][-1], "g_loss": g_loss,
            "g_gan": gan_term, "g_rl": rl_term,
            "playability": play_s.mean(), "playability_weak": play_w.mean(),
            "return_strong": traj_s.total_return.mean(),
            "return_weak": traj_w.total_return.mean(),
            "skill_gap": (traj_s.total_return - traj_w.total_return).mean(),
            "agent_entropy": s_aux["entropy"], "tau": tau,
            "gen_hist": tile_histogram(level_ids, m.n_tiles),
        }
        if sol is not None:
            metrics["solvable_frac"] = sol.mean()
        if pres is not None:
            metrics["presence"] = pres
        return new_state, metrics

    return step_fn
