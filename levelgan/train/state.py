"""Train state: one immutable pytree carried through the jit step.

Reference equivalent: scattered torch Modules + two Adam optimizers + a step
counter (SURVEY.md R1/R11).  Here: a single ``flax.struct`` dataclass so the
whole training state is a pytree — donate-able, shardable, checkpointable as
one tree with the reference checkpoint key layout (generator / discriminator
/ opt_g / opt_d / step / rng).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from levelgan import rng
from levelgan.config import Config
from levelgan.models import Critic, Generator


@flax.struct.dataclass
class GANState:
    step: jax.Array                 # i32 scalar
    rng: jax.Array                  # root PRNG key; per-step keys fold in step
    generator: Any                  # G params pytree
    discriminator: Any              # D/critic params pytree
    opt_g: Any                      # optax state
    opt_d: Any
    g_baseline: jax.Array = flax.struct.field(default_factory=lambda: jnp.zeros(()))
    g_ema: Any = None               # EMA of G params (export/eval weights)


def make_optimizers(cfg: Config):
    t = cfg.train

    def lr(base, updates_per_step=1):
        if t.lr_schedule == "cosine":
            # optax schedules count OPTIMIZER updates, not train steps: the
            # critic updates n_critic times per step under wgan_gp/curriculum,
            # so its decay horizon must be scaled or it would bottom out
            # after steps/n_critic train steps.
            return optax.cosine_decay_schedule(
                base, t.steps * updates_per_step, alpha=0.01)
        if t.lr_schedule == "none":
            return base
        raise ValueError(f"unknown lr_schedule '{t.lr_schedule}'")

    d_updates = t.n_critic if t.loss in ("wgan_gp", "curriculum") else 1
    tx_g = optax.adam(lr(t.lr_g), b1=t.beta1, b2=t.beta2)
    tx_d = optax.adam(lr(t.lr_d, d_updates), b1=t.beta1, b2=t.beta2)
    return tx_g, tx_d


def create_state(cfg: Config, key: jax.Array | None = None) -> GANState:
    """Initialize params + optimizer state. Call under jit/sharding for
    on-device init (api.train does)."""
    if key is None:
        key = rng.key(cfg)
    k_g, k_d, k_root = jax.random.split(key, 3)
    m = cfg.model
    gen, critic = Generator(m), Critic(m)
    z = jnp.zeros((2, m.latent_dim), jnp.float32)
    x = jnp.zeros((2, m.level_size, m.level_size, m.n_tiles), jnp.float32)
    cond = jnp.zeros((2, m.cond_dim), jnp.float32) if m.cond_dim else None
    params_g = gen.init(k_g, z, cond)["params"]
    params_d = critic.init(k_d, x, cond)["params"]
    tx_g, tx_d = make_optimizers(cfg)
    return GANState(
        step=jnp.zeros((), jnp.int32),
        rng=k_root,
        generator=params_g,
        discriminator=params_d,
        opt_g=tx_g.init(params_g),
        opt_d=tx_d.init(params_d),
        g_ema=params_g,
    )


def update_ema(cfg: Config, ema, params, step):
    """EMA of generator params (export/eval weights; classic GAN
    stabilizer — the raw generator oscillates late in adversarial
    training, its EMA doesn't).  Decay warms up as
    min(ema_decay, (1+step)/(10+step)) so short runs track the live
    params instead of the init."""
    d_max = cfg.train.ema_decay
    if not d_max:
        return params
    step = step.astype(jnp.float32)
    d = jnp.minimum(d_max, (1.0 + step) / (10.0 + step))
    return jax.tree_util.tree_map(
        lambda e, p: d * e + (1.0 - d) * p, ema, params)


def eval_generator_params(state):
    """The parameters to export/evaluate with (EMA if tracked)."""
    return state.g_ema if state.g_ema is not None else state.generator


def param_count(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
