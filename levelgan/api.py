"""Public API: ``train(cfg)`` — the train-loop entrypoint (SURVEY.md L7 [NS]).

Reference equivalent: the top-level train script ``main()`` (SURVEY.md R1).
TPU-first shape (SURVEY.md §3.1): the host loop ONLY feeds uint8 tile ids,
logs, and checkpoints; everything else — augment, encode, n_critic critic
updates, GP double-backward, G update, metrics — is inside one jit-compiled
step program, sharded over the data mesh.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P, NamedSharding

from levelgan.config import Config
from levelgan.data.dataset import LevelDataset
from levelgan.dist.mesh import make_mesh, replicated_sharding
from levelgan.lio.checkpoint import (latest_checkpoint, load_checkpoint,
                                     save_checkpoint)
from levelgan.lio.metrics import MetricsLogger, kl_divergence
from levelgan.train.gan import make_gan_step
from levelgan.train.state import create_state, param_count
from levelgan.train.wgan_gp import make_wgan_gp_step


def make_generate_fn(cfg: Config, batch_size: int):
    """jit-compiled batched sampler: (params_g, key, cond) -> uint8 ids.

    Export path (SURVEY.md §3.2): z -> G -> argmax decode, all on-device;
    only the uint8 tile ids cross to host.  This is the levels/sec/chip
    benchmark surface (BASELINE.md).
    """
    from levelgan.data.codec import decode
    from levelgan.models import Generator

    gen = Generator(cfg.model)

    @jax.jit
    def gen_fn(params_g, key, cond=None):
        z = jax.random.normal(key, (batch_size, cfg.model.latent_dim),
                              jnp.float32)
        logits = gen.apply({"params": params_g}, z, cond)
        return decode(logits)

    return gen_fn


def generate(cfg: Config, params_g, n: int, *, seed: int = 0,
             batch_size: int = 1024, cond=None) -> np.ndarray:
    """Generate ``n`` levels as host uint8 [n, H, W]."""
    batch_size = min(batch_size, n)
    gen_fn = make_generate_fn(cfg, batch_size)
    if cond is not None:
        cond = jnp.broadcast_to(jnp.asarray(cond, jnp.float32),
                                (batch_size, cfg.model.cond_dim))
    out = []
    key = jax.random.key(seed)
    for i in range(0, n, batch_size):
        key, sub = jax.random.split(key)
        out.append(np.asarray(gen_fn(params_g, sub, cond)))
    return np.concatenate(out)[:n]


def make_step_fn(cfg: Config):
    if cfg.train.loss == "gan":
        return make_gan_step(cfg), "gan"
    if cfg.train.loss == "wgan_gp":
        return make_wgan_gp_step(cfg), "wgan_gp"
    if cfg.train.loss == "curriculum":
        from levelgan.train.curriculum import make_curriculum_step
        return make_curriculum_step(cfg), "curriculum"
    raise ValueError(f"unknown loss '{cfg.train.loss}'")


def make_state(cfg: Config, key):
    if cfg.train.loss == "curriculum":
        from levelgan.train.curriculum import create_curriculum_state
        return create_curriculum_state(cfg, key)
    return create_state(cfg, key)


def sample_batch(cfg: Config, ds: LevelDataset, kind: str) -> np.ndarray:
    """Host-side: raw uint8 ids in the shape the step consumes."""
    b = cfg.train.batch_size
    if kind in ("wgan_gp", "curriculum"):
        n = cfg.train.n_critic
        flat = ds.sample(n * b)
        return flat.reshape(n, b, *flat.shape[1:])
    return ds.sample(b)


def batch_spec(kind: str) -> P:
    # batch axis is sharded on 'data'; the n_critic super-axis is replicated
    return P(None, "data") if kind in ("wgan_gp", "curriculum") else P("data")


def train(cfg: Config, *, mesh=None, echo: bool = True) -> dict:
    """Run training per ``cfg``; returns a summary dict."""
    mesh = mesh if mesh is not None else make_mesh(cfg.dist.dp)
    n_dev = mesh.devices.size
    if cfg.train.batch_size % n_dev:
        raise ValueError(f"batch_size {cfg.train.batch_size} not divisible by "
                         f"mesh size {n_dev}")

    ds = LevelDataset.from_config(cfg.data, cfg.model, seed=cfg.train.seed)
    ref_hist = ds.tile_histogram(cfg.model.n_tiles)

    step_fn, kind = make_step_fn(cfg)
    repl = replicated_sharding(mesh)
    b_shard = NamedSharding(mesh, batch_spec(kind))

    # on-device, replicated param init (single program, any mesh size)
    state = jax.jit(
        lambda k: make_state(cfg, k), out_shardings=repl)(
            jax.random.key(cfg.train.seed))

    ckpt_dir = f"{cfg.io.out_dir}/ckpt"
    if cfg.io.resume:
        path = (latest_checkpoint(ckpt_dir) if cfg.io.resume == "auto"
                else cfg.io.resume)
        if path:
            state, _ = load_checkpoint(path, jax.device_get(state))
            state = jax.device_put(state, repl)
            if echo:
                print(f"[levelgan] resumed from {path}")
        elif cfg.io.resume != "auto":
            raise FileNotFoundError(f"resume checkpoint not found: {cfg.io.resume}")

    jit_step = jax.jit(step_fn, donate_argnums=(0,),
                       in_shardings=(repl, b_shard), out_shardings=None)

    logger = MetricsLogger(cfg.io.out_dir, echo=echo)
    if echo:
        print(f"[levelgan] preset={cfg.preset} loss={kind} "
              f"mesh={n_dev}x{mesh.devices.flat[0].platform} "
              f"G params={param_count(state.generator):,} "
              f"D params={param_count(state.discriminator):,}")

    # Generated-tile histogram accumulates ON DEVICE (async adds); pulling it
    # to host every step would force a per-step sync and serialize dispatch.
    gen_hist_dev = jnp.zeros(cfg.model.n_tiles, jnp.float32)
    gen_hist = np.zeros(cfg.model.n_tiles, np.float64)
    start_step = int(jax.device_get(state.step))
    t_last = time.monotonic()
    last_metrics: dict = {}
    profiling = False

    for i in range(start_step, cfg.train.steps):
        if cfg.io.profile and i == start_step + 10:
            jax.profiler.start_trace(cfg.io.profile_dir or
                                     f"{cfg.io.out_dir}/profile")
            profiling = True
        batch = jax.device_put(sample_batch(cfg, ds, kind), b_shard)
        state, metrics = jit_step(state, batch)
        if profiling and i == start_step + 20:
            jax.tree_util.tree_map(lambda x: x.block_until_ready(), metrics)
            jax.profiler.stop_trace()
            profiling = False

        gen_hist_dev = gen_hist_dev + metrics.pop("gen_hist")
        if (i + 1) % cfg.io.log_every == 0 or i + 1 == cfg.train.steps:
            metrics = jax.device_get(metrics)
            gen_hist = np.asarray(gen_hist_dev, np.float64)
            now = time.monotonic()
            denom = cfg.io.log_every if (i + 1) % cfg.io.log_every == 0 \
                else (i % cfg.io.log_every) + 1
            kl = float(kl_divergence(gen_hist, ref_hist))
            last_metrics = logger.log(
                i + 1, **metrics, kl=kl,
                step_ms=1e3 * (now - t_last) / denom)
            t_last = now
        if (i + 1) % cfg.io.ckpt_every == 0 and i + 1 < cfg.train.steps:
            save_checkpoint(ckpt_dir, state, cfg, keep=cfg.io.keep_ckpts)

    final_path = save_checkpoint(ckpt_dir, state, cfg, keep=cfg.io.keep_ckpts)
    logger.close()
    return {"state": state, "checkpoint": final_path,
            "metrics": last_metrics,
            "kl": float(kl_divergence(gen_hist, ref_hist)),
            "ref_hist": ref_hist, "gen_hist": gen_hist}
