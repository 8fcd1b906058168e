"""levelgan — a TPU-native game-level GAN framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
``Grzego/game-level-gan`` (see SURVEY.md; reference mount empty — BASELINE.json
is the binding spec).  The compute path is jit-compiled XLA with optional
Pallas kernels for the hot ops; parallelism is expressed with
``jax.sharding.Mesh`` + ``NamedSharding`` so single-chip and multi-chip runs
share one code path.

Layer map (SURVEY.md §1.2):
  levelgan.kernels   — Pallas TPU kernels (fused upsample block, GP penalty)
  levelgan.ops       — pure-XLA ops + fallback twins of every kernel
  levelgan.models    — Flax modules (Generator / Critic / conditioning)
  levelgan.train     — jit-compiled train steps (GAN, WGAN-GP, curriculum)
  levelgan.dist      — mesh / sharding helpers (data parallelism over ICI)
  levelgan.data      — on-device codec + augmentation, synthetic corpus
  levelgan.env       — batched playability sim + policy-gradient agents
  levelgan.lio       — checkpointing, metrics, logging
  levelgan.cli       — train / export entrypoints
"""

__version__ = "0.1.0"

from levelgan.config import Config, preset  # noqa: F401
