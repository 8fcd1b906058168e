"""Convert a reference-layout torch .pt back into a levelgan checkpoint.

Inverse of ``tools/export_torch_ckpt``: consumes a ``torch.save`` dict with
the reference key layout — generator/discriminator/optim_g/optim_d/step/
config (+ agent_strong/agent_weak for curriculum states) — and writes a
levelgan checkpoint directory that ``--resume``/the export CLI load
directly (SURVEY.md R11/§5.4: the checkpoint format is part of the matched
API surface, both directions).

Fields the .pt format does not carry are synthesized: the PRNG key is
re-seeded from ``config.train.seed``, the generator EMA is initialized to
the imported generator weights, and (curriculum) agent optimizer state is
freshly initialized.  Parameters, optimizer state, and the step counter
round-trip exactly.

Usage: python -m tools.import_torch_ckpt <in.pt> <ckpt_parent_dir>
Writes <ckpt_parent_dir>/step_XXXXXXXX and prints its path.
"""

from __future__ import annotations

import sys

import numpy as np

from levelgan import rng


def convert(pt_path: str, out_dir: str) -> str:
    import torch

    import jax
    try:
        # Host-side tool: eager state init through the TPU relay would pay
        # the ~28ms dispatch round trip per op; the CPU backend is instant.
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized by the embedding process
    from levelgan.api import make_state
    from levelgan.config import Config
    from levelgan.lio.checkpoint import (flat_to_state, save_checkpoint,
                                         state_to_flat)

    payload = torch.load(pt_path, map_location="cpu", weights_only=False)
    cfg = Config.from_dict(payload["config"])

    # Example state provides the pytree structure AND fresh defaults for
    # anything the .pt layout does not carry (rng, g_ema, agent optimizers).
    example = jax.device_get(make_state(cfg, rng.key(cfg)))
    flat = state_to_flat(example)

    def add(prefix: str, node):
        if isinstance(node, dict):
            for k, v in node.items():
                add(f"{prefix}/{k}", v)
            return
        arr = node.numpy() if hasattr(node, "numpy") else np.asarray(node)
        if prefix not in flat:
            raise KeyError(
                f".pt key '{prefix}' does not exist in a "
                f"{cfg.train.loss}/{cfg.model.family} state for this config")
        want = flat[prefix].shape
        if arr.shape != want:
            if arr.size != flat[prefix].size:
                raise ValueError(f".pt key '{prefix}' shape {arr.shape} != "
                                 f"expected {want}")
            arr = arr.reshape(want)  # e.g. () scalars round-tripped as (1,)
        flat[prefix] = arr

    for src, dst in (("generator", "generator"),
                     ("discriminator", "discriminator"),
                     ("optim_g", "opt_g"), ("optim_d", "opt_d"),
                     ("agent_strong", "agent_strong"),
                     ("agent_weak", "agent_weak")):
        if src in payload:
            add(dst, payload[src])
    flat["step"] = np.asarray(int(payload["step"]), np.int32)

    state = flat_to_state(example, flat)
    state = state.replace(g_ema=state.generator)
    return save_checkpoint(out_dir, state, cfg)


if __name__ == "__main__":
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    print(f"wrote {convert(sys.argv[1], sys.argv[2])}")
