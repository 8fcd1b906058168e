"""Convert a levelgan checkpoint to a torch-loadable .pt with reference keys.

Reference consumers load ``torch.save`` dicts keyed generator/discriminator/
optim_g/optim_d/step (SURVEY.md R11/§5.4).  This emits exactly that shape
(nested dicts of torch tensors) from a levelgan checkpoint directory.

Usage: python -m tools.export_torch_ckpt <ckpt_dir> <out.pt>
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def flat_to_nested(flat: dict) -> dict:
    out: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out


def convert(ckpt_dir: str, out_path: str) -> dict:
    import torch

    with open(os.path.join(ckpt_dir, "manifest.json")) as f:
        manifest = json.load(f)
    with np.load(os.path.join(ckpt_dir, "arrays.npz")) as z:
        flat = {k: z[k] for k in z.files}

    nested = flat_to_nested(flat)

    def to_torch(node):
        if isinstance(node, dict):
            return {k: to_torch(v) for k, v in node.items()}
        # (the state's rng key is deliberately NOT exported — the importer
        # re-seeds from config — so no uint32 key data reaches this point)
        return torch.from_numpy(np.ascontiguousarray(np.asarray(node)))

    payload = {
        "generator": to_torch(nested.get("generator", {})),
        "discriminator": to_torch(nested.get("discriminator", {})),
        # reference-style optimizer key aliases
        "optim_g": to_torch(nested.get("opt_g", {})),
        "optim_d": to_torch(nested.get("opt_d", {})),
        "step": int(manifest["step"]),
        "config": manifest["config"],
    }
    for extra in ("agent_strong", "agent_weak"):
        if extra in nested:
            payload[extra] = to_torch(nested[extra])
    torch.save(payload, out_path)
    return payload


if __name__ == "__main__":
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    convert(sys.argv[1], sys.argv[2])
    print(f"wrote {sys.argv[2]}")
