"""Data-parallel mesh + sharding helpers (SURVEY.md N13, §2.3-2.4).

Reference equivalent: NONE — the reference is single-process single-device.
The TPU-native design: a 1-D ``jax.sharding.Mesh(('data',))``; the global
batch is sharded on 'data', parameters are replicated, and the gradient
allreduce over ICI is emitted by XLA from the sharding annotations — no
hand-written collectives anywhere (scaling-book recipe).  A single chip is a
mesh of size 1: one code path for every scale.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh()`` and
the same program spans hosts (DCN between slices handled by the runtime).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(dist_cfg) -> bool:
    """Multi-host rendezvous (SURVEY.md §2.4): call once before make_mesh.

    Returns True if a multi-host runtime was initialized.  No-op for the
    default single-host config.  After this, ``jax.devices()`` spans all
    hosts' chips, the same jit program runs on every process (SPMD), and
    cross-host collectives ride DCN — no code changes anywhere else.
    """
    if not dist_cfg.coordinator_address:
        return False
    kwargs = dict(coordinator_address=dist_cfg.coordinator_address,
                  num_processes=dist_cfg.num_processes)
    if dist_cfg.process_id >= 0:
        kwargs["process_id"] = dist_cfg.process_id
    jax.distributed.initialize(**kwargs)
    return True


def make_mesh(dp: int = 0, devices=None, tp: int = 1) -> Mesh:
    """('data',) mesh over ``dp`` devices (0 = all visible).

    ``tp > 1`` adds a trailing 'model' axis — the L4 design hook for
    channel/tensor sharding (SURVEY.md §2.3: TP is not built, but the mesh
    must be able to EXPRESS it: a conv kernel sharded
    ``P(None, None, None, 'model')`` + batch ``P('data')`` is a pure
    annotation change on this mesh; XLA inserts the collectives).  With the
    default tp=1 the mesh is effectively 1-D and every existing
    ``P('data')``/``P()`` spec is unchanged.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = dp if dp > 0 else len(devices) // tp
    if n * tp > len(devices):
        raise ValueError(f"requested dp={n} x tp={tp} but only "
                         f"{len(devices)} devices")
    if tp == 1:
        return Mesh(np.asarray(devices[:n]), (DATA_AXIS,))
    return Mesh(np.asarray(devices[:n * tp]).reshape(n, tp),
                (DATA_AXIS, MODEL_AXIS))


def tp_param_sharding(mesh: Mesh, tree):
    """Channel-sharded NamedSharding tree for a params/optimizer pytree.

    The SURVEY.md §2.3 TP hook, end to end: on a mesh with a 'model' axis,
    every weight whose trailing (output-channel) axis divides the axis size
    — conv HWIO kernels, dense (in, out) kernels, and their Adam moments,
    which share the params' shapes — gets ``P(None, ..., 'model')``;
     1-D norm scales/biases, scalars, and RNG keys stay replicated.  XLA's
    GSPMD partitioner reconciles the mix (it is semantics-preserving), so
    this is the *entire* TP implementation: no model or step code changes.
    ``tree`` may be real arrays or ``jax.eval_shape`` structs.
    """
    tp = mesh.shape.get(MODEL_AXIS, 1)

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        if tp > 1 and len(shape) >= 2 and shape[-1] % tp == 0:
            spec = [None] * (len(shape) - 1) + [MODEL_AXIS]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded across 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Put host batch(es) on device, leading axis split across the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
