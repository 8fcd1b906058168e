"""Worker for the multi-host DP test (SURVEY.md §2.4, §4.2 distributed tier).

Launched by tests/test_multihost.py as either:
  - mode=single: 1 process, 4 local CPU devices
  - mode=multi:  2 processes x 2 local CPU devices, rendezvous via
    jax.distributed.initialize over a localhost coordinator

Both run the identical DP train program (device-resident corpus feed, batch
sharded on the 'data' axis, params replicated) for a few steps and print a
JSON digest of the final params.  The SPMD contract says the digests must
match bit-for-bit: the multi-process run IS the single-process program.
"""

import json
import sys

import jax

mode, n_local, port, pid, nproc = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], int(sys.argv[4]),
    int(sys.argv[5]))

# This environment's sitecustomize latches JAX_PLATFORMS=axon at interpreter
# startup; config.update before first backend use is the only override.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", n_local)
if mode == "multi":
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402

from levelgan import api  # noqa: E402
from levelgan.config import preset  # noqa: E402
from levelgan.dist.mesh import make_mesh, replicated_sharding  # noqa: E402


def main():
    cfg = preset("toy_dcgan_16").override(**{
        "train.steps": 3, "train.batch_size": 16,
        "data.corpus_size": 64, "train.steps_per_dispatch": 1,
    })
    mesh = make_mesh()  # all GLOBAL devices (4 in both modes)
    assert mesh.devices.size == 4, mesh.devices
    repl = replicated_sharding(mesh)

    step_fn, kind = api.make_step_fn(cfg)
    state = jax.jit(lambda k: api.make_state(cfg, k),
                    out_shardings=repl)(jax.random.key(cfg.train.seed))
    ds = api.make_dataset(cfg)
    corpus_dev = jax.device_put(api.corpus_array(ds), repl)
    fed = api.make_device_feed_step(cfg, step_fn, kind, mesh)
    jit_step = jax.jit(fed, donate_argnums=(0,), in_shardings=(repl, repl))
    for _ in range(cfg.train.steps):
        state, metrics = jit_step(state, corpus_dev)

    # Params are fully replicated -> addressable on every process.
    leaves = jax.tree_util.tree_leaves(jax.device_get(state.generator))
    digest = [float(np.float64(np.asarray(x, np.float64).sum()))
              for x in leaves]
    print("DIGEST " + json.dumps(
        {"pid": pid, "digest": digest,
         "d_loss": float(np.asarray(metrics["d_loss"]))}))


main()
