"""Trace-derived per-op profile of a preset's train step (SURVEY.md §5.1).

Captures a ``jax.profiler`` trace around ONE warm multi-step dispatch block
(the shipped api.train cadence), converts the xplane with
tensorboard_plugin_profile, and writes a distilled per-op table:

    artifacts/profile_<preset>[_pallas].json   (top ops, times, utilization)
    artifacts/profile_<preset>[_pallas].md     (human table)

This is the data that arbitrates Pallas-vs-XLA (VERDICT.md round-1 items
1/7): where a step's milliseconds actually go, per HLO op category, with
the K1/K2 named_scope annotations visible in op names.

Usage: python -m tools.profile_step --preset gumbel_64 [--set model.use_pallas=true]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import tempfile
import time

import numpy as np


def capture(name: str, k: int, overrides: dict | None):
    import jax

    from levelgan.api import (corpus_array, make_dataset,
                              make_device_feed_step, make_multi_step_device,
                              make_state, make_step_fn)
    from levelgan.config import preset
    from levelgan.dist.mesh import make_mesh, replicated_sharding

    cfg = preset(name)
    if overrides:
        cfg = cfg.override(**overrides)
    mesh = make_mesh(cfg.dist.dp)
    repl = replicated_sharding(mesh)
    ds = make_dataset(cfg)
    step_fn, kind = make_step_fn(cfg)
    state = jax.jit(lambda key: make_state(cfg, key), out_shardings=repl)(
        jax.random.key(0))
    corpus_dev = jax.device_put(corpus_array(ds), repl)
    fed = make_device_feed_step(cfg, step_fn, kind, mesh)
    multi = jax.jit(make_multi_step_device(fed, k), donate_argnums=(0,),
                    in_shardings=(repl, repl))

    def sync(metrics):
        return float(np.asarray(metrics["d_loss"]).ravel()[-1])

    state, metrics = multi(state, corpus_dev)   # compile + warm
    sync(metrics)

    tmp = tempfile.mkdtemp(prefix="levelgan_trace_")
    jax.profiler.start_trace(tmp)
    t0 = time.perf_counter()
    state, metrics = multi(state, corpus_dev)
    sync(metrics)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    return tmp, wall, k


def xplane_paths(trace_dir: str):
    return sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))


def distill(trace_dir: str):
    """xplane -> {tool: parsed json} for the tools we can get."""
    # The baked-in tensorboard_plugin_profile ships _pb2.py files generated
    # by an older protoc than the installed runtime accepts with the C++
    # backend; the documented workaround is the pure-Python implementation
    # (slower parse, same output). Must be set before the first *_pb2 import.
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    paths = xplane_paths(trace_dir)
    if not paths:
        raise RuntimeError(f"no xplane.pb under {trace_dir}")
    out = {}
    for tool in ("op_profile", "framework_op_stats", "hlo_op_stats",
                 "overview_page"):
        for suffix in ("^", ""):
            try:
                data, _ = raw_to_tool_data.xspace_to_tool_data(
                    paths, tool + suffix, params={"tqx": "out:json;"})
                if isinstance(data, bytes):
                    data = data.decode("utf-8", "replace")
                try:
                    out[tool] = json.loads(data)
                except Exception:
                    out[tool] = data
                break
            except Exception:
                continue
    return out


def op_table(tools: dict, top: int = 25):
    """Distill a ranked per-op table from whichever tool converted."""
    rows = []
    op = tools.get("op_profile")
    if isinstance(op, dict):
        # op_profile: nested byCategory tree with metrics.{time,flops}
        root = (op.get("byCategory") or op.get("by_category") or {})
        total_ps = (root.get("metrics") or {}).get("rawTime", 0)

        def walk(node, cat):
            ch = node.get("children") or []
            if not ch:
                m = node.get("metrics") or {}
                rows.append({
                    "name": node.get("name", "?"), "category": cat,
                    "time_frac": m.get("time", 0.0),
                    "flops_util": m.get("flops", 0.0),
                })
                return
            for c in ch:
                walk(c, cat or node.get("name", ""))
        for c in root.get("children") or []:
            walk(c, c.get("name", ""))
        rows.sort(key=lambda r: -r["time_frac"])
        return rows[:top], total_ps
    return rows, 0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="gumbel_64")
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    ap.add_argument("--out-dir", default="artifacts")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args(argv)

    from levelgan.cli.train import parse_overrides
    overrides = parse_overrides(args.set)
    suffix = "_pallas" if str(
        overrides.get("model.use_pallas", "")).lower() == "true" else ""

    trace_dir, wall, k = capture(args.preset, args.k, overrides)
    print(f"[profile] traced {args.preset}{suffix}: {wall * 1e3 / k:.3f} "
          f"ms/step over {k} steps; trace at {trace_dir}")
    tools = distill(trace_dir)
    rows, total_ps = op_table(tools, args.top)

    os.makedirs(args.out_dir, exist_ok=True)
    base = os.path.join(args.out_dir, f"profile_{args.preset}{suffix}")
    with open(base + ".json", "w") as f:
        json.dump({"preset": args.preset, "overrides": overrides,
                   "ms_per_step_walled": wall * 1e3 / k,
                   "steps_per_dispatch": k,
                   "total_device_ps": total_ps,
                   "top_ops": rows,
                   "tools_available": sorted(tools)}, f, indent=1)
    with open(base + ".md", "w") as f:
        f.write(f"# Trace profile: {args.preset}{suffix}\n\n")
        f.write(f"- wall: {wall * 1e3 / k:.3f} ms/step (K={k} dispatch, "
                f"hard sync)\n- overrides: {overrides}\n\n")
        f.write("| op | category | device-time frac | MXU util |\n")
        f.write("|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['name'][:70]} | {r['category']} | "
                    f"{r['time_frac']:.4f} | {r['flops_util']:.3f} |\n")
    print(f"[profile] wrote {base}.json / .md "
          f"({len(rows)} ops, tools={sorted(tools)})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
