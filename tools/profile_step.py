"""Trace-derived per-op profile of a preset's train step (SURVEY.md §5.1).

Captures a ``jax.profiler`` trace around ONE warm multi-step dispatch block
(the shipped api.train cadence), parses the raw ``*.xplane.pb`` protobuf
directly (the installed tensorboard_plugin_profile's converter is broken
against this tensorflow build — its pywrap module lacks
``xspace_to_tools_data`` — so we read the TPU device plane's "XLA Ops"
line ourselves), and writes a distilled profile:

    artifacts/profile_<preset>[_pallas].json   (categories, scopes, top ops)
    artifacts/profile_<preset>[_pallas].md     (human tables)

Each XLA-op event carries ``hlo_category``, ``flops``, ``bytes_accessed``
and ``tf_op`` (the jaxpr path, which includes our ``jax.named_scope``
annotations: K1/K1L/K2/rollout_scan), so the output attributes device
milliseconds per step to categories AND to the annotated kernel regions.
This is the data that arbitrates Pallas-vs-XLA (VERDICT.md round-1 items
1/7): where a step's milliseconds actually go.

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

from levelgan import rng


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
        rng.key(cfg, 0))
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


# Regions we attribute time to; FIRST match in the tf_op jaxpr path wins,
# so more specific scopes (our jax.named_scope annotations: K1*/K2*/
# rollout_scan) come before the broad autodiff-path buckets. jax names
# backward ops "transpose(jvp(Module))/...", so critic fwd vs bwd are
# separable. "other" = optimizer, losses, data feed, glue.
SCOPES = ("K1L_conv_fwd", "K1L_gn_act_unfold", "K1L_gn_act_bwd",
          "K1L_conv_bwd", "K1L_dw", "K1_fused", "K1_bwd",
          "K2_critic_grad_fused", "K2_grad_penalty_fused",
          "K2_grad_penalty_pallas", "K2_grad_penalty_xla", "rollout_scan",
          "gumbel_softmax",
          "transpose(jvp(Critic))", "jvp(Critic)", "Critic",
          "transpose(jvp(Generator))", "Generator", "adam")

# TPU v5e peak: ~197 TFLOP/s bf16, ~98.5 TFLOP/s f32 per chip. The trace's
# per-op `flops` stat counts model flops for ONE execution of the op, so
# util = flops * count / (time * peak). We report against the bf16 peak
# (the MXU path every hot matmul here uses).
PEAK_FLOPS = 197e12


def distill(trace_dir: str, top: int = 25):
    """Parse xplane.pb -> {summary, categories, scopes, top_ops}."""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = xplane_paths(trace_dir)
    if not paths:
        raise RuntimeError(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    planes = [p for p in xs.planes if p.name.startswith("/device:TPU")]
    if not planes:
        raise RuntimeError(
            f"no TPU device plane in {paths[-1]} "
            f"(planes: {[p.name for p in xs.planes]})")
    plane = planes[0]
    sm = {k: v.name for k, v in plane.stat_metadata.items()}
    em = plane.event_metadata
    lines = [ln for ln in plane.lines if ln.name == "XLA Ops"]
    if not lines:
        raise RuntimeError(
            f"no 'XLA Ops' line (lines: {[ln.name for ln in plane.lines]})")

    # The XLA Ops line is a containment forest: control-flow ops (while,
    # call) and fusions appear as parent events spanning their children, so
    # naive duration sums over-count ~3x. Attribute SELF time: duration
    # minus nested children, via a stack sweep over (offset, duration).
    # Aggregate per op symbol; metadata stats (category/flops/bytes/tf_op)
    # are per-execution constants.
    evs = sorted(((e.offset_ps, e.duration_ps, e.metadata_id)
                  for e in lines[0].events), key=lambda t: (t[0], -t[1]))
    ops = {}
    stack = []   # (end_ps, metadata_id)
    for off, dur, mid in evs:
        while stack and stack[-1][0] <= off:
            stack.pop()
        rec = ops.get(mid)
        if rec is None:
            md = em[mid]
            st = {}
            for s in md.stats:
                st[sm[s.metadata_id]] = (
                    s.str_value or s.int64_value or s.uint64_value
                    or s.double_value or "")
            rec = ops[mid] = {
                "name": md.display_name or md.name.split(" = ")[0],
                "category": str(st.get("hlo_category", "?")),
                "tf_op": str(st.get("tf_op", "")),
                "flops": int(st.get("flops") or 0),
                "bytes": int(st.get("raw_bytes_accessed")
                             or st.get("bytes_accessed") or 0),
                "time_ps": 0, "count": 0,
            }
        rec["time_ps"] += dur
        rec["count"] += 1
        if stack:   # nested: remove my span from the parent's self time
            ops[stack[-1][1]]["time_ps"] -= dur
        stack.append((off + dur, mid))

    total_ps = sum(r["time_ps"] for r in ops.values())
    # Aggregate arithmetic/traffic over ALL ops (not just the top table):
    # the inputs of the per-preset MFU rollup (VERDICT r4 missing 4).
    total_flops = sum(r["flops"] * r["count"] for r in ops.values())
    total_bytes = sum(r["bytes"] * r["count"] for r in ops.values())
    cats, scopes = {}, {}
    for r in ops.values():
        cats[r["category"]] = cats.get(r["category"], 0) + r["time_ps"]
        hit = "other"
        for s in SCOPES:
            if s in r["tf_op"]:
                hit = s
                break
        scopes[hit] = scopes.get(hit, 0) + r["time_ps"]

    rows = sorted(ops.values(), key=lambda r: -r["time_ps"])[:top]
    for r in rows:
        r["time_frac"] = r["time_ps"] / max(total_ps, 1)
        tot_flops = r["flops"] * r["count"]
        r["flops_util"] = (tot_flops / (r["time_ps"] * 1e-12) / PEAK_FLOPS
                           if r["time_ps"] else 0.0)
        # keep only the scope-bearing tail of the jaxpr path for the table
        r["tf_op"] = r["tf_op"].split("closed_call/")[-1][-90:]
    return {
        "total_device_ps": total_ps,
        "total_flops": total_flops,
        "total_bytes": total_bytes,
        "categories": dict(sorted(cats.items(), key=lambda kv: -kv[1])),
        "scopes": dict(sorted(scopes.items(), key=lambda kv: -kv[1])),
        "top_ops": rows,
        "n_ops": len(ops),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="gumbel_64")
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    ap.add_argument("--out-dir", default="artifacts")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args(argv)

    from tools.bench_all import _enable_compile_cache
    _enable_compile_cache()

    from levelgan.cli.train import parse_overrides
    overrides = parse_overrides(args.set)
    suffix = "_pallas" if str(
        overrides.get("model.use_pallas", "")).lower() == "true" else ""

    trace_dir, wall, k = capture(args.preset, args.k, overrides)
    print(f"[profile] traced {args.preset}{suffix}: {wall * 1e3 / k:.3f} "
          f"ms/step over {k} steps; trace at {trace_dir}")
    prof = distill(trace_dir, args.top)
    ps_to_ms_step = 1e-9 / k   # total over the K-step block -> ms/step

    # Per-preset MFU rollup (VERDICT r4 missing 4): achieved FLOP/s over
    # the step divided by the single-chip peak.  Two denominators:
    # 'device' uses summed per-op self time (compute efficiency of the
    # emitted program), 'wall' includes dispatch/feed gaps (what a user's
    # step actually achieves).  Peak is the bf16 MXU peak (PEAK_FLOPS);
    # the trace's flops stat counts model flops, and any f32 ops in the
    # mix (GroupNorm stats, losses, adam) make the reported MFU
    # CONSERVATIVE relative to a precision-weighted peak.
    flops_step = prof["total_flops"] / k
    dev_s = prof["total_device_ps"] * 1e-12 / k
    wall_s = wall / k
    mfu_device = flops_step / max(dev_s, 1e-12) / PEAK_FLOPS
    mfu_wall = flops_step / max(wall_s, 1e-12) / PEAK_FLOPS

    os.makedirs(args.out_dir, exist_ok=True)
    base = os.path.join(args.out_dir, f"profile_{args.preset}{suffix}")
    with open(base + ".json", "w") as f:
        json.dump({"preset": args.preset, "overrides": overrides,
                   "ms_per_step_wall": wall * 1e3 / k,
                   "ms_per_step_device": prof["total_device_ps"]
                   * ps_to_ms_step,
                   "flops_per_step": flops_step,
                   "bytes_per_step": prof["total_bytes"] / k,
                   "achieved_tflops_device": flops_step / max(dev_s, 1e-12)
                   / 1e12,
                   "peak_tflops_bf16": PEAK_FLOPS / 1e12,
                   "mfu_device": mfu_device, "mfu_wall": mfu_wall,
                   "hbm_gbps_device": prof["total_bytes"] / k
                   / max(dev_s, 1e-12) / 1e9,
                   "steps_per_dispatch": k, "n_ops": prof["n_ops"],
                   "categories_ms_per_step": {
                       c: t * ps_to_ms_step
                       for c, t in prof["categories"].items()},
                   "scopes_ms_per_step": {
                       s: t * ps_to_ms_step
                       for s, t in prof["scopes"].items()},
                   "top_ops": prof["top_ops"]}, f, indent=1)
    with open(base + ".md", "w") as f:
        f.write(f"# Trace profile: {args.preset}{suffix}\n\n")
        f.write(f"- wall: {wall * 1e3 / k:.3f} ms/step (K={k} dispatch, "
                f"hard sync); device: "
                f"{prof['total_device_ps'] * ps_to_ms_step:.3f} ms/step "
                f"over {prof['n_ops']} distinct ops\n"
                f"- overrides: {overrides}\n"
                f"- arithmetic: {flops_step / 1e9:.2f} GFLOP/step, "
                f"{prof['total_bytes'] / k / 1e6:.1f} MB accessed/step -> "
                f"**MFU {mfu_device:.3f} device / {mfu_wall:.3f} wall** "
                f"(vs {PEAK_FLOPS / 1e12:.0f} TF/s bf16 peak; achieved "
                f"{flops_step / max(dev_s, 1e-12) / 1e12:.1f} TF/s, "
                f"HBM {prof['total_bytes'] / k / max(dev_s, 1e-12) / 1e9:.0f}"
                f" GB/s device-time)\n\n")
        f.write("## By HLO category (ms/step)\n\n| category | ms/step |\n"
                "|---|---|\n")
        for c, t in prof["categories"].items():
            f.write(f"| {c} | {t * ps_to_ms_step:.4f} |\n")
        f.write("\n## By named_scope region (ms/step)\n\n"
                "| scope | ms/step |\n|---|---|\n")
        for s, t in prof["scopes"].items():
            f.write(f"| {s} | {t * ps_to_ms_step:.4f} |\n")
        f.write("\n## Top ops\n\n| op | category | ms/step | frac | "
                "MXU util | jaxpr path (tail) |\n|---|---|---|---|---|---|\n")
        for r in prof["top_ops"]:
            f.write(f"| {r['name'][:60]} | {r['category']} | "
                    f"{r['time_ps'] * ps_to_ms_step:.4f} | "
                    f"{r['time_frac']:.3f} | {r['flops_util']:.3f} | "
                    f"{r['tf_op'][-60:]} |\n")
    print(f"[profile] wrote {base}.json / .md")
    print(f"[profile] device {prof['total_device_ps'] * ps_to_ms_step:.3f} "
          f"ms/step; MFU {mfu_device:.3f} device / {mfu_wall:.3f} wall; "
          f"top scopes: "
          + ", ".join(f"{s}={t * ps_to_ms_step:.3f}"
                      for s, t in list(prof["scopes"].items())[:6]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
