#!/bin/bash
# Round-5 all-gates regeneration under the round-5 semantics (VERDICT r4
# item 2 done-bar): same six shipped checkpoints as round 4 PLUS the new
# curriculum_16_joint preset checkpoint.  Chunked per checkpoint (the dev
# relay's ~590s process window) and merged into one rollup; any newly
# exposed red is either fixed or stands as an honest open item.
set -x
cd /root/repo
i=0
for ckpt in runs/wgan_base runs/gumbel_soak20k runs/conditional_projboost \
            runs/cur_f7 runs/track_cim runs/race_curriculum_32 \
            runs/curriculum_16_joint; do
  i=$((i+1))
  if [ ! -f artifacts/gates_part_$i.json ]; then
    timeout 580 python -m tools.gate_all --runs $ckpt \
      --out artifacts/gates_part_$i.json 2>> runs/gates_all_r5.log
  fi
done
python - <<'EOF'
import glob, json
rows, meta = [], {}
for p in sorted(glob.glob("artifacts/gates_part_*.json"),
                key=lambda s: int(s.split("_")[-1].split(".")[0])):
    part = json.load(open(p))
    meta = {"n": part["n"], "seed": part["seed"]}
    rows.extend(part["checkpoints"])
roll = {**meta, "checkpoints": rows,
        "passed": all(r["passed"] for r in rows)}
roll["informative_failures"] = sorted(
    f"{r['ckpt']}:{k}" for r in rows
    for k in r.get("informative_failures", ()))
roll["informative_failure_count"] = len(roll["informative_failures"])
with open("artifacts/gates_all.json", "w") as f:
    json.dump(roll, f, indent=2)
print("merged", len(rows), "checkpoints; passed =", roll["passed"],
      "; informative failures =", roll["informative_failure_count"])
EOF
echo ROUND5_GATES_DONE
