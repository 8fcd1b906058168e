#!/bin/bash
# Round-5 addendum: f7 separation failed to replicate at seed 2
# (+0.209/+0.198/-0.008) — two more seeds so the headline joint claim
# rests on n=5 with an honest spread.
set -x
cd /root/repo
F7="--preset curriculum_16_joint --set train.steps=3000 --set train.steps_per_dispatch=50 --set io.log_every=500"
for s in 3 4; do
  if [ ! -f runs/cur_f7_s$s/ckpt/step_00003000/manifest.json ]; then
    timeout 580 python -m levelgan.cli.train $F7 --set train.seed=$s \
      --set io.out_dir=runs/cur_f7_s$s > runs/cur_f7_s${s}_train.log 2>&1
  fi
  if [ ! -f artifacts/quality_cur_f7_s$s.json ]; then
    timeout 580 python -m tools.eval_quality --ckpt runs/cur_f7_s$s --n 1024 \
      --out artifacts/quality_cur_f7_s$s.json > runs/cur_f7_s${s}_eval.log 2>&1
  fi
done
echo ROUND5_F7_SEEDS_DONE
