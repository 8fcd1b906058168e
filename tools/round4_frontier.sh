#!/bin/bash
# Round-4 frontier sweep (VERDICT item 2): solvability x skill-separation.
# Baseline points (round 3): curriculum_full (w_solvable=2, cell_credit,
# w_presence=10) -> solvable 0.920 / separation -0.168;
# curriculum_16 default -> 0.607 / +0.21.  Each arm: 3000 steps + quality
# eval with skill-gap.  Sequential: the dev TPU is single-tenant.
set -x
cd /root/repo
BASE="--preset curriculum_16 --set train.steps=3000 --set train.w_presence=10 --set curriculum.cell_credit=true --set curriculum.w_solvable=2 --set train.steps_per_dispatch=50 --set io.log_every=500"

# F1: solvable reward ceiling at 0.8
timeout 580 python -m levelgan.cli.train $BASE --set curriculum.solvable_target=0.8 --set io.out_dir=runs/cur_f1 > runs/cur_f1_train.log 2>&1
# F2: gap term gated on solver-certified levels
timeout 580 python -m levelgan.cli.train $BASE --set curriculum.gap_on_solvable=true --set io.out_dir=runs/cur_f2 > runs/cur_f2_train.log 2>&1
# F3: both
timeout 580 python -m levelgan.cli.train $BASE --set curriculum.solvable_target=0.8 --set curriculum.gap_on_solvable=true --set io.out_dir=runs/cur_f3 > runs/cur_f3_train.log 2>&1
# F4: exactly-one prior (multi-START levels are trivially solvable and the
# suspected driver of the separation flip)
timeout 580 python -m levelgan.cli.train $BASE --set train.presence_excess=1 --set io.out_dir=runs/cur_f4 > runs/cur_f4_train.log 2>&1

for f in f1 f2 f3 f4; do
  timeout 580 python -m tools.eval_quality --ckpt runs/cur_$f --n 1024 --out artifacts/quality_cur_$f.json > /dev/null 2>&1
done
echo FRONTIER_DONE
