#!/bin/bash
# Round-5 seed matrix (VERDICT r4 items 3+4): replicate the decision-bearing
# round-4 claims at >=3 seeds, and train the new curriculum_16_joint preset.
# Arms (all 3000 steps, eval_quality n=1024 with the checkpoint's own agents):
#   joint  : the new curriculum_16_joint preset (== f7 knobs), seed 0
#   f7     : seed 2 (seeds 0,1 exist: runs/cur_f7, runs/cur_f7_s1)
#   f5     : seeds 1,2 (seed 0 exists: runs/cur_f5)
#   default: curriculum_16 reference-shaped reward, seeds 1,2 (seed 0 =
#            runs/curriculum_16, artifacts/quality_curriculum_16_r3.json)
#   race A : race_curriculum_32 closure_in_model=false, seeds 1,2
#   race B : race_curriculum_32 closure_in_model=true, seeds 1,2
# Sequential: the dev TPU is single-tenant.
set -x
cd /root/repo
F7="--preset curriculum_16 --set train.steps=3000 --set train.w_presence=10 --set curriculum.cell_credit=true --set curriculum.w_solvable=2 --set curriculum.solvable_target=0.9 --set curriculum.gap_on_solvable=true --set curriculum.w_gap=5 --set train.steps_per_dispatch=50 --set io.log_every=500"
F5="--preset curriculum_16 --set train.steps=3000 --set train.w_presence=10 --set curriculum.cell_credit=true --set curriculum.w_solvable=2 --set curriculum.solvable_target=0.9 --set curriculum.gap_on_solvable=true --set curriculum.w_gap=3 --set train.steps_per_dispatch=50 --set io.log_every=500"
DEF="--preset curriculum_16 --set train.steps=3000 --set train.steps_per_dispatch=50 --set io.log_every=500"
RC="--preset race_curriculum_32 --set train.steps=3000 --set train.steps_per_dispatch=50 --set io.log_every=500"

run_and_eval () {  # $1 = run name, rest = train args
  local name=$1; shift
  if [ ! -f runs/$name/ckpt/step_00003000/manifest.json ]; then
    timeout 580 python -m levelgan.cli.train "$@" --set io.out_dir=runs/$name > runs/${name}_train.log 2>&1
  fi
  if [ ! -f artifacts/quality_$name.json ]; then
    timeout 580 python -m tools.eval_quality --ckpt runs/$name --n 1024 \
      --out artifacts/quality_$name.json > runs/${name}_eval.log 2>&1
  fi
  echo "DONE $name"
}

run_and_eval curriculum_16_joint --preset curriculum_16_joint --set io.log_every=500
run_and_eval cur_f7_s2 $F7 --set train.seed=2
run_and_eval cur_f5_s1 $F5 --set train.seed=1
run_and_eval cur_f5_s2 $F5 --set train.seed=2
run_and_eval cur_def_s1 $DEF --set train.seed=1
run_and_eval cur_def_s2 $DEF --set train.seed=2
run_and_eval racecur_s1 $RC --set train.seed=1
run_and_eval racecur_s2 $RC --set train.seed=2
run_and_eval racecurcim_s1 $RC --set model.closure_in_model=true --set train.seed=1
run_and_eval racecurcim_s2 $RC --set model.closure_in_model=true --set train.seed=2
echo ROUND5_SEEDS_DONE
