#!/bin/bash
# Round-5 structural-head phase 2: both 3000-step Gumbel-ST cells hold
# KL + exactly-one(=1.0 by construction) + structural chi2/dof ~1-2;
# only solvable (0.85ish) sits under the 0.9 done-bar.  Longer horizon
# (8k steps) to let the trunk's connectivity catch up, both critic
# cells, plus a seed-1 replication of each — the VERDICT item-1 done-bar
# requires the winning cell replicated at a second seed.
set -x
cd /root/repo
BASE="--preset wgan_gp_32 --set model.structural_head=spatial --set model.head=gumbel --set train.w_presence=10 --set train.steps=8000 --set train.steps_per_dispatch=50 --set io.log_every=2000"

run_arm () {
  local name=$1; shift
  if [ ! -f runs/$name/ckpt/step_00008000/manifest.json ]; then
    timeout 580 python -m levelgan.cli.train $BASE "$@" \
      --set io.out_dir=runs/$name > runs/${name}_train.log 2>&1
    if [ ! -f runs/$name/ckpt/step_00008000/manifest.json ]; then
      timeout 580 python -m levelgan.cli.train $BASE "$@" \
        --set io.out_dir=runs/$name --set io.resume=auto \
        >> runs/${name}_train.log 2>&1
    fi
  fi
  if [ ! -f artifacts/validate_$name.json ]; then
    timeout 580 python -m tools.validate --ckpt runs/$name --n 1024 \
      > artifacts/validate_$name.json 2>runs/${name}_val.log
  fi
  if [ ! -f artifacts/quality_$name.json ]; then
    timeout 580 python -m tools.eval_quality --ckpt runs/$name --n 1024 \
      --out artifacts/quality_$name.json > runs/${name}_eval.log 2>&1
  fi
  echo "DONE $name"
}

run_arm sh_gum8k --set model.critic_mbstd=input
run_arm sh_nombstd8k
run_arm sh_gum8k_s1 --set model.critic_mbstd=input --set train.seed=1
run_arm sh_nombstd8k_s1 --set train.seed=1
echo ROUND5_SH2_DONE
