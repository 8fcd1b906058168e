#!/bin/bash
# Round-5 structural-head arms (VERDICT r4 item 1, architectural answer):
# model.structural_head='spatial' holds exactly-one START/GOAL in the
# sample by construction, so the remaining question is which training
# cell holds the OTHER three properties (KL gate, solvable >= 0.9,
# structural chi2/dof <= 50) on the raw path.  Matrix: sampling head
# (soft expected-placement vs committed Gumbel-ST) x mbstd critic
# (spread pressure on vs off), all with w_presence=10 whose only
# active term under this head is the batch spread hinge.
set -x
cd /root/repo
BASE="--preset wgan_gp_32 --set model.structural_head=spatial --set train.w_presence=10 --set train.steps=3000 --set train.steps_per_dispatch=50 --set io.log_every=1000"

run_arm () {
  local name=$1; shift
  if [ ! -f runs/$name/ckpt/step_00003000/manifest.json ]; then
    timeout 580 python -m levelgan.cli.train $BASE "$@" \
      --set io.out_dir=runs/$name > runs/${name}_train.log 2>&1
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

# soft expected-placement maps into the mbstd critic (preset head)
run_arm sh_soft --set model.critic_mbstd=input
# committed one-hot cells into the mbstd critic (ST estimator)
run_arm sh_gum --set model.head=gumbel --set model.critic_mbstd=input
# committed cells, NO batch-stat critic: does the spatial head still
# need mbstd for placement spread, or does the spread hinge suffice?
run_arm sh_nombstd --set model.head=gumbel
echo ROUND5_SH_DONE
