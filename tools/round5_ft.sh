#!/bin/bash
# Round-5 presence fine-tune transient experiments (VERDICT r4 item 1).
# Base: the round-3/4 mbstd pair (w_presence=10 + critic_mbstd=input) at
# 3000 steps (runs/wgan_presence_mbin3k).  Round 4's step-function excess
# fine-tune (+500 steps) reached chi2/dof 102 / KL 0.021 but endpoints
# landed mid-re-convergence; these arms ride the transient out with the
# round-5 levers: excess-weight ramp, mbstd-channel anneal, frozen-critic
# window.  Target (VERDICT done-bar): KL <= 0.05, one_start/one_goal >=
# 0.9, solvable >= 0.9, structural chi2/dof <= 50 at ONE endpoint.
# Sequential: the dev TPU is single-tenant.
set -x
cd /root/repo
BASE="--preset wgan_gp_32 --set train.w_presence=10 --set model.critic_mbstd=input --set train.steps=10000 --set train.steps_per_dispatch=50 --set io.log_every=1000 --set io.resume=runs/wgan_presence_mbin3k/ckpt/step_00003000"

run_ft () {  # $1 = name, rest = overrides
  local name=$1; shift
  if [ ! -f runs/$name/ckpt/step_00010000/manifest.json ]; then
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

# A: slow ramp of a small excess weight, mbstd intact
run_ft r5ft_A --set train.presence_excess=0.25 \
  --set train.presence_excess_start=3000 --set train.presence_excess_ramp=5000
# B: ramp + PARTIAL mbstd fade (scale ~0.5 at the 10k endpoint)
run_ft r5ft_B --set train.presence_excess=0.5 \
  --set train.presence_excess_start=3000 --set train.presence_excess_ramp=4000 \
  --set train.mbstd_anneal_start=3000 --set train.mbstd_anneal_steps=14000
# C: ramp + stationary-critic window over the ramp onset
run_ft r5ft_C --set train.presence_excess=0.25 \
  --set train.presence_excess_start=3000 --set train.presence_excess_ramp=5000 \
  --set train.freeze_critic_until=4500
# D: ramp + FULL mbstd fade by step 8000 (the no-mbstd invariant cell's
# critic, reached gradually from the spread-established pair)
run_ft r5ft_D --set train.presence_excess=0.5 \
  --set train.presence_excess_start=3000 --set train.presence_excess_ramp=4000 \
  --set train.mbstd_anneal_start=3000 --set train.mbstd_anneal_steps=5000
echo ROUND5_FT_DONE
