#!/bin/bash
# Round-5 fine-tune phase 2: the phase-1 arms all ended mid-transient
# (A: 1S 0.56 @ chi2 207; B: 1S 0.73 @ chi2 421; C diverged under the
# frozen critic; see BASELINE.md round 5).  These arms give the
# stationary post-ramp objective 12k steps to actually re-converge, and
# hold a PARTIAL mbstd fade (floor) instead of fading through to the
# no-mbstd collapse cell.
set -x
cd /root/repo
BASE="--preset wgan_gp_32 --set train.w_presence=10 --set model.critic_mbstd=input --set train.steps=20000 --set train.steps_per_dispatch=50 --set io.log_every=2000 --set io.ckpt_every=2000 --set io.keep_ckpts=6"

run_ft () {
  local name=$1; shift
  if [ ! -f runs/$name/ckpt/step_00020000/manifest.json ]; then
    timeout 580 python -m levelgan.cli.train $BASE "$@" \
      --set io.out_dir=runs/$name > runs/${name}_train.log 2>&1
    # 20k steps may straddle one 580s window: resume once if needed
    if [ ! -f runs/$name/ckpt/step_00020000/manifest.json ]; then
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

# E: arm A's objective, 12k post-ramp steps to re-converge
run_ft r5ft_E --set io.resume=runs/wgan_presence_mbin3k/ckpt/step_00003000 \
  --set train.presence_excess=0.25 \
  --set train.presence_excess_start=3000 --set train.presence_excess_ramp=5000
# F: lower final weight, same horizon
run_ft r5ft_F --set io.resume=runs/wgan_presence_mbin3k/ckpt/step_00003000 \
  --set train.presence_excess=0.1 \
  --set train.presence_excess_start=3000 --set train.presence_excess_ramp=5000
# G: partial mbstd fade HELD at 0.5 + excess ramp, long horizon
run_ft r5ft_G --set io.resume=runs/wgan_presence_mbin3k/ckpt/step_00003000 \
  --set train.presence_excess=0.5 \
  --set train.presence_excess_start=3000 --set train.presence_excess_ramp=4000 \
  --set train.mbstd_anneal_start=3000 --set train.mbstd_anneal_steps=4000 \
  --set train.mbstd_anneal_floor=0.5
# H: floor 0.25 — between G and the phase-1 full-fade arm D (D landed the
# invariant at 1S 0.913 / KL 0.011 but placement collapsed to chi2 646)
run_ft r5ft_H --set io.resume=runs/wgan_presence_mbin3k/ckpt/step_00003000 \
  --set train.presence_excess=0.5 \
  --set train.presence_excess_start=3000 --set train.presence_excess_ramp=4000 \
  --set train.mbstd_anneal_start=3000 --set train.mbstd_anneal_steps=4000 \
  --set train.mbstd_anneal_floor=0.25
echo ROUND5_FT2_DONE
