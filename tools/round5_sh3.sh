#!/bin/bash
# Seed replications of the EXACT winning structural-head cell
# (sh_nombstd: spatial head + gumbel + w_presence=10 spread hinge, plain
# critic, 3000 steps) — the done-bar requires the operating point itself
# replicated, not just a longer-horizon cousin.
set -x
cd /root/repo
BASE="--preset wgan_gp_32 --set model.structural_head=spatial --set model.head=gumbel --set train.w_presence=10 --set train.steps=3000 --set train.steps_per_dispatch=50 --set io.log_every=1000"

for s in 1 2; do
  name=sh_nombstd_s$s
  if [ ! -f runs/$name/ckpt/step_00003000/manifest.json ]; then
    timeout 580 python -m levelgan.cli.train $BASE --set train.seed=$s \
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
done
echo ROUND5_SH3_DONE
