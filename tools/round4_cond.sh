#!/bin/bash
# Round-4 conditional work (VERDICT items 3+5), sequential on the single-tenant chip:
# 1. projection-conditioned conditional_32 with the calibrated cond-match weight
#    (the shipped concat path's knobs) -> gate suite; licenses the default flip.
# 2. calibration fit + calibrated eval on the SHIPPED concat checkpoint.
set -x
cd /root/repo
# 1. projection arm (cm4's knobs: w_cond_match=1.0, 5000 steps)
timeout 580 python -m levelgan.cli.train --preset conditional_32 \
  --set model.cond_mode=projection --set train.w_cond_match=1.0 \
  --set train.steps=5000 --set train.steps_per_dispatch=50 \
  --set io.out_dir=runs/conditional_proj --set io.log_every=1000 \
  > runs/condproj_train.log 2>&1
timeout 580 python -m tools.validate --ckpt runs/conditional_proj --n 1024 \
  > artifacts/validate_conditional_proj.json 2>/dev/null
timeout 580 python -m tools.eval_cond --ckpt runs/conditional_proj --n 256 \
  --repair --repair-placement uniform \
  --out artifacts/eval_cond_32_proj.json > /dev/null 2>&1
# 2. calibration on the shipped concat checkpoint
timeout 580 python -m tools.eval_cond --ckpt runs/conditional_cm4 --n 256 \
  --repair --repair-placement uniform --fit-calibration \
  --out artifacts/eval_cond_32_cm4_fit.json > /dev/null 2>&1
timeout 580 python -m tools.eval_cond --ckpt runs/conditional_cm4 --n 256 \
  --repair --repair-placement uniform --calibrated \
  --out artifacts/eval_cond_32_cm4_calibrated.json > /dev/null 2>&1
echo COND_DONE
