#!/bin/bash
# Round-5 conditional oversample dose-response: 0.3 lifted the calibrated
# min slope 0.62 -> 0.78 (hazard) with coin 0.87 / goal 0.80; try 0.5 to
# clear the >=0.8 bar on all dims, or record the saturation.
set -x
cd /root/repo
NAME=conditional_os50
if [ ! -f runs/$NAME/ckpt/step_00005000/manifest.json ]; then
  timeout 580 python -m levelgan.cli.train --preset conditional_32 \
    --set train.cond_match_dim_weights=1,8,8,4 \
    --set data.rate_oversample=0.5 \
    --set io.out_dir=runs/$NAME --set io.log_every=1000 \
    > runs/${NAME}_train.log 2>&1
fi
timeout 580 python -m tools.validate --ckpt runs/$NAME --n 1024 \
  > artifacts/validate_$NAME.json 2>runs/${NAME}_val.log
timeout 580 python -m tools.eval_cond --ckpt runs/$NAME --n 256 \
  --repair --repair-placement uniform --fit-calibration \
  --out artifacts/eval_cond_32_os50_fit.json > runs/${NAME}_fit.log 2>&1
timeout 580 python -m tools.eval_cond --ckpt runs/$NAME --n 256 \
  --repair --repair-placement uniform --calibrated \
  --out artifacts/eval_cond_32_os50_calibrated.json \
  > runs/${NAME}_cal.log 2>&1
echo ROUND5_COND50_DONE
