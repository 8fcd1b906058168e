#!/bin/bash
# Round-5 conditional band widening (VERDICT r4 item 7): train the shipped
# projection+dim-boost knobs on a corpus whose high-hazard/high-coin
# quantiles are oversampled (data.rate_oversample=0.3), so the model sees
# the requests calibration is asked to realize; re-fit calibration and
# gate.  Target: calibrated slopes >= 0.8 on all four dims at green
# identity/causality gates, or the recorded negative.
set -x
cd /root/repo
NAME=conditional_os
if [ ! -f runs/$NAME/ckpt/step_00005000/manifest.json ]; then
  timeout 580 python -m levelgan.cli.train --preset conditional_32 \
    --set train.cond_match_dim_weights=1,8,8,4 \
    --set data.rate_oversample=0.3 \
    --set io.out_dir=runs/$NAME --set io.log_every=1000 \
    > runs/${NAME}_train.log 2>&1
fi
timeout 580 python -m tools.validate --ckpt runs/$NAME --n 1024 \
  > artifacts/validate_$NAME.json 2>runs/${NAME}_val.log
timeout 580 python -m tools.eval_cond --ckpt runs/$NAME --n 256 \
  --repair --repair-placement uniform --fit-calibration \
  --out artifacts/eval_cond_32_os_fit.json > runs/${NAME}_fit.log 2>&1
timeout 580 python -m tools.eval_cond --ckpt runs/$NAME --n 256 \
  --repair --repair-placement uniform --calibrated \
  --out artifacts/eval_cond_32_os_calibrated.json \
  > runs/${NAME}_cal.log 2>&1
echo ROUND5_COND_DONE
