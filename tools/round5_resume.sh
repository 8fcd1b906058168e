#!/bin/bash
# Round-5 continuation: the dev pod's runs/ scratch was recycled between
# sessions, so every queued arm's base checkpoint must be re-established
# first.  Training is deterministic in (seed, knobs) — the retrained base
# is bit-identical to the one the phase-1 arms resumed from.  Then run
# the queued phase-2 fine-tune arms, the conditional dose arm, and the
# f7 seed extensions, strictly sequentially (single-tenant dev TPU).
set -x
cd /root/repo
mkdir -p runs

# Base: the round-3/4 mbstd presence pair at 3000 steps.
if [ ! -f runs/wgan_presence_mbin3k/ckpt/step_00003000/manifest.json ]; then
  timeout 580 python -m levelgan.cli.train --preset wgan_gp_32 \
    --set train.w_presence=10 --set model.critic_mbstd=input \
    --set train.steps=3000 --set train.steps_per_dispatch=50 \
    --set io.log_every=1000 \
    --set io.out_dir=runs/wgan_presence_mbin3k \
    > runs/wgan_presence_mbin3k_train.log 2>&1
fi
ls runs/wgan_presence_mbin3k/ckpt/

bash tools/round5_ft2.sh
bash tools/round5_cond50.sh
bash tools/round5_f7_seeds.sh
echo ROUND5_RESUME_DONE
