#!/bin/bash
# Round-5 profile refresh: re-trace all presets so every profile artifact
# carries the aggregate MFU fields (tools/profile_step round-5 rollup),
# then render the per-preset MFU table (VERDICT r4 missing 4).
set -x
cd /root/repo
for p in toy_dcgan_16 wgan_gp_32 gumbel_64 conditional_32 curriculum_16 \
         curriculum_16_joint racetrack_32 race_curriculum_32; do
  timeout 580 python -m tools.profile_step --preset $p \
    > runs/profile_${p}.log 2>&1
done
timeout 580 python -m tools.profile_step --preset gumbel_64 \
  --set model.use_pallas=true > runs/profile_gumbel_64_pallas.log 2>&1
timeout 120 python -m tools.mfu_report --out artifacts/mfu_table.md
echo ROUND5_PROFILES_DONE
