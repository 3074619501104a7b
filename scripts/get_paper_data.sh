#!/usr/bin/env bash
# Paper-data regeneration (reference get_paper_data.sh:1-43 equivalent):
# seven transitions x 1000 controllers x 1e6 objective calls, then the two
# 4e7-call ARIM-scaling runs.  WARNING: full budgets; expect hours.
set -euo pipefail
cd "$(dirname "$0")/.."

for t in "4 2" "5 2" "5 4" "6 3" "6 5" "7 3" "7 6"; do
  set -- $t
  python -m code_robchar_tpu.exp.drivers collect \
    --exp_name "pipeline_spin_${1}_0-${2}" \
    --nspin "$1" --inspin 0 --outspin "$2" \
    --num_controllers 1000 --fid_threshold 0.1 \
    --run_until_completion_its 1000000 \
    --respawn_from_checkpoint true
done

python -m code_robchar_tpu.exp.drivers arim_scaling \
  --nspin 5 --inspin 0 --outspin 2 --num_controllers 100 \
  --run_until_completion_its 40000000 --records_update_rate 100000 \
  --use_fixed_ham false --respawn_from_checkpoint true

python -m code_robchar_tpu.exp.drivers arim_scaling \
  --nspin 5 --inspin 0 --outspin 2 --num_controllers 100 \
  --run_until_completion_its 40000000 --records_update_rate 100000 \
  --use_fixed_ham true --fixed_ham_train_size 100 \
  --respawn_from_checkpoint true
