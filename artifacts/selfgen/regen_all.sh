#!/usr/bin/env bash
# Full from-scratch paper regeneration on the current kernels.
# Wipes the selfgen stores + caches, then: 8 transitions x (4 families x
# 3 sigma_train x 1000 controllers @ 1e6 fcalls) -> MC characterisation
# -> per-transition figures -> 2x4 fig5 grid -> ARIM-fcall scaling study.
# Run from the repo root:  bash artifacts/selfgen/regen_all.sh
set -u
cd "$(dirname "$0")/../.."
LOG=artifacts/selfgen/regen_all.log
: > "$LOG"
echo "[regen] start $(date -u +%FT%TZ)" | tee -a "$LOG"
rm -rf artifacts/selfgen/experiments/pipeline_selfgen \
       artifacts/selfgen/experiments/pipeline_selfgen_scaling
T0=$SECONDS
for t in "4 2" "4 3" "5 2" "5 4" "6 3" "6 5" "7 3" "7 6"; do
  set -- $t
  S=$SECONDS
  echo "[regen] transition N=$1 0->$2 ..." | tee -a "$LOG"
  python artifacts/selfgen/run_selfgen.py "$1" "$2" >> "$LOG" 2>&1 \
    || { echo "[regen] FAILED N=$1 0->$2" | tee -a "$LOG"; exit 1; }
  echo "[regen] transition N=$1 0->$2 done in $((SECONDS-S))s" | tee -a "$LOG"
done
S=$SECONDS
python artifacts/selfgen/run_fig5_grid.py >> "$LOG" 2>&1 \
  || { echo "[regen] FAILED fig5 grid" | tee -a "$LOG"; exit 1; }
echo "[regen] fig5 grid done in $((SECONDS-S))s" | tee -a "$LOG"
S=$SECONDS
python artifacts/selfgen/run_scaling.py >> "$LOG" 2>&1 \
  || { echo "[regen] FAILED scaling" | tee -a "$LOG"; exit 1; }
echo "[regen] scaling done in $((SECONDS-S))s" | tee -a "$LOG"
echo "[regen] TOTAL $((SECONDS-T0))s, end $(date -u +%FT%TZ)" | tee -a "$LOG"
