#!/usr/bin/env bash
# Resume a regen_all.sh run that was interrupted mid-flight.  Does NOT
# wipe the stores: Experiment's JSON respawn skips completed (model,
# noise) cells, so re-running a finished transition costs only the cache
# reload + figure re-render, and an interrupted one resumes at the next
# unfinished cell.  Pass the remaining transitions as "N OUT" pairs.
# Run from the repo root:  bash artifacts/selfgen/regen_resume.sh
set -u
cd "$(dirname "$0")/../.."
LOG=artifacts/selfgen/regen_all.log
echo "[regen] RESUME $(date -u +%FT%TZ)" | tee -a "$LOG"
T0=$SECONDS
for t in "5 2" "5 4" "6 3" "6 5" "7 3" "7 6"; do
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
echo "[regen] RESUME TOTAL $((SECONDS-T0))s, end $(date -u +%FT%TZ)" | tee -a "$LOG"
