#!/usr/bin/env bash
# Regenerate the paper figure set from cached experiment data
# (reference generate_all_figures.sh equivalent).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m code_robchar_tpu.figs.generate_all "$@"
