#!/usr/bin/env bash
# Evaluator smoke (reference eval/eval_sample.sh equivalent): score a
# prediction file against the committed val ground truth.
# Usage: bash scripts/eval_sample.sh <prediction_json>
set -e
cd "$(dirname "$0")/.."
python -m tvqaplus_tpu.evaluation.tvqa_metrics \
    --pred_path "$1" \
    --gt_path eval_data/tvqa_plus_val.json \
    --word2idx_path eval_data/word2idx.json
