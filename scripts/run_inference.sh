#!/usr/bin/env bash
# Inference wrapper (reference run_inference.sh equivalent).
# Usage: bash scripts/run_inference.sh <model_dir> [valid|test]
set -e
cd "$(dirname "$0")/.."
model_dir=$1
mode=${2:-valid}
python inference.py --model_dir "${model_dir}" --mode "${mode}"
