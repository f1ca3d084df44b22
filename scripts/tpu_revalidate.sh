#!/usr/bin/env bash
# One-shot TPU revalidation after the round-3 changes (run on a QUIET host
# — never concurrently with pytest or another python process; the axon
# tunnel wedges if TPU-claiming processes are killed mid-claim, so let
# each step finish).
#
# Order matters: Mosaic validation FIRST (the raw_mode/running-roll kernel
# paths were written during the round-3 tunnel outage and are
# interpret-verified only), then the benchmarks.
set -e
cd "$(dirname "$0")/.."

echo "=== 1. Mosaic kernel validation (new raw_mode + running-roll paths)"
python scripts/check_pallas_tpu.py

echo "=== 2. driver contract"
python -c "import __graft_entry__ as g; fn, a = g.entry(); import jax; print('entry OK', jax.jit(fn)(*a)[0].shape)"

echo "=== 3. headline bench (+ Li=100 stretch row on stderr)"
python bench.py

echo "=== 4. serving bench"
python scripts/bench_eval.py

echo "=== 5. mixed-bucket epoch bench"
python scripts/bench_buckets.py --out bench_buckets.json

echo "=== 6. full-dims dress rehearsal on the chip"
python scripts/ref_eval_e2e.py --full --root results/ref_eval_full_tpu

echo "ALL REVALIDATION STEPS PASSED — update docs/BENCH.md with the numbers"
echo
echo "Recalibration knobs to sweep next (rerun steps 1+3 per setting):"
echo "  TVQA_ENC_TAP_COST=0.5    # running-roll conv: bigger encoder cells"
echo "  TVQA_ATTN_VMEM_BUDGET_MB=14  # attention kernel: larger frame blocks"
