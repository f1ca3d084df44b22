#!/usr/bin/env bash
# Training wrapper (reference run_main.sh equivalent).
#
# Usage:
#   bash scripts/run_main.sh debug            # synthetic debug smoke
#   bash scripts/run_main.sh synthetic        # synthetic full run
#   bash scripts/run_main.sh <feature_dir>    # real TVQA+ artifacts
#
# The real-data branch wires the same 11 artifact paths as the reference
# (run_main.sh:5-19) from a feature directory laid out like
# tvqa_plus_stage_features/.
set -e
cd "$(dirname "$0")/.."

release=$1
shift || true

if [[ ${release} == "debug" ]]; then
    python main.py --synthetic_data --debug --use_sup_att --add_local "$@"
elif [[ ${release} == "synthetic" || -z ${release} ]]; then
    python main.py --synthetic_data --use_sup_att --add_local "$@"
else
    feat=${release}
    python main.py \
        --train_path "${feat}/tvqa_plus_train_preprocessed.json" \
        --valid_path "${feat}/tvqa_plus_valid_preprocessed.json" \
        --test_path "${feat}/tvqa_plus_test_preprocessed_no_anno.json" \
        --sub_path "${feat}/tvqa_plus_subtitles.json" \
        --frm_cnt_path "${feat}/frm_cnt_cache.json" \
        --qa_bert_path "${feat}/bbt_qa_s_tokenized_bert_sub_qa_tuned_new_qid.h5" \
        --sub_bert_path "${feat}/bbt_sub_s_tokenized_bert_sub_qa_tuned.h5" \
        --vfeat_path "${feat}/tvqa_bbt_bottom_up_pool5_hq_20_100_pca.h5" \
        --vcpt_path "${feat}/bbt_vcpt_hq_20_100.json" \
        --word2idx_path "eval_data/word2idx.json" \
        --eval_object_vocab_path "eval_data/eval_object_vocab.json" \
        --use_sup_att --add_local "$@"
fi
