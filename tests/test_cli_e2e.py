"""End-to-end CLI smoke: train (debug) -> inference -> evaluate the emitted
predictions JSON — the reference's `run_main.sh debug` + run_inference.sh +
eval_sample.sh pipeline, on synthetic data."""
import json
import os

import pytest

import main as train_main
import inference as infer_main

SMALL_FLAGS = [
    "--synthetic_data", "--debug",
    "--hsz", "16", "--embedding_size", "24", "--vfeat_size", "12",
    "--max_qa_l", "10", "--max_sub_l", "8", "--max_num_img", "6",
    "--num_region", "5", "--img_buckets", "6",
    "--bsz", "2", "--test_bsz", "2", "--max_q_l", "4", "--max_a_l", "4",
    "--use_sup_att", "--add_local",
]


@pytest.mark.slow
def test_train_cli_multidevice_mesh(tmp_path, monkeypatch):
    """main.py over a 2x2 (data, ctx) mesh with multi-step dispatch — the
    full CLI path on 4 virtual devices."""
    monkeypatch.chdir(tmp_path)
    results_dir, _ = train_main.main(
        SMALL_FLAGS + ["--results_dir_base", str(tmp_path / "results/mesh"),
                       "--mesh_shape", "2", "2", "--max_num_img", "8",
                       "--img_buckets", "8", "--steps_per_dispatch", "2"])
    assert os.path.exists(os.path.join(results_dir, "best_valid.ckpt"))


@pytest.mark.slow
def test_train_then_inference_pipeline(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    results_base = str(tmp_path / "results" / "run")
    results_dir, debug = train_main.main(
        SMALL_FLAGS + ["--results_dir_base", results_base])
    assert os.path.exists(os.path.join(results_dir, "opt.json"))
    assert os.path.exists(os.path.join(results_dir, "code.zip"))
    assert os.path.exists(os.path.join(results_dir, "best_valid.ckpt"))
    assert os.path.exists(os.path.join(results_dir, "scalars.jsonl"))
    assert os.path.exists(os.path.join(results_dir, "valid_acc.log"))

    pred_path = infer_main.main_inference(
        SMALL_FLAGS + ["--results_dir_base", results_base,
                       "--model_dir", results_dir, "--mode", "valid"])
    assert os.path.exists(pred_path)
    with open(pred_path) as f:
        preds = json.load(f)
    # the exact format the reference evaluator consumes (inference.py:42,72)
    assert set(preds.keys()) == {"ts_answer", "raw_bbox"}
    assert len(preds["ts_answer"]) > 0
    for qid, (ts, ans) in preds["ts_answer"].items():
        assert isinstance(qid, str)
        assert len(ts) == 2 and ts[1] > ts[0]
        assert 0 <= ans <= 4
    # raw_bbox entries keyed by answer index with reference record fields
    if preds["raw_bbox"]:
        rec = preds["raw_bbox"][0]
        assert set(rec.keys()) == {str(i) for i in range(5)}
        entries = [e for i in range(5) for e in rec[str(i)]]
        if entries:
            assert {"pred", "bbox", "word", "qid", "vid_name",
                    "img_idx"} <= set(entries[0].keys())
