"""Full-size synthetic training demo on the attached TPU chip.

Trains STAGE (sub+vid, --use_sup_att --add_local) at the reference headline
shapes on planted-signal synthetic data, then runs inference and scores the
predictions (QA acc + temporal metrics) against the synthetic ground truth.
Writes a summary JSON next to the run dir.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import json
import time

import numpy as np

from tvqaplus_tpu.config import Config
from tvqaplus_tpu.data.synthetic import SyntheticTVQADataset
from tvqaplus_tpu.evaluation.tvqa_metrics import compute_temporal_metrics
from tvqaplus_tpu.infer.predict import InferenceRunner
from tvqaplus_tpu.parallel.mesh import make_mesh
from tvqaplus_tpu.train.loop import Trainer


def main():
    n_train = int(os.environ.get("N_TRAIN", 1024))
    n_epoch = int(os.environ.get("N_EPOCH", 3))
    k = int(os.environ.get("STEPS_PER_DISPATCH", 4))
    cfg = Config(bsz=16, test_bsz=16, use_sup_att=True, add_local=True,
                 synthetic_data=True, synthetic_n_train=n_train,
                 synthetic_n_valid=256, n_epoch=n_epoch, log_freq=32,
                 img_buckets=[50], compute_dtype="bfloat16",
                 steps_per_dispatch=k,
                 results_dir_base="results/tpu_synth")
    cfg.finalize(save=True)
    mesh = make_mesh((1, 1))
    trainer = Trainer(cfg, mesh=mesh)
    print(f"params: {trainer.n_params:,d}  results: {cfg.results_dir}",
          flush=True)

    train_ds = SyntheticTVQADataset(cfg, n_train, mode="train")
    valid_ds = SyntheticTVQADataset(cfg, 256, mode="valid")
    t0 = time.time()
    best = trainer.fit(train_ds, valid_ds)
    train_s = time.time() - t0
    print(f"best val acc {best:.4f} in {train_s:.1f}s", flush=True)

    # inference on the valid split with the final weights
    runner = InferenceRunner(cfg, trainer.model, trainer.state.params,
                             mesh=mesh)
    preds = runner.run(valid_ds, mode="valid",
                       object_word_ids=list(range(3, 1000)))
    # synthetic ground truth
    gt = {}
    valid_ds.set_mode("valid")
    for i in range(len(valid_ds)):
        ex = valid_ds[i]
        gt[ex["qid"]] = [ex["ts"], ex["target"]]
    metrics = compute_temporal_metrics(preds["ts_answer"], gt)
    summary = {
        "best_val_acc": best,
        "train_seconds": train_s,
        "n_train": n_train, "n_epoch": n_epoch,
        "inference_metrics": metrics,
        "results_dir": cfg.results_dir,
    }
    print(json.dumps(summary, indent=2), flush=True)
    with open(os.path.join(cfg.results_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
