"""End-to-end loop through the UNMODIFIED reference evaluator.

BASELINE.md's north star is a prediction JSON scored by the reference's own
``eval/eval_tvqa_plus.py`` (reference :209-248).  This harness closes that
loop without the real 30 GB feature drop:

1. write a reference-format artifact fixture (tvqaplus_tpu/data/fixtures.py)
   — real h5/json layouts, planted signal;
2. ``python main.py`` on it (real-artifact TVQAPlusDataset path);
3. ``python inference.py --model_dir <run> --mode valid`` -> prediction JSON;
4. run ``/root/reference/eval/eval_tvqa_plus.py`` AS A SUBPROCESS on that
   JSON (unmodified file; sys.path supplies its py2-era implicit-relative
   imports) and parse the four metrics it prints;
5. evaluator self-check: a GT-derived prediction must score ≈1.0
   (reference eval/readme.txt:9-18).

Usage:
  python scripts/ref_eval_e2e.py             # small dims (CPU-friendly)
  python scripts/ref_eval_e2e.py --full      # reference dims (768/300/25)
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF_EVAL = "/root/reference/eval/eval_tvqa_plus.py"


PLATFORM = ""  # set by --platform; exported to CLI subprocesses


def run(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    if "env" not in kw and PLATFORM:
        # main.py / inference.py honor TVQA_FORCE_PLATFORM (plain
        # JAX_PLATFORMS is overridden by the axon sitecustomize)
        env = dict(os.environ)
        env["TVQA_FORCE_PLATFORM"] = PLATFORM
        kw["env"] = env
    return subprocess.run(cmd, check=True, capture_output=True, text=True,
                          **kw)


def run_reference_evaluator(pred_path, gt_path, word2idx_path,
                            no_preproc=False):
    """Invoke the unmodified evaluator; returns the four printed metrics."""
    env = dict(os.environ)
    ref_eval_dir = os.path.dirname(REF_EVAL)
    env["PYTHONPATH"] = os.pathsep.join(
        [ref_eval_dir, os.path.join(ref_eval_dir, "maskrcnn_voc"),
         env.get("PYTHONPATH", "")])
    shim = os.path.join(REPO, "scripts", "_ref_eval_shim.py")
    cmd = [sys.executable, shim, REF_EVAL, "--pred_path", pred_path,
           "--gt_path", gt_path, "--word2idx_path", word2idx_path]
    if no_preproc:
        cmd.append("--no_preproc_pred")
    out = run(cmd, env=env, cwd=ref_eval_dir).stdout
    print(out)
    m = re.search(r"QA Acc\. ([\d.]+)\s*\nGrd\. mAP ([\d.]+)\s*\n"
                  r"Temp\. mIoU\s*([\d.]+)\s*\nASA ([\d.]+)", out)
    assert m, f"evaluator output not parseable:\n{out}"
    return {"qa_acc": float(m.group(1)), "grd_map": float(m.group(2)),
            "miou": float(m.group(3)), "asa": float(m.group(4))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="results/ref_eval_e2e")
    ap.add_argument("--full", action="store_true",
                    help="reference dims: 768/300/25, 24 videos")
    ap.add_argument("--hsz", type=int, default=0,
                    help="model width override (e.g. --full --hsz 32 keeps "
                         "the REAL artifact formats/dims but a CPU-feasible "
                         "model — the data-contract dress rehearsal)")
    ap.add_argument("--n_epoch", type=int, default=0,
                    help="override epochs (default 4 small / 2 full)")
    ap.add_argument("--skip_train", default="",
                    help="reuse an existing results dir (skip steps 2-3)")
    ap.add_argument("--platform", default="",
                    help="force the train/inference subprocesses' jax "
                         "backend (e.g. cpu)")
    args = ap.parse_args()
    global PLATFORM
    PLATFORM = args.platform

    from tvqaplus_tpu.data.fixtures import gt_as_prediction, write_artifacts

    root = os.path.abspath(args.root)
    fx_dir = os.path.join(root, "artifacts")
    if args.full:
        dims = dict(n_videos=24, qa_per_video=4, frames_per_video=90,
                    bert_dim=768, vfeat_dim=300, num_region=25)
    else:
        dims = dict(n_videos=8, qa_per_video=3, frames_per_video=60,
                    bert_dim=64, vfeat_dim=32, num_region=8)
    paths = write_artifacts(fx_dir, **dims)
    print(f"fixture: {dims} -> {fx_dir}")

    # 5) evaluator self-check on a GT-derived prediction FIRST (validates
    # the whole evaluator harness independently of training)
    gt_pred = gt_as_prediction(paths["valid_path"],
                               os.path.join(root, "gt_as_pred.json"))
    self_chk = run_reference_evaluator(
        gt_pred, paths["valid_path"], paths["word2idx_path"],
        no_preproc=True)
    print(f"self-check: {self_chk}")
    assert self_chk["qa_acc"] == 1.0 and self_chk["miou"] > 0.99 \
        and self_chk["grd_map"] > 0.99 and self_chk["asa"] > 0.99, self_chk

    if args.skip_train:
        run_dir = args.skip_train
    else:
        n_epoch = args.n_epoch or (2 if args.full else 4)
        flags = [f"--{k}={v}" for k, v in paths.items()]
        flags += [f"--embedding_size={dims['bert_dim']}",
                  f"--vfeat_size={dims['vfeat_dim']}",
                  f"--num_region={dims['num_region']}",
                  f"--n_epoch={n_epoch}", "--log_freq=6", "--bsz=8",
                  "--test_bsz=8", "--use_sup_att", "--add_local",
                  "--no_core_driver",
                  f"--results_dir_base={root}/run"]
        if args.hsz:
            flags += [f"--hsz={args.hsz}"]
        elif not args.full:
            flags += ["--hsz=32"]
        out = run([sys.executable, os.path.join(REPO, "main.py")] + flags,
                  cwd=REPO).stdout
        print(out[-2000:])
        m = re.search(r"Results dir: (\S+)", out)
        run_dir = m.group(1)
        run([sys.executable, os.path.join(REPO, "inference.py"),
             "--model_dir", run_dir, "--mode", "valid"], cwd=REPO)

    pred_path = os.path.join(run_dir, "valid_inference_predictions.json")
    assert os.path.exists(pred_path), pred_path
    metrics = run_reference_evaluator(
        pred_path, paths["valid_path"], paths["word2idx_path"])
    print(f"model metrics (reference evaluator): {metrics}")
    out_path = os.path.join(root, "ref_eval_metrics.json")
    json.dump({"self_check": self_chk, "model": metrics},
              open(out_path, "w"), indent=2)
    print(f"saved {out_path}")
    return metrics


if __name__ == "__main__":
    main()
