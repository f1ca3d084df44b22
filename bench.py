"""Benchmark: STAGE training-step throughput (QA pairs/sec/chip).

Measures the full jitted training step (forward + cls/ts/att losses +
backward + Adam update) at the reference's headline shapes — batch 16, 5
answers, 50 sampled frames x 25 regions, 40 QA tokens, 50 subtitle tokens,
hsz 128, BERT-768 inputs (reference config.py defaults; BASELINE.md metric).

Prints ONE JSON line:
  {"metric": "qa_pairs_per_sec_per_chip", "value": N, "unit": "qa/s",
   "vs_baseline": N / torch_cpu_baseline}

vs_baseline compares against a measured PyTorch-CPU training step at the
same shapes on this host (scripts/torch_baseline.py, cached in
bench_baseline.json; the cached measurement is favorable to torch — see that
file's docstring).  The reference's own target is >=10x PyTorch-CPU
(BASELINE.json).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "bench_baseline.json")

STEPS = 50
WARMUP = 3
TRIALS = 5  # best-of-N: the 1-vCPU host adds noisy dispatch latency


def load_torch_baseline():
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["torch_cpu_qa_pairs_per_sec"]
    return None


def main():
    from tvqaplus_tpu.config import Config
    from tvqaplus_tpu.data.batching import StaticShapeSpec, collate_static
    from tvqaplus_tpu.data.synthetic import SyntheticTVQADataset
    from tvqaplus_tpu.parallel.mesh import make_mesh
    from tvqaplus_tpu.train.loop import Trainer

    compute_dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    cfg = Config(bsz=16, test_bsz=16, use_sup_att=True, add_local=True,
                 synthetic_data=True, results_dir_base="results/bench",
                 compute_dtype=compute_dtype, use_pallas=use_pallas,
                 img_buckets=[50])
    cfg.finalize(save=False)

    n_dev = len(jax.devices())
    mesh = make_mesh((1, 1), devices=jax.devices()[:1])  # per-chip number
    trainer = Trainer(cfg, mesh=mesh)

    ds = SyntheticTVQADataset(cfg, cfg.bsz, mode="train")
    spec = StaticShapeSpec.from_config(cfg, batch=cfg.bsz, max_img=50)
    arrays, _ = collate_static([ds[i] for i in range(cfg.bsz)], spec)
    from tvqaplus_tpu.parallel.mesh import shard_batch
    # production multi-step dispatch: K optimizer steps per host round trip
    # (lax.scan, see train/loop.py; exact-equivalence tested)
    k = int(os.environ.get("BENCH_STEPS_PER_DISPATCH", "10"))
    stacked = {key: np.stack([v] * k) for key, v in arrays.items()}
    batch = shard_batch(mesh, stacked, stacked=True)

    # compile + warmup
    for _ in range(WARMUP):
        trainer.state, metrics = trainer._train_step_scan(
            trainer.state, batch, trainer.rng, use_hard_negatives=False)
    jax.block_until_ready(metrics["loss"])

    dt = float("inf")
    for _ in range(TRIALS):
        t0 = time.time()
        for _ in range(STEPS):
            trainer.state, metrics = trainer._train_step_scan(
                trainer.state, batch, trainer.rng, use_hard_negatives=False)
        jax.block_until_ready(metrics["loss"])
        dt = min(dt, time.time() - t0)
    qps = cfg.bsz * k * STEPS / dt

    baseline = load_torch_baseline()
    vs = qps / baseline if baseline else None
    result = {
        "metric": "qa_pairs_per_sec_per_chip",
        "value": round(qps, 2),
        "unit": "qa/s",
        "vs_baseline": round(vs, 2) if vs else None,
    }
    print(json.dumps(result))
    # secondary detail to stderr (not part of the contract line)
    print(f"# step_ms={1000*dt/(STEPS*k):.3f} steps_per_dispatch={k} "
          f"dtype={compute_dtype} pallas={use_pallas} devices={n_dev} "
          f"torch_cpu_baseline={baseline}", file=sys.stderr)
    return result


if __name__ == "__main__":
    main()
