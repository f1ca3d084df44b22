"""Bucket-realistic training measurement (VERDICT r2 weak #7/#8).

bench.py pins one Li bucket with identical synthetic lengths; production
epochs mix buckets ([16, 32, 50] by default), each bucket is its own XLA
program (one compile, ever, per (bucket, K) shape), and the pipeline's
same-bucket grouping flushes partial stacks at bucket changes.  This
harness measures a REAL mixed-bucket epoch on the synthetic dataset:

* per-bucket dispatch counts and step times (per-dispatch host-fetch
  sync — exact per-bucket attribution, slightly pessimistic);
* observed compile count (first dispatch per compiled (bucket, K)
  program, identified by its wall-time spike);
* a free-running epoch pass (sync at the end only — the production
  number, overlap intact).

Usage: python scripts/bench_buckets.py  [--steps_per_dispatch 10]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps_per_dispatch", type=int, default=10)
    ap.add_argument("--n_examples", type=int, default=2048)
    ap.add_argument("--bsz", type=int, default=16)
    ap.add_argument("--out", default="")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny dims on CPU — harness self-test, not a bench")
    args = ap.parse_args()

    import jax
    from tvqaplus_tpu.config import Config
    from tvqaplus_tpu.data.synthetic import SyntheticTVQADataset
    from tvqaplus_tpu.parallel.mesh import make_mesh
    from tvqaplus_tpu.train.loop import Trainer

    small = dict(hsz=16, embedding_size=24, vfeat_size=12, max_qa_l=10,
                 max_sub_l=8, num_region=5, max_q_l=4, max_a_l=4,
                 max_num_img=8, img_buckets=[4, 6, 8]) if args.smoke else {}
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        args.n_examples = min(args.n_examples, 64)
        args.bsz = min(args.bsz, 4)
    cfg = Config(bsz=args.bsz, test_bsz=args.bsz, use_sup_att=True,
                 add_local=True, synthetic_data=True,
                 results_dir_base="results/bench_buckets",
                 compute_dtype="bfloat16", use_pallas=True,
                 steps_per_dispatch=args.steps_per_dispatch, **small)
    cfg.finalize(save=False)
    assert len(cfg.img_buckets) > 1, "mixed-bucket bench needs >1 bucket"

    mesh = make_mesh((1, 1), devices=jax.devices()[:1])
    trainer = Trainer(cfg, mesh=mesh)
    k = trainer.steps_per_dispatch

    from tvqaplus_tpu.data.synthetic import CachedDataset
    ds = CachedDataset(SyntheticTVQADataset(cfg, args.n_examples,
                                            mode="train"))

    def dispatch(batch):
        trainer.state, metrics = (
            trainer._train_step_scan if batch["ex_mask"].ndim == 2
            else trainer._train_step)(
            trainer.state, batch, trainer.rng, use_hard_negatives=False)
        return metrics

    # ---- pass 1: per-dispatch sync (attribution + compile spikes) -------
    per_bucket = defaultdict(list)   # bucket -> [(n_steps, seconds)]
    compiles = []
    seen_programs = set()
    pipe = trainer._pipeline(ds, shuffle=True, batch_size=cfg.bsz, group=k)
    t_epoch = time.perf_counter()
    for batch, meta, bucket in pipe:
        n_steps = batch["ex_mask"].shape[0] if batch["ex_mask"].ndim == 2 \
            else 1
        program = (bucket, n_steps > 1)
        t0 = time.perf_counter()
        metrics = dispatch(batch)
        # host fetch forces execution (block_until_ready is a no-op on
        # axon — utils/timing.py)
        float(np.asarray(jax.device_get(metrics["loss"])).ravel()[-1])
        dt = time.perf_counter() - t0
        if program not in seen_programs:
            seen_programs.add(program)
            compiles.append({"bucket": bucket, "scan": n_steps > 1,
                             "first_dispatch_s": round(dt, 3)})
        else:
            per_bucket[bucket].append((n_steps, dt))
    synced_epoch_s = time.perf_counter() - t_epoch

    table = {}
    for bucket, rows in sorted(per_bucket.items()):
        steps = sum(n for n, _ in rows)
        secs = sum(s for _, s in rows)
        best = min(s / n for n, s in rows)
        table[bucket] = {"dispatches": len(rows), "steps": steps,
                         "mean_step_ms": round(1000 * secs / steps, 3),
                         "best_step_ms": round(1000 * best, 3)}

    # ---- pass 2: free-running epoch (production overlap intact) ---------
    pipe = trainer._pipeline(ds, shuffle=True, batch_size=cfg.bsz, group=k)
    n_total = 0
    t0 = time.perf_counter()
    metrics = None
    for batch, meta, bucket in pipe:
        n_total += batch["ex_mask"].shape[0] if batch["ex_mask"].ndim == 2 \
            else 1
        metrics = dispatch(batch)
    float(np.asarray(jax.device_get(metrics["loss"])).ravel()[-1])
    free_epoch_s = time.perf_counter() - t0

    result = {
        "buckets": cfg.img_buckets,
        "steps_per_dispatch": k,
        "n_examples": args.n_examples,
        "compiles": compiles,
        "per_bucket": table,
        "synced_epoch_s": round(synced_epoch_s, 2),
        "free_epoch_s": round(free_epoch_s, 2),
        "free_qa_per_s": round(args.n_examples / free_epoch_s, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result, indent=2))
    if args.out:
        json.dump(result, open(args.out, "w"), indent=2)
    return result


if __name__ == "__main__":
    main()
